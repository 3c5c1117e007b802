// Native runtime data plane for mppi_generic_tpu.
//
// C++ rebuild of the reference's real-time host components (the parts that
// are NOT TPU compute): the time-ordered sensor buffer with interpolated
// fixed-dt resampling (include/mppi/core/buffer.hpp:17-118 getSmoothedBuffer)
// and the estimator->solver latest-state mailbox with condition-variable
// wakeup (replacing base_plant.hpp:450-455's 50us spin-wait).
//
// Exposed as a plain C ABI consumed via ctypes (runtime/native.py); the
// Python plant falls back to a pure-Python implementation when the shared
// library is unavailable.

#include <algorithm>
#include <chrono>
#include <cmath>
#include <condition_variable>
#include <cstring>
#include <map>
#include <mutex>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Time-ordered vector buffer (Buffer<DYN_T> analog)
// ---------------------------------------------------------------------------
struct RtBuffer {
  int dim;
  double horizon;  // seconds of history to keep
  std::mutex mu;
  // sorted by time ascending
  std::vector<std::pair<double, std::vector<float>>> entries;
};

void* rt_buffer_new(int dim, double time_horizon) {
  RtBuffer* b = new RtBuffer();
  b->dim = dim;
  b->horizon = time_horizon;
  return b;
}

void rt_buffer_free(void* h) { delete static_cast<RtBuffer*>(h); }

int rt_buffer_size(void* h) {
  RtBuffer* b = static_cast<RtBuffer*>(h);
  std::lock_guard<std::mutex> g(b->mu);
  return static_cast<int>(b->entries.size());
}

// insertion-sorted add + horizon cleanup (buffer.hpp insertionSort/cleanList)
void rt_buffer_add(void* h, double time, const float* vec) {
  RtBuffer* b = static_cast<RtBuffer*>(h);
  std::lock_guard<std::mutex> g(b->mu);
  std::vector<float> v(vec, vec + b->dim);
  auto it = std::upper_bound(
      b->entries.begin(), b->entries.end(), time,
      [](double t, const std::pair<double, std::vector<float>>& e) {
        return t < e.first;
      });
  b->entries.insert(it, {time, std::move(v)});
  // drop entries older than horizon behind the newest
  double cutoff = b->entries.back().first - b->horizon;
  auto keep = std::lower_bound(
      b->entries.begin(), b->entries.end(), cutoff,
      [](const std::pair<double, std::vector<float>>& e, double t) {
        return e.first < t;
      });
  b->entries.erase(b->entries.begin(), keep);
}

// linear interpolation at `time`, clamped to the buffer ends
// (buffer.hpp interp)
int rt_buffer_interp(void* h, double time, float* out) {
  RtBuffer* b = static_cast<RtBuffer*>(h);
  std::lock_guard<std::mutex> g(b->mu);
  if (b->entries.empty()) return -1;
  const auto& es = b->entries;
  if (time <= es.front().first) {
    std::memcpy(out, es.front().second.data(), sizeof(float) * b->dim);
    return 0;
  }
  if (time >= es.back().first) {
    std::memcpy(out, es.back().second.data(), sizeof(float) * b->dim);
    return 0;
  }
  auto hi = std::upper_bound(
      es.begin(), es.end(), time,
      [](double t, const std::pair<double, std::vector<float>>& e) {
        return t < e.first;
      });
  auto lo = std::prev(hi);
  double denom = hi->first - lo->first;
  double alpha = denom > 1e-12 ? (time - lo->first) / denom : 0.0;
  for (int i = 0; i < b->dim; i++) {
    out[i] = static_cast<float>((1.0 - alpha) * lo->second[i] +
                                alpha * hi->second[i]);
  }
  return 0;
}

// fixed-dt resampling ending at end_time: out[steps][dim]
// (Buffer::getSmoothedBuffer analog: the LSTM warm-start trajectory)
int rt_buffer_smoothed(void* h, double end_time, double dt, int steps,
                       float* out) {
  for (int k = 0; k < steps; k++) {
    double t = end_time - dt * (steps - 1 - k);
    RtBuffer* b = static_cast<RtBuffer*>(h);
    if (rt_buffer_interp(h, t, out + (size_t)k * b->dim) != 0) return -1;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Latest-state mailbox (estimator -> solver handoff, base_plant.hpp:50-67)
// ---------------------------------------------------------------------------
struct RtMailbox {
  int dim;
  std::mutex mu;
  std::condition_variable cv;
  std::vector<float> state;
  double time = -1.0;
  long seq = 0;
};

void* rt_mailbox_new(int dim) {
  RtMailbox* m = new RtMailbox();
  m->dim = dim;
  m->state.resize(dim, 0.0f);
  return m;
}

void rt_mailbox_free(void* h) { delete static_cast<RtMailbox*>(h); }

void rt_mailbox_put(void* h, double time, const float* vec) {
  RtMailbox* m = static_cast<RtMailbox*>(h);
  {
    std::lock_guard<std::mutex> g(m->mu);
    std::memcpy(m->state.data(), vec, sizeof(float) * m->dim);
    m->time = time;
    m->seq++;
  }
  m->cv.notify_all();
}

// returns the sequence number; copies state+time out
long rt_mailbox_get(void* h, float* out, double* time_out) {
  RtMailbox* m = static_cast<RtMailbox*>(h);
  std::lock_guard<std::mutex> g(m->mu);
  std::memcpy(out, m->state.data(), sizeof(float) * m->dim);
  *time_out = m->time;
  return m->seq;
}

// block until seq > last_seq or timeout; returns new seq (or last_seq on
// timeout). This replaces the reference's usleep(50) spin-wait
// (base_plant.hpp:450-455) with a proper condvar.
long rt_mailbox_wait(void* h, long last_seq, double timeout_s) {
  RtMailbox* m = static_cast<RtMailbox*>(h);
  std::unique_lock<std::mutex> lk(m->mu);
  m->cv.wait_for(lk, std::chrono::duration<double>(timeout_s),
                 [&] { return m->seq > last_seq; });
  return m->seq;
}

// ---------------------------------------------------------------------------
// Published-solution interpolator (the actuation fast path)
//
// The estimator-rate control output — interpolate the feed-forward sequence
// and apply the interpolated feedback gains (controller.cuh
// interpolateControls:363-378 + interpolateFeedback:395-399 + the
// enforceConstraints deadband/clamp, dynamics.cuh:250-264) — is pure host
// arithmetic on a few hundred floats. Running it natively keeps the
// actuation path entirely off the accelerator AND out of the Python
// interpreter: the solver thread posts each new solution once, the
// estimator thread interpolates lock-protected at sensor rate.
// ---------------------------------------------------------------------------
struct RtSolution {
  int T = 0, C = 0, S = 0;
  double dt = 0.0;
  bool has_fb = false;
  std::mutex mu;
  std::vector<float> u_ff;    // (T, C)
  std::vector<float> gains;   // (T, C, S)
  std::vector<float> x_nom;   // (T, S)
  std::vector<float> lo, hi, deadband, zero_ctrl;  // (C,) each
};

void* rt_solution_new(int C, int S) {
  RtSolution* s = new RtSolution();
  s->C = C;
  s->S = S;
  s->lo.assign(C, -1e30f);
  s->hi.assign(C, 1e30f);
  s->deadband.assign(C, 0.0f);
  s->zero_ctrl.assign(C, 0.0f);
  return s;
}

void rt_solution_free(void* h) { delete static_cast<RtSolution*>(h); }

void rt_solution_set_constraints(void* h, const float* lo, const float* hi,
                                 const float* deadband,
                                 const float* zero_ctrl) {
  RtSolution* s = static_cast<RtSolution*>(h);
  std::lock_guard<std::mutex> g(s->mu);
  std::memcpy(s->lo.data(), lo, sizeof(float) * s->C);
  std::memcpy(s->hi.data(), hi, sizeof(float) * s->C);
  std::memcpy(s->deadband.data(), deadband, sizeof(float) * s->C);
  std::memcpy(s->zero_ctrl.data(), zero_ctrl, sizeof(float) * s->C);
}

// post a new solution; gains/x_nom may be null (no feedback)
void rt_solution_update(void* h, int T, double dt, const float* u_ff,
                        const float* gains, const float* x_nom) {
  RtSolution* s = static_cast<RtSolution*>(h);
  std::lock_guard<std::mutex> g(s->mu);
  s->T = T;
  s->dt = dt;
  s->u_ff.assign(u_ff, u_ff + (size_t)T * s->C);
  s->has_fb = (gains != nullptr && x_nom != nullptr);
  if (s->has_fb) {
    s->gains.assign(gains, gains + (size_t)T * s->C * s->S);
    s->x_nom.assign(x_nom, x_nom + (size_t)T * s->S);
  }
}

static inline float rt_clamp_channel(const RtSolution* s, int c, float u) {
  float db = s->deadband[c];
  if (std::abs(u) < db) {
    u = s->zero_ctrl[c];
  } else {
    u -= (u < 0.0f ? -db : db);
  }
  return std::min(std::max(u, s->lo[c]), s->hi[c]);
}

// u(t_rel, x): clamp(lerp u_ff) + lerp_t K[t](x - x_nom[t]), clamped again
// — exactly the plant's jitted publish path, host-side.
int rt_solution_interp(void* h, double rel_time, const float* state,
                       float* out) {
  RtSolution* s = static_cast<RtSolution*>(h);
  std::lock_guard<std::mutex> g(s->mu);
  if (s->T <= 0) return -1;
  double idx_f = rel_time / s->dt;
  if (idx_f < 0.0) idx_f = 0.0;
  if (idx_f > s->T - 1.0) idx_f = s->T - 1.0;
  int lo_i = static_cast<int>(idx_f);
  if (lo_i > s->T - 1) lo_i = s->T - 1;
  int hi_i = std::min(lo_i + 1, s->T - 1);
  float a = static_cast<float>(idx_f - lo_i);

  for (int c = 0; c < s->C; c++) {
    float u = (1.0f - a) * s->u_ff[(size_t)lo_i * s->C + c] +
              a * s->u_ff[(size_t)hi_i * s->C + c];
    u = rt_clamp_channel(s, c, u);
    if (s->has_fb) {
      float fb_lo = 0.0f, fb_hi = 0.0f;
      for (int k = 0; k < s->S; k++) {
        float dx_lo = state[k] - s->x_nom[(size_t)lo_i * s->S + k];
        float dx_hi = state[k] - s->x_nom[(size_t)hi_i * s->S + k];
        fb_lo += s->gains[((size_t)lo_i * s->C + c) * s->S + k] * dx_lo;
        fb_hi += s->gains[((size_t)hi_i * s->C + c) * s->S + k] * dx_hi;
      }
      u += (1.0f - a) * fb_lo + a * fb_hi;
      u = rt_clamp_channel(s, c, u);
    }
    out[c] = u;
  }
  return 0;
}

}  // extern "C"
