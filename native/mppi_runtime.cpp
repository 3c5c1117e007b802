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

}  // extern "C"
