"""ctypes bindings for the native runtime data plane (native/mppi_runtime.cpp).

Compiled on demand with g++ (cached in native/build/); every binding has a
pure-Python fallback (PyBuffer / PyMailbox) so the framework works without a
toolchain — matching the reference's approach of keeping the real-time data
plane in C++ while the compute plane lives on the accelerator.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
import bisect

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "mppi_runtime.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_SO = os.path.join(_BUILD_DIR, "libmppi_runtime.so")

_lib = None
_lib_failed = False
_lib_lock = threading.Lock()


def _compile():
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O2", "-std=c++17", "-fPIC", "-shared", "-pthread",
           _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def load_library():
    """Load (compiling if needed) the native library; None on failure
    (cached — the compile is attempted once per process, and the fallback
    is announced so a silently degraded data plane is visible)."""
    global _lib, _lib_failed
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _lib_failed:
            return None
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                _compile()
            lib = ctypes.CDLL(_SO)
        except Exception as e:
            _lib_failed = True
            import warnings

            warnings.warn(
                f"native runtime unavailable ({type(e).__name__}: {e}); "
                "using the pure-Python data plane", RuntimeWarning
            )
            return None
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.rt_buffer_new.restype = ctypes.c_void_p
        lib.rt_buffer_new.argtypes = [ctypes.c_int, ctypes.c_double]
        lib.rt_buffer_free.argtypes = [ctypes.c_void_p]
        lib.rt_buffer_size.restype = ctypes.c_int
        lib.rt_buffer_size.argtypes = [ctypes.c_void_p]
        lib.rt_buffer_add.argtypes = [ctypes.c_void_p, ctypes.c_double, f32p]
        lib.rt_buffer_interp.restype = ctypes.c_int
        lib.rt_buffer_interp.argtypes = [ctypes.c_void_p, ctypes.c_double, f32p]
        lib.rt_buffer_smoothed.restype = ctypes.c_int
        lib.rt_buffer_smoothed.argtypes = [
            ctypes.c_void_p, ctypes.c_double, ctypes.c_double, ctypes.c_int, f32p
        ]
        lib.rt_mailbox_new.restype = ctypes.c_void_p
        lib.rt_mailbox_new.argtypes = [ctypes.c_int]
        lib.rt_mailbox_free.argtypes = [ctypes.c_void_p]
        lib.rt_mailbox_put.argtypes = [ctypes.c_void_p, ctypes.c_double, f32p]
        lib.rt_mailbox_get.restype = ctypes.c_long
        lib.rt_mailbox_get.argtypes = [
            ctypes.c_void_p, f32p, ctypes.POINTER(ctypes.c_double)
        ]
        lib.rt_mailbox_wait.restype = ctypes.c_long
        lib.rt_mailbox_wait.argtypes = [ctypes.c_void_p, ctypes.c_long, ctypes.c_double]
        lib.rt_solution_new.restype = ctypes.c_void_p
        lib.rt_solution_new.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.rt_solution_free.argtypes = [ctypes.c_void_p]
        lib.rt_solution_set_constraints.argtypes = [
            ctypes.c_void_p, f32p, f32p, f32p, f32p
        ]
        lib.rt_solution_update.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_double, f32p, f32p, f32p
        ]
        lib.rt_solution_interp.restype = ctypes.c_int
        lib.rt_solution_interp.argtypes = [
            ctypes.c_void_p, ctypes.c_double, f32p, f32p
        ]
        _lib = lib
        return _lib


def _as_f32p(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class NativeBuffer:
    """Time-ordered vector buffer (Buffer<DYN_T> analog, buffer.hpp:17-118)."""

    def __init__(self, dim, time_horizon=2.0, lib=None):
        self._lib = lib or load_library()
        self.dim = dim
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self._h = self._lib.rt_buffer_new(dim, time_horizon)

    def __del__(self):
        if getattr(self, "_h", None) and self._lib is not None:
            self._lib.rt_buffer_free(self._h)
            self._h = None

    def __len__(self):
        return self._lib.rt_buffer_size(self._h)

    def add(self, time, vec):
        vec = np.ascontiguousarray(vec, np.float32)
        assert vec.shape == (self.dim,)
        self._lib.rt_buffer_add(self._h, float(time), _as_f32p(vec))

    def interp(self, time):
        out = np.empty((self.dim,), np.float32)
        rc = self._lib.rt_buffer_interp(self._h, float(time), _as_f32p(out))
        if rc != 0:
            raise ValueError("empty buffer")
        return out

    def smoothed(self, end_time, dt, steps):
        """(steps, dim) fixed-dt resample ending at end_time
        (getSmoothedBuffer analog)."""
        out = np.empty((steps, self.dim), np.float32)
        rc = self._lib.rt_buffer_smoothed(
            self._h, float(end_time), float(dt), int(steps), _as_f32p(out)
        )
        if rc != 0:
            raise ValueError("empty buffer")
        return out


class NativeMailbox:
    """Latest-state mailbox with condvar wakeup (base_plant.hpp:50-67)."""

    def __init__(self, dim, lib=None):
        self._lib = lib or load_library()
        self.dim = dim
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self._h = self._lib.rt_mailbox_new(dim)

    def __del__(self):
        if getattr(self, "_h", None) and self._lib is not None:
            self._lib.rt_mailbox_free(self._h)
            self._h = None

    def put(self, time, vec):
        vec = np.ascontiguousarray(vec, np.float32)
        assert vec.shape == (self.dim,), (vec.shape, self.dim)
        self._lib.rt_mailbox_put(self._h, float(time), _as_f32p(vec))

    def get(self):
        out = np.empty((self.dim,), np.float32)
        t = ctypes.c_double()
        seq = self._lib.rt_mailbox_get(self._h, _as_f32p(out), ctypes.byref(t))
        return seq, t.value, out

    def wait(self, last_seq, timeout=0.1):
        return self._lib.rt_mailbox_wait(self._h, int(last_seq), float(timeout))


# ---------------------------------------------------------------------------
# Pure-Python fallbacks (identical semantics)
# ---------------------------------------------------------------------------
class PyBuffer:
    """Pure-Python time-ordered buffer (Buffer<DYN_T> analog, buffer.hpp:
    17-118). ``quat_slice`` marks a [w,x,y,z] quaternion segment of the
    vector that interpolates by hemisphere-corrected normalized lerp
    (the reference slerps quaternion entries; nlerp is equivalent for the
    small inter-sample rotations of a high-rate sensor stream)."""

    def __init__(self, dim, time_horizon=2.0, quat_slice=None):
        self.dim = dim
        self.horizon = time_horizon
        self.quat_slice = quat_slice  # (start, stop) or None
        self._times = []
        self._vals = []
        self._mu = threading.Lock()

    def __len__(self):
        return len(self._times)

    def add(self, time, vec):
        vec = np.asarray(vec, np.float32)
        with self._mu:
            i = bisect.bisect_right(self._times, time)
            self._times.insert(i, float(time))
            self._vals.insert(i, vec)
            cutoff = self._times[-1] - self.horizon
            k = bisect.bisect_left(self._times, cutoff)
            del self._times[:k]
            del self._vals[:k]

    def interp(self, time):
        with self._mu:
            if not self._times:
                raise ValueError("empty buffer")
            if time <= self._times[0]:
                return self._vals[0].copy()
            if time >= self._times[-1]:
                return self._vals[-1].copy()
            hi = bisect.bisect_right(self._times, time)
            lo = hi - 1
            denom = self._times[hi] - self._times[lo]
            a = (time - self._times[lo]) / denom if denom > 1e-12 else 0.0
            v_lo, v_hi = self._vals[lo], self._vals[hi]
            out = ((1 - a) * v_lo + a * v_hi).astype(np.float32)
            if self.quat_slice is not None:
                s, e = self.quat_slice
                q0, q1 = v_lo[s:e], v_hi[s:e]
                if float(np.dot(q0, q1)) < 0:  # hemisphere correction
                    q1 = -q1
                q = (1 - a) * q0 + a * q1
                n = float(np.linalg.norm(q))
                out[s:e] = (q / n if n > 1e-12 else q0).astype(np.float32)
            return out

    def smoothed(self, end_time, dt, steps):
        return np.stack(
            [self.interp(end_time - dt * (steps - 1 - k)) for k in range(steps)]
        )


class PyMailbox:
    def __init__(self, dim):
        self.dim = dim
        self._mu = threading.Condition()
        self._state = np.zeros((dim,), np.float32)
        self._time = -1.0
        self._seq = 0

    def put(self, time, vec):
        vec = np.asarray(vec, np.float32)
        assert vec.shape == (self.dim,), (vec.shape, self.dim)
        with self._mu:
            self._state = vec.copy()
            self._time = float(time)
            self._seq += 1
            self._mu.notify_all()

    def get(self):
        with self._mu:
            return self._seq, self._time, self._state.copy()

    def wait(self, last_seq, timeout=0.1):
        with self._mu:
            self._mu.wait_for(lambda: self._seq > last_seq, timeout=timeout)
            return self._seq


def make_buffer(dim, time_horizon=2.0, quat_slice=None):
    if quat_slice is not None:
        # quaternion-aware interpolation lives in the Python buffer
        return PyBuffer(dim, time_horizon, quat_slice=quat_slice)
    try:
        return NativeBuffer(dim, time_horizon)
    except Exception:
        return PyBuffer(dim, time_horizon)


def make_mailbox(dim):
    try:
        return NativeMailbox(dim)
    except Exception:
        return PyMailbox(dim)


class NativeSolution:
    """Published-solution interpolator (RtSolution): the actuation-path
    fast publisher. The solver thread posts each new solution once
    (``update``); the estimator thread calls ``interp(rel_time, state)`` at
    sensor rate — feed-forward lerp + interpolated feedback gains +
    deadband/clamp, entirely on the host CPU (controller.cuh
    interpolateControls/interpolateFeedback semantics)."""

    def __init__(self, C, S, lib=None):
        self._lib = lib or load_library()
        self.C, self.S = C, S
        self._h = self._lib.rt_solution_new(C, S)

    def __del__(self):
        if getattr(self, "_h", None) and self._lib:
            self._lib.rt_solution_free(self._h)
            self._h = None

    def set_constraints(self, lo, hi, deadband, zero_control):
        lo = np.ascontiguousarray(lo, np.float32)
        hi = np.ascontiguousarray(hi, np.float32)
        db = np.ascontiguousarray(deadband, np.float32)
        zc = np.ascontiguousarray(zero_control, np.float32)
        self._lib.rt_solution_set_constraints(
            self._h, _as_f32p(lo), _as_f32p(hi), _as_f32p(db), _as_f32p(zc)
        )

    def update(self, dt, u_ff, gains=None, x_nom=None):
        u_ff = np.ascontiguousarray(u_ff, np.float32)
        T = u_ff.shape[0]
        if gains is not None and x_nom is not None:
            gains = np.ascontiguousarray(gains, np.float32)
            x_nom = np.ascontiguousarray(x_nom, np.float32)
            self._lib.rt_solution_update(
                self._h, T, float(dt), _as_f32p(u_ff), _as_f32p(gains),
                _as_f32p(x_nom),
            )
        else:
            null = ctypes.POINTER(ctypes.c_float)()
            self._lib.rt_solution_update(
                self._h, T, float(dt), _as_f32p(u_ff), null, null
            )

    def interp(self, rel_time, state):
        state = np.ascontiguousarray(state, np.float32)
        out = np.empty(self.C, np.float32)
        rc = self._lib.rt_solution_interp(
            self._h, float(rel_time), _as_f32p(state), _as_f32p(out)
        )
        return out if rc == 0 else None


class PySolution:
    """NumPy fallback with identical semantics."""

    def __init__(self, C, S):
        self.C, self.S = C, S
        self._lock = threading.Lock()
        self._T = 0
        self._dt = 0.0
        self._u_ff = None
        self._gains = None
        self._x_nom = None
        self._lo = np.full(C, -1e30, np.float32)
        self._hi = np.full(C, 1e30, np.float32)
        self._db = np.zeros(C, np.float32)
        self._zc = np.zeros(C, np.float32)

    def set_constraints(self, lo, hi, deadband, zero_control):
        with self._lock:
            self._lo = np.asarray(lo, np.float32)
            self._hi = np.asarray(hi, np.float32)
            self._db = np.asarray(deadband, np.float32)
            self._zc = np.asarray(zero_control, np.float32)

    def update(self, dt, u_ff, gains=None, x_nom=None):
        with self._lock:
            self._u_ff = np.asarray(u_ff, np.float32)
            self._T = self._u_ff.shape[0]
            self._dt = float(dt)
            self._gains = None if gains is None else np.asarray(gains, np.float32)
            self._x_nom = None if x_nom is None else np.asarray(x_nom, np.float32)

    def _clamp(self, u):
        sign = np.where(u < 0, -1.0, 1.0).astype(np.float32)
        shrunk = u - self._db * sign
        u = np.where(np.abs(u) < self._db, self._zc, shrunk)
        return np.clip(u, self._lo, self._hi)

    def interp(self, rel_time, state):
        with self._lock:
            if self._T <= 0:
                return None
            idx = np.clip(rel_time / self._dt, 0.0, self._T - 1.0)
            lo = min(int(idx), self._T - 1)
            hi = min(lo + 1, self._T - 1)
            a = np.float32(idx - lo)
            u = (1 - a) * self._u_ff[lo] + a * self._u_ff[hi]
            u = self._clamp(u)
            if self._gains is not None and self._x_nom is not None:
                state = np.asarray(state, np.float32)
                fb_lo = self._gains[lo] @ (state - self._x_nom[lo])
                fb_hi = self._gains[hi] @ (state - self._x_nom[hi])
                u = self._clamp(u + (1 - a) * fb_lo + a * fb_hi)
            return u


def make_solution(C, S):
    if load_library() is not None:
        return NativeSolution(C, S)
    return PySolution(C, S)
