"""Math utilities: angle wrapping, quaternions, smoothing, integration.

TPU-native re-implementation of the capabilities of the reference's
``utils/math_utils.h``, ``utils/angle_utils.cuh`` and
``utils/numerical_integration.h`` — everything here is pure jnp, batched, and
jit-safe (no data-dependent control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

TWO_PI = 2.0 * jnp.pi


def normalize_angle(theta):
    """Wrap an angle (or array of angles) to [-pi, pi)."""
    return jnp.mod(theta + jnp.pi, TWO_PI) - jnp.pi


def angle_diff(a, b):
    """Shortest signed difference a - b wrapped to [-pi, pi)."""
    return normalize_angle(a - b)


def interp_angle(a, b, alpha):
    """Interpolate between two angles along the shortest arc."""
    return normalize_angle(a + alpha * angle_diff(b, a))


def sign(x):
    """sign(x) with sign(0) == 1 (matches the reference's mppi::math::sign)."""
    return jnp.where(x < 0, -1.0, 1.0)


def atan_approx(z):
    """Minimax odd-polynomial atan on |z| <= 1 (~1e-5 rad max error) —
    built only from Pallas-lowerable primitives (atan/atan2 have no Mosaic
    lowering)."""
    s = z * z
    return z * (0.9998660
                + s * (-0.3302995
                       + s * (0.180141
                              + s * (-0.085133 + 0.0208351 * s))))


def atan2_approx(y, x, eps=1e-30):
    """atan2 from ``atan_approx`` with octant reduction; same quadrant
    semantics as jnp.arctan2 for nonzero inputs."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    r = atan_approx(lo / jnp.maximum(hi, eps))
    r = jnp.where(ay > ax, jnp.pi / 2 - r, r)
    r = jnp.where(x < 0, jnp.pi - r, r)
    return jnp.where(y < 0, -r, r)


def atan_full_approx(x):
    """Full-range atan via |x|>1 inversion + ``atan_approx`` (~1e-5 rad)."""
    ax = jnp.abs(x)
    inv = ax > 1.0
    z = jnp.where(inv, 1.0 / jnp.maximum(ax, 1e-30), ax)
    r = atan_approx(z)
    r = jnp.where(inv, jnp.pi / 2 - r, r)
    return jnp.where(x < 0, -r, r)


def asin_approx(x):
    """arcsin via atan2_approx(x, sqrt(1-x^2)) (clipped domain)."""
    x = jnp.clip(x, -1.0, 1.0)
    return atan2_approx(x, jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0)))


def discount_pow(base, t):
    """``base ** t`` for a positive discount factor, as exp(t*log(base)).

    Identical numerics for base > 0 but lowers to exp/log everywhere —
    scalar ``powf`` is not lowerable inside Pallas TPU kernels, and cost
    functions must trace both under XLA and inside the fused rollout kernel.
    """
    return jnp.exp(jnp.asarray(t, jnp.float32) * jnp.log(base))


# ---------------------------------------------------------------------------
# Quaternions: stored [w, x, y, z] like the reference (Eigen::Quaternionf).
# ---------------------------------------------------------------------------

def quat_multiply(q1, q2):
    """Hamilton product q1 ⊗ q2; inputs shaped (..., 4)."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conjugate(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_inverse(q):
    return quat_conjugate(q) / jnp.maximum(
        jnp.sum(q * q, axis=-1, keepdims=True), 1e-12
    )


def quat_normalize(q, eps=1e-12):
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    # keep sign convention w >= 0 like the reference's state-space quaternions
    q = q / jnp.maximum(n, eps)
    return q * sign(q[..., 0:1])


def quat_to_rotation_matrix(q):
    """(..., 4) -> (..., 3, 3) body-to-world rotation."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    rows = [
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def quat_rotate(q, v):
    """Rotate vector(s) v (..., 3) by quaternion(s) q (..., 4)."""
    return jnp.einsum("...ij,...j->...i", quat_to_rotation_matrix(q), v)


def quat_derivative(q, omega_body):
    """dq/dt = 0.5 * q ⊗ [0, omega] for body-frame angular rate omega."""
    zeros = jnp.zeros_like(omega_body[..., :1])
    omega_q = jnp.concatenate([zeros, omega_body], axis=-1)
    return 0.5 * quat_multiply(q, omega_q)


def quat_slerp(q0, q1, alpha, eps=1e-8):
    """Spherical linear interpolation between unit quaternions."""
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    use_lerp = sin_theta < eps
    w0 = jnp.where(use_lerp, 1.0 - alpha, jnp.sin((1.0 - alpha) * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    w1 = jnp.where(use_lerp, alpha, jnp.sin(alpha * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    return quat_normalize(w0 * q0 + w1 * q1)


def euler_to_quat(roll, pitch, yaw):
    cr, sr = jnp.cos(roll / 2), jnp.sin(roll / 2)
    cp, sp = jnp.cos(pitch / 2), jnp.sin(pitch / 2)
    cy, sy = jnp.cos(yaw / 2), jnp.sin(yaw / 2)
    return jnp.stack(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ],
        axis=-1,
    )


def quat_to_euler(q):
    """Quaternion -> (roll, pitch, yaw)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    roll = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    pitch = jnp.arcsin(jnp.clip(2 * (w * y - z * x), -1.0, 1.0))
    yaw = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return roll, pitch, yaw


# ---------------------------------------------------------------------------
# Savitzky-Golay smoothing of the optimal control sequence.
# Same 5-tap quadratic/cubic SG kernel the reference hard-codes in
# controllers/controller.cuh:557-586 ([-3, 12, 17, 12, -3] / 35).
# ---------------------------------------------------------------------------

# numpy (not jnp) on purpose: a module-scope jnp.array would initialize the
# XLA backend at import time, which forbids a later
# jax.distributed.initialize() (multi-host bring-up imports this package
# before calling parallel.mesh.distributed_init). jnp ops convert it lazily.
SG_FILTER_5 = np.array([-3.0, 12.0, 17.0, 12.0, -3.0], np.float32) / 35.0


def savitzky_golay_smooth(u_seq, history=None):
    """Smooth a control sequence (T, C) with the 5-tap SG filter.

    ``history`` is the (2, C) most recent *executed* controls preceding the
    sequence; the tail is padded by repeating the final control, mirroring the
    reference's smoothControlTrajectoryHelper.
    """
    T = u_seq.shape[0]
    if history is None:
        history = jnp.tile(u_seq[0:1], (2, 1))
    tail = jnp.tile(u_seq[-1:], (2, 1))
    padded = jnp.concatenate([history, u_seq, tail], axis=0)  # (T+4, C)
    windows = jnp.stack([padded[i : i + T] for i in range(5)], axis=0)  # (5,T,C)
    return jnp.einsum("w,wtc->tc", SG_FILTER_5, windows)


def update_control_history(history, u_seq, stride):
    """2-step executed-control history update before a slide
    (saveControlHistoryHelper, controller.cuh:524-544): stride >= 2 takes the
    last two consumed controls [u[stride-2], u[stride-1]]; stride == 1 shifts
    [history[1], u[0]]; stride == 0 leaves the history unchanged. ``stride``
    may be traced."""
    T = u_seq.shape[0]
    idx0 = jnp.clip(stride - 2, 0, T - 1)
    idx1 = jnp.clip(stride - 1, 0, T - 1)
    two_plus = jnp.stack([u_seq[idx0], u_seq[idx1]])
    one = jnp.stack([history[1], u_seq[0]])
    return jnp.where(
        stride >= 2, two_plus, jnp.where(stride == 1, one, history)
    )


def slide_control_sequence(u_seq, stride, slide_scale=None):
    """Shift the control sequence forward by ``stride`` steps.

    Vacated tail steps are filled with the last control scaled toward zero by
    ``slide_scale`` per channel (reference slideControlSequenceHelper,
    controller.cuh:588-600: the further past the horizon, the closer to zero).
    ``stride`` may be traced (dynamic) — uses gather, not slicing.
    """
    T, C = u_seq.shape
    idx = jnp.arange(T) + stride
    src = jnp.clip(idx, 0, T - 1)
    shifted = u_seq[src]
    if slide_scale is None:
        slide_scale = jnp.zeros((C,), u_seq.dtype)
    # steps that ran past the horizon decay toward zero control
    over = jnp.maximum(idx - (T - 1), 0).astype(u_seq.dtype)[:, None]
    decay = jnp.power(jnp.broadcast_to(slide_scale, (C,))[None, :], jnp.minimum(over, 30.0))
    decay = jnp.where(over > 0, decay, 1.0)
    return shifted * decay


# ---------------------------------------------------------------------------
# Numerical integration (reference utils/numerical_integration.h).
# ---------------------------------------------------------------------------

def rk4_step(f, x, u, dt, *args):
    """Classic RK4 step of dx/dt = f(x, u, *args)."""
    k1 = f(x, u, *args)
    k2 = f(x + 0.5 * dt * k1, u, *args)
    k3 = f(x + 0.5 * dt * k2, u, *args)
    k4 = f(x + dt * k3, u, *args)
    return x + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)


def linear_interp(t, t0, v0, t1, v1):
    """Linear interpolation guarded against t1 == t0."""
    denom = jnp.where(jnp.abs(t1 - t0) < 1e-12, 1.0, t1 - t0)
    alpha = jnp.clip((t - t0) / denom, 0.0, 1.0)
    return v0 + alpha * (v1 - v0)
