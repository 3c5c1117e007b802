"""Control-contraction-metric (CCM) feedback.

Parity target: reference ``feedback_controllers/CCM/ccm.h`` (LinearCCM,
:104-248 — experimental, CPU-only upstream; exercised by
tests/mppi_core/CCM_tests.cu). The feedback law (u_feedback, :204-228):

    delta_x = x - x_nom
    E    = delta_x^T M(x) delta_x                       (Riemannian energy)
    lhs  = 2 B(x)^T M(x) delta_x
    rhs  = -2 lambda E
           - 2 delta_x^T M(x) (f(x) - f(x_nom) + (B(x) - B(x_nom)) u_nom)
    u_fb = 0                  if rhs > 0 or |lhs| = 0
         = (rhs / |lhs|^2) lhs  otherwise

``metric_W`` holds the dual-metric polynomial coefficients: W(x) is the 2x2
block matrix [[w1 I, w2 I], [w3 I, w4 I]] with w_i = a_i (x0^2 + x1^2) + b_i,
and M = W^{-1} (:149-174; defaults are the reference's lambda = 3.5 synthesis
for the double integrator). ``f``/``B`` come from the dynamics
(state_deriv / state_jacobian), replacing the reference's hand-plumbed
model hooks.

The reference also carries Chebyshev pseudospectral machinery for geodesic
computation (chebyshevPts/chebyshevPolynomial, :22-89) that its feedback law
never calls; ``chebyshev_points`` / ``chebyshev_polynomial`` reproduce them
for parity and tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from mppi_generic_tpu.feedback.base import FeedbackController


def chebyshev_points(n):
    """Chebyshev-Gauss-Lobatto points on [0, 1] + Clenshaw-Curtis weights
    (ccm.h:22-53). Returns (points (n,), weights (n,))."""
    k = jnp.arange(n, dtype=jnp.float32)
    pts = 0.5 * (1.0 - jnp.cos(jnp.pi * k / (n - 1)))
    # Clenshaw-Curtis quadrature weights, scaled to [0, 1]
    N = n - 1
    js = jnp.arange(1, N // 2 + 1, dtype=jnp.float32)
    b = jnp.where(2 * js == N, 1.0, 2.0)

    def weight(i):
        theta = jnp.pi * i / N
        s = jnp.sum(b / (4.0 * js**2 - 1.0) * jnp.cos(2.0 * js * theta))
        c = jnp.where((i == 0) | (i == N), 1.0, 2.0)
        return c / N * (1.0 - s) * 0.5

    w = jax.vmap(weight)(jnp.arange(n, dtype=jnp.float32))
    return pts, w


def chebyshev_polynomial(pts, degree):
    """Chebyshev polynomials T_0..T_{degree-1} evaluated at ``pts`` mapped to
    [-1, 1] (ccm.h:55-70). Returns (degree, n)."""
    x = 2.0 * pts - 1.0
    rows = [jnp.ones_like(x), x]
    for d in range(2, degree):
        rows.append(2.0 * x * rows[-1] - rows[-2])
    return jnp.stack(rows[:degree])


class CCMFeedback(FeedbackController):
    """LinearCCM analog. fb_state = (x_nominal_traj (T, S),
    u_nominal_traj (T, C))."""

    dynamics: object = None
    lam: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(3.5))
    # W(x) block coefficients [a, b] per block term (ccm.h:167-170)
    w1: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.array([0.0005948, 2.2416827], jnp.float32)
    )
    w2: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.array([-0.0044842, -8.2434395], jnp.float32)
    )
    w3: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.array([-0.0044842, -8.2434395], jnp.float32)
    )
    w4: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.array([0.0521421, 59.1072868], jnp.float32)
    )

    @classmethod
    def create(cls, dynamics, lam=3.5, **kw):
        return cls(dynamics=dynamics, lam=jnp.float32(lam),
                   **{k: jnp.asarray(v, jnp.float32) for k, v in kw.items()})

    # --- metric -----------------------------------------------------------
    def metric(self, x):
        """M(x) = W(x)^{-1} (ccm.h:149-174). The reference zeroes the
        state-dependent terms (x0_2 = x1_2 = 0, :152-153) — kept faithfully:
        the polynomial coefficients are stored but evaluated at 0."""
        S = self.dynamics.STATE_DIM
        half = S // 2
        r2 = jnp.float32(0.0)  # reference hard-zeroes the state dependence
        eye = jnp.eye(half)
        W = jnp.block([
            [(self.w1[0] * r2 + self.w1[1]) * eye,
             (self.w2[0] * r2 + self.w2[1]) * eye],
            [(self.w3[0] * r2 + self.w3[1]) * eye,
             (self.w4[0] * r2 + self.w4[1]) * eye],
        ])
        return jnp.linalg.inv(W)

    def energy(self, delta_x, x):
        return delta_x @ self.metric(x) @ delta_x

    # --- FeedbackController interface --------------------------------------
    def init_feedback_state(self, num_timesteps):
        S = self.dynamics.STATE_DIM
        C = self.dynamics.CONTROL_DIM
        return (jnp.zeros((num_timesteps, S)), jnp.zeros((num_timesteps, C)))

    def compute_feedback(self, x0, goal_traj, control_traj):
        """CCM needs no per-solve synthesis (initTrackingController is empty,
        ccm.h:131) — the state is just the nominal trajectories."""
        del x0
        return (goal_traj, control_traj)

    def u_feedback(self, x_act, x_nom, u_nom):
        """The contraction feedback law (ccm.h:204-228)."""
        dyn = self.dynamics
        delta_x = x_act - x_nom
        M = self.metric(x_act)
        _, B_act = dyn.state_jacobian(x_act, u_nom)
        _, B_nom = dyn.state_jacobian(x_nom, u_nom)
        zero_u = jnp.zeros_like(u_nom)
        E = delta_x @ M @ delta_x
        lhs = 2.0 * B_act.T @ M @ delta_x
        lhs_norm2 = jnp.sum(lhs * lhs)
        drift = (dyn.state_deriv(x_act, zero_u)
                 - dyn.state_deriv(x_nom, zero_u)
                 + (B_act - B_nom) @ u_nom)
        rhs = -2.0 * self.lam * E - 2.0 * delta_x @ M @ drift
        u = jnp.where(
            (rhs > 0) | (lhs_norm2 == 0),
            jnp.zeros_like(u_nom),
            rhs / jnp.maximum(lhs_norm2, 1e-12) * lhs,
        )
        return u

    def k(self, x, x_goal, t, fb_state):
        _, u_traj = fb_state
        T = u_traj.shape[0]
        u_nom = u_traj[jnp.clip(t, 0, T - 1)]
        return self.u_feedback(x, x_goal, u_nom)
