"""iLQR/DDP trajectory-tracking feedback — jittable JAX rebuild of the
reference's Eigen DDP solver (ddp/ddp.h:54-170) and its DDPFeedback wrapper
(feedback_controllers/DDP/ddp.{cuh,cu}).

Semantics matched to ddp/ddp.h run():

* discrete model x' = x + f(x, u) dt; A_k = I + df/dx * dt, B_k = df/du * dt
  (Jacobians via jax.jacfwd over the dynamics instead of the reference's
  hand-written model wrappers);
* quadratic tracking cost c = (x-x*)' Q (x-x*) + (u-u*)' R (u-u*) with
  gradient Q(x-x*) (the reference's convention — Q absorbs the factor 2,
  ddp_tracking_costs.h:37-53) and terminal cost via Q_f;
* backward pass with LDLT -> here a Tikhonov-regularized linear solve;
* forward pass with backtracking line search alpha in {1, 1/2, ...} and
  control clamping to [u_min, u_max]; candidate accepted when its cost does
  not exceed the previous iteration's (first iteration always accepts).
  The data-dependent backtracking loop becomes a vmapped evaluation over a
  static alpha ladder + argmax select (static shapes for XLA).

The returned gains K[t] (C, S) implement u_fb = K[t] (x - x_goal) exactly as
the reference's device k() (DDP/ddp.cu:11-45).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import struct

from mppi_generic_tpu.feedback.base import FeedbackController
from mppi_generic_tpu.models.base import Dynamics
from mppi_generic_tpu.ops import pallas_riccati


class DDPFeedbackState(struct.PyTreeNode):
    """fb_gain_traj_ analog (DDP/ddp.cuh:28-53): (T, C, S) gain trajectory
    plus the solver's feedforward/trajectory outputs for diagnostics."""

    gains: jnp.ndarray  # (T, C, S)
    x_traj: jnp.ndarray = None  # (T, S)
    u_traj: jnp.ndarray = None  # (T, C)
    total_cost: jnp.ndarray = None


def _alpha_ladder(n=14):
    return jnp.power(0.5, jnp.arange(n, dtype=jnp.float32))


# test escape hatch: force the fused ladder kernel (interpret mode) off-TPU
# so the shard_map-replicated path can be exercised on the virtual CPU mesh
_LADDER_INTERPRET = False


def ilqr_tracking(
    dynamics: Dynamics,
    x0,
    u_init,
    goal_x,
    goal_u,
    Q,
    R,
    Q_f,
    dt,
    iterations: int = 1,
    u_min=None,
    u_max=None,
    use_boxqp: bool = False,
    use_pallas: bool = True,
    mesh=None,
):
    """Run iLQR tracking. Shapes: x0 (S,), u_init (T, C), goal_x (T, S),
    goal_u (T, C). Returns DDPFeedbackState with gains (T, C, S)."""
    T, C = u_init.shape
    S = x0.shape[0]
    if u_min is None:
        u_min = dynamics.control_ranges[:, 0]
    if u_max is None:
        u_max = dynamics.control_ranges[:, 1]
    # guard against infinite ranges breaking clamping math
    u_min = jnp.nan_to_num(u_min, neginf=-1e30)
    u_max = jnp.nan_to_num(u_max, posinf=1e30)

    f = lambda x, u: dynamics.state_deriv(x, u)

    def clamp(u):
        return jnp.clip(u, u_min, u_max)

    def forward_rollout(x0, U):
        def step(x, u):
            x_next = x + f(x, clamp(u)) * dt
            return x_next, x

        _, xs = jax.lax.scan(step, x0, U)
        return xs  # (T, S): xs[k] = state BEFORE applying U[k] (ddp.h x_ cols)

    def running_cost(x, u, t):
        ex = x - goal_x[t]
        eu = u - goal_u[t]
        return ex @ Q @ ex + eu @ R @ eu

    def terminal_cost(x):
        e = x - goal_x[-1]
        return e @ Q_f @ e

    def trajectory_cost(xs, us):
        # ddp.h line-search cost: sum_k c(x_k, u_k, k)*dt + terminal V
        ts = jnp.arange(T)
        cs = jax.vmap(running_cost)(xs, us, ts)
        return jnp.sum(cs[:-1]) * dt + terminal_cost(xs[-1])

    def linearize(xs, us):
        """Batched Jacobians + cost gradients + terminal value function
        (the ddp_model_wrapper/tracking-cost derivatives, MXU-friendly)."""
        def jac(x, u):
            A = jax.jacfwd(lambda s: f(s, u))(x) * dt + jnp.eye(S)
            B = jax.jacfwd(lambda c: f(x, c))(u) * dt
            return A, B

        As, Bs = jax.vmap(jac)(xs, us)
        ts = jnp.arange(T)
        dLx = jax.vmap(lambda x, t: Q @ (x - goal_x[t]))(xs, ts)
        dLu = jax.vmap(lambda u, t: R @ (u - goal_u[t]))(us, ts)
        Vxx_T = 0.5 * (Q_f + Q_f.T)
        Vx_T = Q_f @ (xs[-1] - goal_x[-1])
        return As, Bs, dLx, dLu, Vxx_T, Vx_T

    def backward_pass(xs, us):
        As, Bs, dLx, dLu, Vxx_T, Vx_T = linearize(xs, us)

        # the sequential Riccati recursion is XLA-op-latency-bound on TPU
        # (~4.5 us/step on tiny matrices); a single-program Pallas kernel on
        # the scalar core runs it ~2.3x faster and in exact f32 (the XLA
        # scan's small matmuls use default-precision bf16 MXU passes).
        # mesh is None only: unlike the ladder path, this bare pallas_call
        # has no shard_map wrapper, and pjit cannot partition it
        if (use_pallas and not use_boxqp and mesh is None
                and jax.default_backend() == "tpu"
                and pallas_riccati.supported(S, C, T)):
            return pallas_riccati.riccati_backward(
                As, Bs, dLx, dLu, Q, R, Vxx_T, Vx_T, dt, reg=1e-6
            )

        def bwd(carry, inp):
            Vx, Vxx = carry
            A, B, lx, lu, u_k = inp
            qx = lx * dt + A.T @ Vx
            qu = lu * dt + B.T @ Vx
            qux = B.T @ Vxx @ A
            qxx = Q * dt + A.T @ Vxx @ A
            quu = R * dt + B.T @ Vxx @ B
            quu_reg = quu + 1e-6 * jnp.eye(C)
            if use_boxqp:
                # control-constrained QP on du (ddp.h backward pass +
                # ddp/boxqp.h): bounds relative to the current control
                from mppi_generic_tpu.feedback.boxqp import boxqp, boxqp_gains

                kk, free = boxqp(quu_reg, qu, u_min - u_k, u_max - u_k)
                Kk = boxqp_gains(quu_reg, qux, free)
            else:
                Kk = -jnp.linalg.solve(quu_reg, qux)
                kk = -jnp.linalg.solve(quu_reg, qu)
            Vxx_new = qxx + qux.T @ Kk
            Vxx_new = 0.5 * (Vxx_new + Vxx_new.T)
            Vx_new = qx + qux.T @ kk
            return (Vx_new, Vxx_new), (Kk, kk)

        (_, _), (Ks, ks) = jax.lax.scan(
            bwd, (Vx_T, Vxx_T),
            (As[:-1], Bs[:-1], dLx[:-1], dLu[:-1], us[:-1]), reverse=True
        )
        # pad step T-1 with zeros (reference leaves Lk_(H-1) at zero)
        Ks = jnp.concatenate([Ks, jnp.zeros((1, C, S))], axis=0)
        ks = jnp.concatenate([ks, jnp.zeros((1, C))], axis=0)
        return Ks, ks

    def forward_pass(xs, us, Ks, ks, alpha):
        def step(x, inp):
            x_ref, u_ref, Kk, kk = inp
            u = clamp(u_ref + alpha * kk + Kk @ (x - x_ref))
            x_next = x + f(x, u) * dt
            return x_next, (x, u)

        _, (xnew, unew) = jax.lax.scan(step, xs[0], (xs, us, Ks, ks))
        return xnew, unew

    # fused backward+line-search kernel gate: one Pallas program runs the
    # scalar-core Riccati recursion AND the whole alpha-ladder forward pass
    # (one lane per alpha) — removes the XLA 14-alpha vmapped scan that
    # dominated DDP synthesis after the backward kernel landed
    use_ladder = (use_pallas and not use_boxqp
                  and (jax.default_backend() == "tpu" or _LADDER_INTERPRET)
                  and pallas_riccati.supported(S, C, T))
    if use_ladder:
        for leaf in jax.tree_util.tree_leaves(dynamics):
            if jnp.asarray(leaf).ndim > 3:
                use_ladder = False
                break

    def run_ladder(xs, us, alphas):
        As, Bs, dLx, dLu, Vxx_T, Vx_T = linearize(xs, us)
        if mesh is None:
            return pallas_riccati.riccati_ladder_solve(
                dynamics, xs, us, As, Bs, dLx, dLu, Q, R, Q_f,
                Vxx_T, Vx_T, goal_x, goal_u, alphas, u_min, u_max, dt,
                reg=1e-6, interpret=_LADDER_INTERPRET,
            )
        # sample-axis mesh: the DDP synthesis is sample-independent, so
        # every device computes the same (replicated) kernel under
        # shard_map — the single-chip pallas_call cannot be partitioned by
        # pjit, but a fully-replicated manual region lowers fine
        from jax.sharding import PartitionSpec as P

        leaves, treedef = jax.tree_util.tree_flatten(dynamics)

        def body(xs_, us_, As_, Bs_, dLx_, dLu_, Vxx_, Vx_, gx_, gu_,
                 Q_, R_, Qf_, al_, lo_, hi_, dt_, *leaf_vals):
            dyn = jax.tree_util.tree_unflatten(treedef, leaf_vals)
            return pallas_riccati.riccati_ladder_solve(
                dyn, xs_, us_, As_, Bs_, dLx_, dLu_, Q_, R_, Qf_,
                Vxx_, Vx_, gx_, gu_, al_, lo_, hi_, dt_,
                reg=1e-6, interpret=_LADDER_INTERPRET,
            )

        n_in = 17 + len(leaves)
        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(),) * n_in, out_specs=(P(),) * 5,
            check_vma=False,
        )(xs, us, As, Bs, dLx, dLu, Vxx_T, Vx_T, goal_x, goal_u,
          Q, R, Q_f, alphas, u_min, u_max, jnp.asarray(dt, jnp.float32),
          *[jnp.asarray(l) for l in leaves])

    def iteration(carry, it):
        xs, us, prev_cost = carry
        alphas = _alpha_ladder()
        if use_ladder:
            Ks, ks, cs, xns, uns = run_ladder(xs, us, alphas)
        else:
            Ks, ks = backward_pass(xs, us)

            def try_alpha(a):
                xn, un = forward_pass(xs, us, Ks, ks, a)
                return xn, un, trajectory_cost(xn, un)

            xns, uns, cs = jax.vmap(try_alpha)(alphas)
        accept = (cs <= prev_cost) | (it == 0)
        # first (largest) accepted alpha; fall back to the smallest alpha
        idx = jnp.argmax(accept)
        idx = jnp.where(jnp.any(accept), idx, alphas.shape[0] - 1)
        xs_new = xns[idx]
        us_new = uns[idx]
        cost_new = cs[idx]
        return (xs_new, us_new, cost_new), (Ks, ks)

    us0 = clamp(u_init)
    xs0 = forward_rollout(x0, us0)
    carry = (xs0, us0, jnp.float32(jnp.inf))
    gains = None
    for it in range(iterations):
        carry, (gains, ffs) = iteration(carry, it)
    xs, us, cost = carry
    return DDPFeedbackState(gains=gains, x_traj=xs, u_traj=us, total_cost=cost)


class DDPFeedback(FeedbackController):
    """DDPFeedback analog (feedback_controllers/DDP/ddp.cuh:106-161):
    iLQR tracking of the nominal trajectory, gains applied as
    u_fb = K[t](x - x_goal)."""

    dynamics: Dynamics
    Q: jnp.ndarray = None
    R: jnp.ndarray = None
    Q_f: jnp.ndarray = None
    dt: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.02))
    num_iterations: int = struct.field(pytree_node=False, default=1)
    # control-constrained backward pass via the projected-Newton BoxQP
    # (ddp/boxqp.h); off by default — identical to the plain Newton step
    # when the control ranges are infinite.
    use_boxqp: bool = struct.field(pytree_node=False, default=False)
    # single-program Pallas Riccati + line-search kernel
    # (ops/pallas_riccati.py); auto-falls-back to the XLA scan off-TPU,
    # under BoxQP, and on unsupported sizes
    use_pallas: bool = struct.field(pytree_node=False, default=True)
    # sample-axis mesh of a sharded controller: the (replicated) DDP
    # synthesis then runs the Pallas kernel inside a fully-replicated
    # shard_map region (parallel/mesh.py sets this)
    mesh: object = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, dynamics, dt, Q=None, R=None, Q_f=None, num_iterations=1,
               use_boxqp=False, use_pallas=True):
        S, C = dynamics.STATE_DIM, dynamics.CONTROL_DIM
        if Q is None:
            Q = jnp.eye(S)
        if R is None:
            R = jnp.eye(C)
        if Q_f is None:
            Q_f = jnp.eye(S)
        return cls(
            dynamics=dynamics,
            Q=jnp.asarray(Q, jnp.float32),
            R=jnp.asarray(R, jnp.float32),
            Q_f=jnp.asarray(Q_f, jnp.float32),
            dt=jnp.float32(dt),
            num_iterations=num_iterations,
            use_boxqp=use_boxqp,
            use_pallas=use_pallas,
        )

    def init_feedback_state(self, num_timesteps):
        S, C = self.dynamics.STATE_DIM, self.dynamics.CONTROL_DIM
        return DDPFeedbackState(
            gains=jnp.zeros((num_timesteps, C, S)),
            x_traj=jnp.zeros((num_timesteps, S)),
            u_traj=jnp.zeros((num_timesteps, C)),
            total_cost=jnp.float32(0.0),
        )

    def compute_feedback(self, x0, goal_traj, control_traj):
        return ilqr_tracking(
            self.dynamics,
            x0,
            control_traj,
            goal_traj,
            jnp.zeros_like(control_traj),
            self.Q,
            self.R,
            self.Q_f,
            self.dt,
            iterations=self.num_iterations,
            use_boxqp=self.use_boxqp,
            use_pallas=self.use_pallas,
            mesh=self.mesh,
        )

    def k(self, x, x_goal, t, fb_state: DDPFeedbackState):
        return fb_state.gains[t] @ (x - x_goal)
