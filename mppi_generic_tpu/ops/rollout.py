"""Rollout primitives: the TPU-native analogs of the reference's CUDA rollout
kernels (core/mppi_common.cu).

Two paths, mirroring the reference's single/split kernel choice
(controllers auto-tune between them, mppi_controller.cu:45-143):

* ``rollout_combined`` — the ``rolloutKernel`` analog
  (mppi_common.cu:28-146): one ``lax.scan`` over the horizon carrying
  (state, crash, running_cost), vmapped over samples. Dynamics, running cost
  and likelihood-ratio cost are fused into the scan body; XLA keeps the whole
  loop on-chip.

* ``rollout_outputs`` + ``trajectory_state_costs`` — the split
  ``rolloutDynamicsKernel`` / ``rolloutCostKernel`` analog
  (mppi_common.cu:148-362): the scan produces the (K, T, O) output
  trajectory, then the cost pass is *time-parallel* (vmap over t) when the
  cost is crash-free, exactly the split kernel's trick of tiling time across
  threads.

Cost convention (mppi_common.cu:98-145): output y stored at index t is the
output *after* stepping with u_t (i.e. of x_{t+1}); the running cost at t is
evaluated on that y; the total is (sum_t running + terminal(y_{T-1})) / T.

Controls are assumed already constraint-clamped (the sampler/controller clamps
the whole (K, T, C) tensor up-front — equivalent to the reference clamping
in-kernel then writing the clamped sample back, mppi_common.cu:108-119, since
``enforceConstraints`` does not depend on state for the supported models).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mppi_generic_tpu.costs.base import Cost
from mppi_generic_tpu.models.base import Dynamics


def _time_indices(T):
    return jnp.arange(T, dtype=jnp.int32)


def rollout_combined(
    dynamics: Dynamics,
    cost: Cost,
    x0: jnp.ndarray,
    U: jnp.ndarray,
    dt: float,
    lr_cost_per_step: Optional[jnp.ndarray] = None,
):
    """Fused rollout: returns (costs (K,), Y (K, T, O), crash (K,)).

    ``lr_cost_per_step``: optional (K, T) likelihood-ratio cost to accumulate
    alongside the running cost (the in-scan sampler term of
    mppi_common.cu:126-133).
    """
    K, T, _ = U.shape
    ts = _time_indices(T)

    def one_sample(x0_k, U_k, lr_k):
        def step_fn(carry, inp):
            x, rec, crash, acc = carry
            u, t, lr_t = inp
            x_next, y, rec = dynamics.step_recurrent(
                x, rec, u, t.astype(jnp.float32), dt
            )
            c, crash = cost.running_cost(y, u, t, crash)
            return (x_next, rec, crash, acc + c + lr_t), y

        init = (x0_k, dynamics.init_recurrent_state(), jnp.int32(0), jnp.float32(0.0))
        (xT, rec, crash, acc), Y_k = jax.lax.scan(step_fn, init, (U_k, ts, lr_k))
        total = (acc + cost.terminal_cost(Y_k[-1])) / T
        return total, Y_k, crash

    if lr_cost_per_step is None:
        lr_cost_per_step = jnp.zeros((K, T), U.dtype)
    x0_b = jnp.broadcast_to(x0, (K,) + x0.shape) if x0.ndim == 1 else x0
    return jax.vmap(one_sample)(x0_b, U, lr_cost_per_step)


def rollout_outputs(dynamics: Dynamics, x0: jnp.ndarray, U: jnp.ndarray, dt: float):
    """Dynamics-only rollout (rolloutDynamicsKernel analog): (K, T, O) outputs."""
    K, T, _ = U.shape
    ts = _time_indices(T)

    def one_sample(x0_k, U_k):
        def step_fn(carry, inp):
            x, rec = carry
            u, t = inp
            x_next, y, rec = dynamics.step_recurrent(
                x, rec, u, t.astype(jnp.float32), dt
            )
            return (x_next, rec), y

        _, Y_k = jax.lax.scan(
            step_fn, (x0_k, dynamics.init_recurrent_state()), (U_k, ts)
        )
        return Y_k

    x0_b = jnp.broadcast_to(x0, (K,) + x0.shape) if x0.ndim == 1 else x0
    return jax.vmap(one_sample)(x0_b, U)


def trajectory_state_costs(
    cost: Cost,
    Y: jnp.ndarray,
    U: jnp.ndarray,
    sequential_crash: bool = False,
    batched_crash: bool = False,
):
    """Cost pass over precomputed outputs (rolloutCostKernel analog).

    Returns (costs (K,), crash (K,)). ``costs`` = (sum_t running +
    terminal) / T, *excluding* any sampler likelihood term (add it outside).

    When ``sequential_crash`` is False the time axis is fully parallel (vmap
    over t, like the split kernel's thread-tiled time loop); otherwise a
    per-sample scan carries the crash status.

    ``batched_crash``: for costs declaring ``time_parallel_crash()``
    (sticky-prefix crash, e.g. the AutoRally track cost) an alternative
    fully time-parallel pass exists — dual evaluation at crash=0/1 over all
    (K, T) points + inclusive ``lax.cummax`` prefix of the triggers (the
    XLA analog of the fused kernels' dual-evaluation + prefix-OR tier),
    bitwise the same crash flags as the scan. MEASURED SLOWER than the scan
    on the bench chip for every map-bearing BASELINE config (autorally
    1.42 vs 1.33 ms combined, bicycle-trackmap 1.20 vs 1.10,
    racer-elevation 2.55 vs 2.49; scripts/map_kernel_probe.py, 2026-08):
    XLA materializes the (K*T, W) one-hot interpolation matrices in HBM,
    while the per-step scan keeps (K, W) intermediates fused on-chip. Kept
    for measurement and for costs whose per-step work is far heavier than
    a map lookup; the in-kernel Pallas map path is the fast alternative.
    """
    K, T, _ = Y.shape
    ts = _time_indices(T)

    if (batched_crash and sequential_crash and cost.time_parallel_crash()
            and not cost.time_parallel_cost()):
        # one batched evaluation over ALL K*T points (see docstring for the
        # measured tradeoff vs the scan)
        Yt = jnp.moveaxis(Y, -1, 0)  # (O, K, T): components on axis 0
        Ut = jnp.moveaxis(U, -1, 0)  # (C, K, T)
        ts_f = ts.astype(jnp.float32)  # (T,), broadcasts against (K, T)
        c0, trig = cost.running_cost(Yt, Ut, ts_f, jnp.int32(0))
        c1, _ = cost.running_cost(Yt, Ut, ts_f, jnp.int32(1))
        flags = jax.lax.cummax(
            jnp.broadcast_to(trig, (K, T)), axis=1
        )  # inclusive prefix, matching the in-kernel split tier
        cs = jnp.where(flags > 0, jnp.broadcast_to(c1, (K, T)),
                       jnp.broadcast_to(c0, (K, T)))
        acc = jnp.sum(cs, axis=1)
        total = (acc + cost.terminal_cost(Y[:, -1, :].T)) / T
        return total, flags[:, -1]

    def one_sample(Y_k, U_k):
        if sequential_crash:
            def step_fn(crash, inp):
                y, u, t = inp
                c, crash = cost.running_cost(y, u, t, crash)
                return crash, c

            crash, cs = jax.lax.scan(step_fn, jnp.int32(0), (Y_k, U_k, ts))
            acc = jnp.sum(cs)
        else:
            cs, _ = jax.vmap(lambda y, u, t: cost.running_cost(y, u, t, jnp.int32(0)))(
                Y_k, U_k, ts
            )
            acc = jnp.sum(cs)
            crash = jnp.int32(0)
        total = (acc + cost.terminal_cost(Y_k[-1])) / T
        return total, crash

    return jax.vmap(one_sample)(Y, U)
