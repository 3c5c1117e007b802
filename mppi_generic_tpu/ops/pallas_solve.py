"""Fully-fused MPPI solve-iteration Pallas kernel.

One kernel = one optimization iteration: hardware-PRNG sampling, carve-outs,
constraint clamp, likelihood-ratio cost, the rollout, the normExp weight
transform AND the weighted mean update — the TPU-native analog of the
reference's whole per-iteration GPU pipeline (``rolloutKernel`` +
``fullGPUcomputeWeights`` + ``weightedReductionKernel``,
core/mppi_common.cu:28-146,902-1053,710-765) collapsed into a single launch.

Two structural wins over ``pallas_rollout._fused_sample_call`` (both driven
by round-3 device-trace measurements, BASELINE.md "MFU / roofline"):

1. **Time-vectorized generation.** The PRNG draw, Box-Muller transform,
   carve-outs, clamp and likelihood-ratio arithmetic — ~2/3 of the old
   per-timestep instruction count — move out of the sequential horizon loop
   into chunked full-width VPU ops writing a VMEM scratch. The horizon loop
   keeps only what is truly sequential (dynamics + running cost). The old
   kernel was issue-latency-bound: ~60 dependency-chained short ops per
   timestep; the new loop issues ~20.

2. **In-kernel weighted mean (online softmax).** Because the normExp weight
   ``w_k = exp(-(J_k - min J)/lambda)`` is a softmax over ``s_k = -J_k /
   lambda``, the weighted mean update can accumulate across sample tiles in
   one pass with the flash-attention rescaling trick: carry the running max
   ``m`` (== -baseline/lambda, exactly), the rescaled normalizer ``d`` and
   the rescaled weighted sum ``num[T, C]``; each new tile rescales the
   carries by ``exp(m_old - m_new)``. The (K, T, C) sample tensor therefore
   never leaves VMEM — no HBM write, no XLA-side reduction read-back.

Parameter tables (mean/sigma/LR coefficients) ride in lane-replicated VMEM
rows instead of SMEM scalars, so this path has no (T, C) SMEM-table horizon
ceiling (VERDICT r2 item 4): T=1024 tables cost ~1 MB of VMEM.

A third structural win is optional (``split_cost``): for costs that declare
``time_parallel_cost()`` — no crash propagation, no data-dependent time
indexing — the sequential horizon loop shrinks to dynamics only (the true
loop-carried dependency), streaming outputs to VMEM scratch, and the cost
evaluates afterwards in tall time-vectorized VPU ops. This is the in-kernel
analog of the reference's split-kernel choice (rolloutDynamicsKernel +
time-tiled rolloutCostKernel, mppi_common.cu:148-362), applied where it
matters on TPU: the issue-latency-bound sequential loop. Layout consequence:
the sample/output scratch and all parameter tables are channel-major
(C, Tp, ...) so component slices feed ``cost.running_cost`` directly.

Sharding: under a sample-axis ``shard_map`` each chip runs the kernel on
its K/n slice (disjoint PRNG streams, global carve-out indices) and the
flash carries combine with one pmax + two psums — cross-chip traffic is
4 B + 4 B + 4*T*C B per solve, the analytically-minimal payload.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mppi_generic_tpu.costs.base import Cost
from mppi_generic_tpu.models.base import Dynamics
from mppi_generic_tpu.ops.pallas_rollout import (
    LANES,
    PallasIncompatible,
    _check_compatible,
    _map_query_layout,
    _mesh_axis,
    _prepare_leaves,
    _read_leaf,
    _replicated,
    _round_up,
    default_tile_k,
)

_NEG_INF = -1e30
# Resident-VMEM budget for the solve kernel's per-tile working set
# (lane-replicated tables + sample scratch + optional split/emission
# blocks). Past it the kernel would die in Mosaic with a raw VMEM
# overflow the controllers' PallasIncompatible fallback cannot catch —
# so the budget check raises FIRST, and long horizons degrade to
# fused_sample_rollout_costs, whose tables DMA-stream (round 5) and
# whose horizon is unbounded. Same headroom philosophy as
# pallas_rollout._SPLIT_SCRATCH_BYTES (~16 MB/core minus Mosaic
# temporaries).
_SOLVE_VMEM_BUDGET = 11 * 1024 * 1024


def _lane_rep(tab):
    """(..., ) table -> lane-replicated (..., 1, LANES) f32 for in-kernel
    sublane broadcasting (Mosaic cannot broadcast from a (1, 1) minor
    shape, but (1, LANES) -> (rows, LANES) is a plain sublane broadcast)."""
    t = jnp.asarray(tab, jnp.float32)
    return jnp.broadcast_to(t[..., None, None], t.shape + (1, LANES))


@functools.partial(
    jax.jit,
    static_argnames=("treedef", "dynamics_static", "cost_static", "T", "Tp",
                     "Tc", "C", "S", "K", "K_pad", "tile_k", "noise_kind",
                     "emit_samples", "split_cost", "out_dim", "recurrent",
                     "inject", "interpret", "windowed"),
)
def _fused_solve_call(leaves, treedef, dynamics_static, cost_static,
                      x0, mean_b, sigma_b, aux_b, lrc_b, tpin_b,
                      lo_b, hi_b, db_b, zc_b,
                      seed, scal, T, Tp, Tc, C, S, K, K_pad, tile_k,
                      noise_kind="gaussian", emit_samples=False,
                      split_cost=False, out_dim=0, recurrent=False,
                      inject=False, zinj=None, interpret=False,
                      windowed=()):
    del dynamics_static, cost_static
    from mppi_generic_tpu.ops.pallas_rollout import (
        _init_window_origins,
        _pad_windowed,
        _windowed_holders,
        _windowed_scratch,
    )

    rows = tile_k // LANES
    grid = K_pad // tile_k
    n_chunks = Tp // Tc
    leaves = _pad_windowed(leaves, windowed)
    leaf_ndims = tuple(l.ndim for l in leaves)
    TWO_PI = 6.2831853071795864
    INV_2_24 = float(2.0 ** -24)
    half = (Tc * C + 1) // 2
    n_z = 2 if noise_kind == "nln" else 1
    if not inject:
        # (1,)*4 dummy keeps one call structure; never read when not inject
        zinj = jnp.zeros((1, 1, 1, 1), jnp.float32)

    @_map_query_layout
    def kernel(*refs):
        if windowed:  # map-window scratch rides at the very end
            map_scr = refs[len(refs) - 3 * len(windowed):]
            refs = refs[: len(refs) - 3 * len(windowed)]

            @pl.when(pl.program_id(0) == 0)
            def _invalidate_windows():
                _init_window_origins(windowed, map_scr)

            holders = _windowed_holders(windowed, refs[: len(leaves)],
                                        map_scr)
        else:
            holders = {}
        leaf_refs = refs[: len(leaves)]
        (x0_ref, mean_ref, sigma_ref, aux_ref, lrc_ref, tpin_ref,
         lo_ref, hi_ref, db_ref, zc_ref,
         seed_ref, scal_ref, zinj_ref) = refs[len(leaves): len(leaves) + 13]
        outs = refs[len(leaves) + 13:]
        costs_ref, crash_ref, num_ref, md_ref = outs[:4]
        idx = 4
        if emit_samples:
            u_out_ref = outs[idx]
            idx += 1
        u_scr, lr_scr = outs[idx], outs[idx + 1]
        if split_cost:
            y_scr = outs[idx + 2]

        vals = [holders[i] if i in holders else _read_leaf(r, nd)
                for i, (r, nd) in enumerate(zip(leaf_refs, leaf_ndims))]
        dynamics, cost = jax.tree_util.tree_unflatten(treedef, vals)
        dt_k = scal_ref[0, 0]
        lam_k = scal_ref[0, 1]
        lr_gain = scal_ref[0, 2]  # 0.5 * lam * (1 - alpha)
        pure_thresh = scal_ref[0, 3]
        idx_off = scal_ref[0, 4].astype(jnp.int32)
        k_local = scal_ref[0, 5].astype(jnp.int32)

        i = pl.program_id(0)
        if not inject:
            pltpu.prng_seed(seed_ref[0, 0] + i)

        lane = (jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0) * LANES
                + jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1))
        local_idx = i * tile_k + lane
        sample_idx = idx_off + local_idx
        # carve-out predicates (setGaussianControls, gaussian.cu:101-121),
        # on GLOBAL sample indices so shard_map keeps single-chip semantics
        pure4 = (sample_idx.astype(jnp.float32) >= pure_thresh)[None, None]
        zero4 = (sample_idx == 0)[None, None]
        valid = local_idx < k_local

        def draw_normals(n_half):
            """2*n_half standard normals per (rows, LANES) lane via one
            fused uniform draw + dual-output Box-Muller."""
            b = pltpu.bitcast(
                pltpu.prng_random_bits((2 * n_half, rows, LANES)),
                jnp.uint32,
            )
            f = pltpu.bitcast(b >> 8, jnp.int32).astype(jnp.float32)
            u1 = (f[:n_half] + 0.5) * INV_2_24
            u2 = f[n_half:] * INV_2_24
            r = jnp.sqrt(-2.0 * jnp.log(u1))
            theta = TWO_PI * u2
            return jnp.concatenate([r * jnp.cos(theta), r * jnp.sin(theta)],
                                   axis=0)

        def gen_chunk(ci, _):
            """Vectorized sample generation for Tc timesteps: eps -> carve
            -outs -> clamp -> scratch write + LR accumulation, all on
            channel-major (C, Tc, rows, LANES) blocks (no per-timestep
            dependency chains; channel-major so the split cost pass can
            hand component slices straight to ``cost.running_cost``)."""
            t0 = ci * Tc
            if inject:
                # test-only injected standard normals (interpret mode): the
                # operand replaces the HW-PRNG draw one-for-one, so the CPU
                # suite can parity-check everything downstream of the draw
                # — carve-outs, clamp, LR, rollout, flash epilogue —
                # against the XLA oracle (the reference's own test-noise
                # injection pattern, rollout_kernel_tests.cu:211-213)
                z = zinj_ref[0, :, pl.ds(t0, Tc)].reshape(
                    C, Tc, rows, LANES)
            else:
                z = draw_normals(half)[: Tc * C].reshape(C, Tc, rows, LANES)
            if noise_kind == "nln":
                # log-MPPI: eps = z1 * exp(ln_sigma * z2) (nln.cu:12-24)
                if inject:
                    z2 = zinj_ref[1, :, pl.ds(t0, Tc)].reshape(
                        C, Tc, rows, LANES)
                else:
                    z2 = draw_normals(half)[: Tc * C].reshape(
                        C, Tc, rows, LANES)
                z = z * jnp.exp(aux_ref[:, pl.ds(t0, Tc)] * z2)
            mean_c = mean_ref[:, pl.ds(t0, Tc)]    # (C, Tc, 1, LANES)
            sigma_c = sigma_ref[:, pl.ds(t0, Tc)]
            noise = sigma_c * z
            mu = jnp.where(pure4, 0.0, jnp.broadcast_to(
                mean_c, (C, Tc, rows, LANES)))
            u = noise + mu
            pin4 = zero4 | (tpin_ref[:, pl.ds(t0, Tc)] > 0.5)
            u = jnp.where(pin4, jnp.broadcast_to(mean_c,
                                                 (C, Tc, rows, LANES)), u)
            # enforceConstraints (dynamics.cuh:250-264)
            lo, hi = lo_ref[...], hi_ref[...]
            db, zc = db_ref[...], zc_ref[...]
            shrunk = u - db * jnp.where(u < 0, -1.0, 1.0)
            u = jnp.where(jnp.abs(u) < db, zc, shrunk)
            u = jnp.clip(u, lo, hi)
            # likelihood-ratio cost on the clamped sample, mu = 0 for the
            # pure-noise tail (gaussian.cu:481-568); lrc = coeff / sigma^2
            lr = jnp.sum(lrc_ref[:, pl.ds(t0, Tc)] * mu * (mu - 2.0 * u),
                         axis=(0, 1))
            u_scr[:, pl.ds(t0, Tc)] = u
            lr_scr[...] = lr_scr[...] + lr
            return 0

        lr_scr[...] = jnp.zeros((rows, LANES), jnp.float32)
        jax.lax.fori_loop(0, n_chunks, gen_chunk, 0)

        # ---- sequential horizon loop ----
        x = jnp.broadcast_to(x0_ref[...].reshape(S, 1, 1), (S, rows, LANES))
        crash0 = jnp.zeros((rows, LANES), jnp.int32)
        acc0 = jnp.zeros((rows, LANES), jnp.float32)
        # zero init (never read before the loop overwrites it): OUTPUT_DIM
        # can exceed STATE_DIM (racer family), so x0 cannot seed it
        y0 = jnp.broadcast_to(
            jnp.zeros((1, 1), jnp.float32),
            (dynamics.OUTPUT_DIM, rows, LANES),
        )
        # recurrent (LSTM) state rides the loop carry as (H, rows, LANES)
        # blocks built by scalar fills, exactly as in _fused_call
        from mppi_generic_tpu.ops.pallas_rollout import _broadcast_rec

        rec0 = _broadcast_rec(dynamics.init_recurrent_state(), rows)

        def dyn_step(x, rec, u, t_f):
            if recurrent:
                return dynamics.step_recurrent(x, rec, u, t_f, dt_k)
            x_next, y = dynamics.step(x, u, t_f, dt_k)
            return x_next, y, rec

        if split_cost:
            # in-kernel split-kernel analog (rolloutDynamicsKernel +
            # time-tiled rolloutCostKernel, mppi_common.cu:148-362): the
            # sequential loop keeps ONLY the dynamics — the truly
            # loop-carried part — writing outputs to VMEM scratch; the cost
            # then evaluates over (Tc, rows, LANES) time blocks in tall VPU
            # ops. Eligibility: t enters only elementwise and crash is
            # either unused (cost.time_parallel_cost) or sticky-prefix
            # (cost.time_parallel_crash — dual-eval + prefix-OR below).
            def body_dyn(t, carry):
                x, rec = carry
                u = u_scr[:, pl.ds(t, 1)].reshape(C, rows, LANES)
                x_next, y, rec = dyn_step(x, rec, u, t.astype(jnp.float32))
                y_scr[:, pl.ds(t, 1)] = y.reshape(out_dim, 1, rows, LANES)
                return (x_next, rec)

            jax.lax.fori_loop(0, T, body_dyn, (x, rec0))
            if Tp != T:
                # the padded tail is never written by the loop; zero it so
                # the masked cost pass sees finite values
                y_scr[:, pl.ds(T, Tp - T)] = jnp.zeros(
                    (out_dim, Tp - T, rows, LANES), jnp.float32
                )

            # sticky-prefix crash (Cost.time_parallel_crash): dual
            # evaluation at crash=0/1 (CSE shares everything else) + an
            # unrolled prefix-OR across the block with a cross-chunk carry
            tp_crash = (bool(cost.time_parallel_crash())
                        and not bool(cost.time_parallel_cost()))

            def cost_chunk(ci, carry):
                acc, crash_c = carry
                t0 = ci * Tc
                yb = y_scr[:, pl.ds(t0, Tc)]   # (O, Tc, rows, LANES)
                ub = u_scr[:, pl.ds(t0, Tc)]   # (C, Tc, rows, LANES)
                tb = (jax.lax.broadcasted_iota(jnp.int32, (Tc, 1, 1), 0)
                      .astype(jnp.float32) + t0.astype(jnp.float32))
                if tp_crash:
                    c0_b, trig = cost.running_cost(yb, ub, tb, jnp.int32(0))
                    c1_b, _ = cost.running_cost(yb, ub, tb, jnp.int32(1))
                    c0_b = jnp.broadcast_to(c0_b, (Tc, rows, LANES))
                    c1_b = jnp.broadcast_to(c1_b, (Tc, rows, LANES))
                    trig = jnp.broadcast_to(trig, (Tc, rows, LANES))
                    if Tp != T:
                        # the zero-padded tail must not trigger crashes
                        trig = jnp.where(tb < float(T), trig, 0)
                    flags = []
                    cur = crash_c
                    for i in range(Tc):  # static unroll: Tc cheap maxes
                        cur = jnp.maximum(cur, trig[i])
                        flags.append(cur)
                    c = jnp.where(jnp.stack(flags) > 0, c1_b, c0_b)
                    crash_c = cur
                else:
                    c, _ = cost.running_cost(yb, ub, tb, jnp.int32(0))
                    c = jnp.broadcast_to(c, (Tc, rows, LANES))
                if Tp != T:
                    c = jnp.where(tb < float(T), c, 0.0)
                return (acc + jnp.sum(c, axis=0), crash_c)

            acc, crash = jax.lax.fori_loop(
                0, n_chunks, cost_chunk, (acc0, crash0)
            )
            y_last = y_scr[:, pl.ds(T - 1, 1)].reshape(out_dim, rows, LANES)
        else:
            def body(t, carry):
                x, rec, crash, acc, _ = carry
                u = u_scr[:, pl.ds(t, 1)].reshape(C, rows, LANES)
                x_next, y, rec = dyn_step(x, rec, u, t.astype(jnp.float32))
                c, crash = cost.running_cost(y, u, t, crash)
                return (x_next, rec, crash, acc + c, y)

            _, _, crash, acc, y_last = jax.lax.fori_loop(
                0, T, body, (x, rec0, crash0, acc0, y0)
            )
        J = (acc + cost.terminal_cost(y_last) + lr_gain * lr_scr[...]) / T
        costs_ref[...] = J[None]
        crash_ref[...] = crash[None]
        if emit_samples:
            u_out_ref[...] = u_scr[...].reshape(C, Tp, tile_k)

        # ---- flash (online-softmax) weight + mean-update epilogue ----
        # s = -J/lam; running max m == -baseline/lam EXACTLY (normExp's
        # baseline subtraction IS the softmax max-shift), so the rescaled
        # carries reproduce eta and the weighted mean bit-for-bit in exact
        # arithmetic (fullGPUcomputeWeights + weightedReductionKernel,
        # mppi_common.cu:902-1053,710-765).
        s = jnp.where(valid, -J / lam_k, _NEG_INF)
        tmax = jnp.max(s)

        def weighted_sum(w):
            """sum_k w_k * U_k over the tile -> (C, Tp, 1, 1); staged
            lane-then-sublane reduction (Mosaic requires the trailing axis
            of a trailing-dims reduction to stay size 1)."""
            lanes = jnp.sum(u_scr[...] * w[None, None], axis=3,
                            keepdims=True)
            return jnp.sum(lanes, axis=2, keepdims=True)

        @pl.when(i == 0)
        def _init():
            w = jnp.exp(s - tmax)
            num_ref[...] = weighted_sum(w)
            md_ref[0, 0] = tmax
            md_ref[0, 1] = jnp.sum(w)

        @pl.when(i > 0)
        def _accum():
            m_old = md_ref[0, 0]
            d_old = md_ref[0, 1]
            m_new = jnp.maximum(m_old, tmax)
            scale = jnp.exp(m_old - m_new)
            w = jnp.exp(s - m_new)
            num_ref[...] = num_ref[...] * scale + weighted_sum(w)
            md_ref[0, 0] = m_new
            md_ref[0, 1] = d_old * scale + jnp.sum(w)

    leaf_shapes, leaf_specs = _prepare_leaves(
        leaves, windowed_idx=frozenset(w[0] for w in windowed))

    in_specs = leaf_specs + [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # x0 (S, 1)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # mean (C, Tp, 1, LANES)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # sigma (C, Tp, 1, LANES)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # aux (C, Tp, 1, LANES)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # lr coeff (C, Tp, 1, LANES)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # t-pin (1, Tp, 1, LANES)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # lo (C, 1, 1, LANES)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # hi (C, 1, 1, LANES)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # deadband (C, 1, 1, LANES)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # zero-ctrl (C, 1, 1, LANES)
        pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1, 1) int32
        pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars (1, 6)
        # injected normals (n_z, C, Tp, tile_k) per tile | (1,1,1,1) dummy
        (pl.BlockSpec((n_z, C, Tp, tile_k), lambda i: (0, 0, 0, i),
                      memory_space=pltpu.VMEM) if inject
         else pl.BlockSpec(memory_space=pltpu.VMEM)),
    ]
    out_specs = [
        pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),  # num (C, Tp, 1, 1)
        pl.BlockSpec(memory_space=pltpu.SMEM),  # [m, d] (1, 2)
    ]
    out_shape = [
        jax.ShapeDtypeStruct((grid, rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((grid, rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((C, Tp, 1, 1), jnp.float32),
        jax.ShapeDtypeStruct((1, 2), jnp.float32),
    ]
    if emit_samples:
        out_specs.append(pl.BlockSpec((C, Tp, tile_k), lambda i: (0, 0, i),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((C, Tp, K_pad), jnp.float32))
    scratch = [
        pltpu.VMEM((C, Tp, rows, LANES), jnp.float32),  # sample scratch
        pltpu.VMEM((rows, LANES), jnp.float32),         # LR accumulator
    ]
    if split_cost:
        scratch.append(
            pltpu.VMEM((out_dim, Tp, rows, LANES), jnp.float32)  # outputs
        )
    scratch += _windowed_scratch(windowed)  # stays LAST (kernel slices tail)
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=60 * K_pad * T * (S + C),
            bytes_accessed=K_pad * 8 + Tp * C * 4,
            transcendentals=4 * K_pad * T * C,
        ),
    )(*leaf_shapes, x0.reshape(S, 1), mean_b, sigma_b, aux_b, lrc_b, tpin_b,
      lo_b, hi_b, db_b, zc_b, seed.reshape(1, 1), scal, zinj)
    costs3d, crash3d, num, md = outs[:4]
    costs = costs3d.reshape(-1)[:K]
    crash = crash3d.reshape(-1)[:K]
    U = (jnp.transpose(outs[4], (2, 1, 0))[:K, :T] if emit_samples else None)
    return (costs, crash, jnp.transpose(num[:, :T, 0, 0], (1, 0)),
            md[0, 0], md[0, 1], U)


def flash_combine(m, d, num, axis):
    """Cross-chip merge of per-shard online-softmax carries: one pmax + two
    psums — 8 B of scalars + one (T, C) row per solve over ICI.

    Per-shard carries follow the flash-attention rescaling convention the
    kernel accumulates with: ``m = max_k s_k`` (``s_k = -J_k / lambda``),
    ``d = sum_k exp(s_k - m)``, ``num = sum_k exp(s_k - m) * U_k``. The
    merged ``(m_g, d_g, num_g)`` satisfy ``num_g / d_g == softmax-weighted
    mean over ALL shards'' samples`` exactly (not approximately) — tested
    against a NumPy oracle on the CPU mesh in
    tests/test_sharding.py::test_flash_combine_matches_global_softmax,
    since the kernel that produces the carries is TPU-only."""
    m_g = jax.lax.pmax(m, axis)
    sc = jnp.exp(m - m_g)
    d_g = jax.lax.psum(d * sc, axis)
    num_g = jax.lax.psum(num * sc, axis)
    return m_g, d_g, num_g


def fused_solve_iteration(
    dynamics: Dynamics,
    cost: Cost,
    sampler,
    x0: jnp.ndarray,
    mean: jnp.ndarray,
    seed: jnp.ndarray,
    dt,
    lam,
    alpha,
    num_rollouts: int,
    iteration: int = 0,
    optimization_stride=0,
    tile_k: int | None = None,
    sharding=None,
    return_samples: bool = False,
    chunk_t: int | None = None,
    split_cost: bool | None = None,
    injected_noise=None,
):
    """One fully-fused MPPI optimization iteration. Returns
    ``(costs (K,), crash (K,), new_mean (T, C), baseline (), eta (),
    U (K, T, C) | None)`` where ``costs`` includes the likelihood-ratio
    term (combined-kernel semantics), ``baseline = min costs``,
    ``eta = sum exp(-(J - baseline)/lam)`` and ``new_mean`` is the
    normExp-weighted sample average — everything the XLA epilogue used to
    compute, produced by the kernel itself.

    Eligibility: Gaussian or NLN sampler (their noise generates in-kernel),
    normExp weights (the online-softmax trick is exact only for exp),
    TPU backend. Raises :class:`PallasIncompatible` otherwise. Recurrent
    (small-LSTM) dynamics are hosted in-kernel: their (H,) hidden/cell
    leaves ride the horizon-loop carry as (H, rows, LANES) blocks (round 4
    — admits the racer LSTM family to the fully-fused path).

    ``split_cost``: in-kernel analog of the reference's split-kernel choice
    (rolloutDynamicsKernel + time-tiled rolloutCostKernel,
    mppi_common.cu:148-362) — the sequential horizon loop runs dynamics
    only (the loop-carried minimum), outputs stream to VMEM scratch, and
    the cost evaluates in tall time-vectorized VPU ops. Identical samples
    and (up to summation order) identical costs to the combined form.
    ``None`` auto-enables it when the cost is eligible
    (``time_parallel_cost()`` — crash unused — or ``time_parallel_crash()``
    — sticky-prefix crash, handled exactly by a dual-evaluation +
    prefix-OR pass), the op-weight model predicts a win, and the extra
    (O, Tp, tile_k) output scratch fits the VMEM budget; ``True`` forces
    it (raising if the cost is ineligible); ``False`` disables.

    ``injected_noise``: TEST-ONLY — pre-drawn standard normals replacing
    the in-kernel HW-PRNG draw one-for-one: (K, T, C) for Gaussian, or
    (2, K, T, C) for NLN (z1, z2 with eps = z1 * exp(ln_sigma * z2)). The
    kernel then runs in Pallas interpret mode on ANY backend, so the CPU
    suite can parity-check everything downstream of the draw (carve-outs,
    clamp, LR, rollout, flash epilogue) against the XLA oracle — the
    reference's own injected-noise test pattern
    (rollout_kernel_tests.cu:211-213). Works under ``sharding`` too (each
    shard consumes its K/n slice). Never set on the production path.
    """
    from mppi_generic_tpu.sampling.gaussian import GaussianDistribution
    from mppi_generic_tpu.sampling.nln import NLNDistribution

    if type(sampler) is NLNDistribution:
        noise_kind = "nln"
    elif type(sampler) is GaussianDistribution:
        noise_kind = "gaussian"
    else:
        raise PallasIncompatible(
            f"fused solve iteration requires a Gaussian or NLN "
            f"distribution, got {type(sampler).__name__}"
        )
    inject = injected_noise is not None
    if not inject and jax.default_backend() != "tpu":
        raise PallasIncompatible(
            "fused solve iteration uses the TPU hardware PRNG "
            "(pltpu.prng_*), which has no CPU/interpret lowering — "
            "pass injected_noise to algorithm-test it off-TPU"
        )
    T, C = mean.shape
    S = dynamics.STATE_DIM
    K = num_rollouts
    from mppi_generic_tpu.ops.pallas_rollout import _windowed_spec

    leaves, treedef = jax.tree_util.tree_flatten((dynamics, cost))
    windowed = _windowed_spec((dynamics, cost), leaves)
    leaves = [jnp.asarray(l) for l in leaves]
    recurrent = dynamics.init_recurrent_state() is not None
    _check_compatible(dynamics, leaves, allow_recurrent=True,
                      skip=frozenset(w[0] for w in windowed))

    tile_was_default = tile_k is None
    if tile_k is None:
        tile_k = default_tile_k(K, T, C)
    if tile_k % LANES:
        raise ValueError(f"tile_k must be a multiple of {LANES}")

    Tc = min(8 if chunk_t is None else chunk_t, T)
    Tp = _round_up(T, Tc)
    n_chunks = Tp // Tc

    sigma = jnp.broadcast_to(
        jnp.asarray(sampler._sigma(T, iteration), jnp.float32).reshape(-1, C),
        (T, C),
    )
    if noise_kind == "nln":
        aux = jnp.broadcast_to(
            jnp.asarray(sampler.std_dev, jnp.float32).reshape(-1, C), (T, C)
        )
    else:
        aux = jnp.zeros((T, C), jnp.float32)
    coeff = jnp.asarray(sampler.control_cost_coeff, jnp.float32)
    lrc = coeff[None, :] / (sigma * sigma)
    mean_f = jnp.asarray(mean, jnp.float32)
    stride = jnp.asarray(optimization_stride, jnp.int32)
    tpin = (jnp.arange(T, dtype=jnp.int32) < stride).astype(jnp.float32)

    def pad_t(tab, fill=0.0):
        if Tp == T:
            return tab
        return jnp.pad(tab, ((0, Tp - T),) + ((0, 0),) * (tab.ndim - 1),
                       constant_values=fill)

    # channel-major (C, Tp, 1, LANES) tables: the kernel's sample scratch is
    # channel-major so the split cost pass can index components on axis 0
    mean_b = _lane_rep(pad_t(mean_f).T)
    sigma_b = _lane_rep(pad_t(sigma, fill=1.0).T)
    aux_b = _lane_rep(pad_t(aux).T)
    lrc_b = _lane_rep(pad_t(lrc).T)
    tpin_b = _lane_rep(pad_t(tpin))[None]  # (1, Tp, 1, LANES)

    from mppi_generic_tpu.ops.pallas_rollout import _constraint_rows

    cons = _constraint_rows(dynamics)  # (4, C)
    lo_b, hi_b, db_b, zc_b = (
        _lane_rep(cons[r][:, None]) for r in range(4)  # (C, 1, 1, LANES)
    )

    pure_threshold = (1.0 - sampler.pure_noise_percentage) * K
    lr_gain = 0.5 * jnp.asarray(lam, jnp.float32) * (
        1.0 - jnp.asarray(alpha, jnp.float32)
    )
    dyn_name, cost_name = type(dynamics).__name__, type(cost).__name__

    n_z = 2 if noise_kind == "nln" else 1
    if inject:
        zi = jnp.asarray(injected_noise, jnp.float32)
        if zi.ndim == 3:
            zi = zi[None]
        if zi.shape != (n_z, K, T, C):
            raise ValueError(
                f"injected_noise must be ({n_z}, K, T, C) = "
                f"({n_z}, {K}, {T}, {C}), got {zi.shape}"
            )
    else:
        zi = jnp.zeros((1, 1, 1, 1), jnp.float32)

    def _prep_zinj(zi_l, K_loc, K_pad_loc):
        """(n_z, K_loc, T, C) -> the kernel's (n_z, C, Tp, K_pad_loc)."""
        z = jnp.transpose(zi_l, (0, 3, 2, 1))
        return jnp.pad(z, ((0, 0), (0, 0), (0, Tp - T),
                           (0, K_pad_loc - K_loc)))

    out_dim = int(dynamics.OUTPUT_DIM)
    # working set: the (C, Tp, tile) in-kernel sample scratch + the
    # (O, Tp, tile) output scratch, plus the double-buffered sample-
    # emission output block when samples are returned; no grid cap — the
    # combined solve kernel pays the same per-grid latency floor here
    # (measured: split wins at K=32768/16 grids on this path). Both
    # fit/overflow boundaries verified on the bench chip
    # (scripts/split_cost_probe.py).
    from mppi_generic_tpu.ops.pallas_rollout import _arbitrate_split

    split_cost, tile_k = _arbitrate_split(
        dynamics, cost, split_cost, Tp, tile_k, tile_was_default,
        ws_rows=(C + out_dim) + (2 * C if return_samples else 0),
        shrink_rows=C + out_dim,
    )

    # resident-VMEM fit: lane-replicated tables (mean/sigma/aux/lrc = C
    # rows each + the 1-row t-pin) + the (C, Tp, rows, LANES) sample
    # scratch + split/emission blocks. Long horizons that cannot fit
    # raise here (a trace-time Mosaic VMEM overflow is NOT a
    # PallasIncompatible) and fall back to the streamed sampling kernel.
    vmem = (4 * C + 1) * Tp * LANES * 4
    vmem += C * Tp * tile_k * 4
    if split_cost:
        vmem += out_dim * Tp * tile_k * 4
    if return_samples:
        vmem += 2 * C * Tp * tile_k * 4
    if vmem > _SOLVE_VMEM_BUDGET:
        raise PallasIncompatible(
            f"fused solve iteration working set {vmem} B exceeds the "
            f"{_SOLVE_VMEM_BUDGET} B VMEM budget at T={T}, "
            f"tile_k={tile_k} — use fused_sample_rollout_costs (streamed "
            "tables) or the XLA paths"
        )

    mesh, axis, n_shards = _mesh_axis(sharding)
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        if K % n_shards:
            raise PallasIncompatible(
                f"K={K} not divisible by mesh axis '{axis}'={n_shards}"
            )
        K_local = K // n_shards
        tile_local = min(tile_k, _round_up(K_local, LANES))
        K_pad_local = _round_up(K_local, tile_local)
        grid_local = K_pad_local // tile_local

        def body(x0_v, mb, sb, ab, lb, tb, lov, hiv, dbv, zcv,
                 seed_v, lamv, lrg, pt, dt_v, zi_l, *leaf_vals):
            ax = jax.lax.axis_index(axis)
            scal = jnp.stack([
                dt_v, lamv, lrg, pt,
                (ax * K_local).astype(jnp.float32),
                jnp.float32(K_local),
            ]).reshape(1, 6)
            costs, crash, num, m, d, U = _fused_solve_call(
                list(leaf_vals), treedef, dyn_name, cost_name,
                x0_v, mb, sb, ab, lb, tb, lov, hiv, dbv, zcv,
                seed_v + ax * grid_local, scal,
                T, Tp, Tc, C, S, K_local, K_pad_local, tile_local,
                noise_kind=noise_kind, emit_samples=return_samples,
                split_cost=split_cost, out_dim=out_dim,
                recurrent=recurrent, inject=inject, interpret=inject,
                zinj=(_prep_zinj(zi_l, K_local, K_pad_local)
                      if inject else zi_l),
                windowed=windowed,
            )
            m_g, d_g, num_g = flash_combine(m, d, num, axis)
            outs = (costs, crash, num_g / d_g, -lamv * m_g, d_g)
            return outs + ((U,) if return_samples else ())

        out_specs = (P(axis), P(axis), P(), P(), P())
        if return_samples:
            out_specs = out_specs + (P(axis),)
        res = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=_replicated(15)
            + ((P(None, axis),) if inject else _replicated(1))
            + _replicated(len(leaves)),
            out_specs=out_specs,
            check_vma=False,
        )(x0, mean_b, sigma_b, aux_b, lrc_b, tpin_b, lo_b, hi_b, db_b, zc_b,
          jnp.asarray(seed, jnp.int32), jnp.asarray(lam, jnp.float32),
          lr_gain, jnp.asarray(pure_threshold, jnp.float32),
          jnp.asarray(dt, jnp.float32), zi, *leaves)
        costs, crash, new_mean, baseline, eta = res[:5]
        U = res[5] if return_samples else None
        return costs, crash, new_mean, baseline, eta, U

    K_pad = _round_up(K, tile_k)
    scal = jnp.stack([
        jnp.asarray(dt, jnp.float32),
        jnp.asarray(lam, jnp.float32),
        lr_gain,
        jnp.asarray(pure_threshold, jnp.float32),
        jnp.float32(0.0),
        jnp.float32(K),
    ]).reshape(1, 6)
    costs, crash, num, m, d, U = _fused_solve_call(
        leaves, treedef, dyn_name, cost_name,
        x0, mean_b, sigma_b, aux_b, lrc_b, tpin_b, lo_b, hi_b, db_b, zc_b,
        jnp.asarray(seed, jnp.int32), scal,
        T, Tp, Tc, C, S, K, K_pad, tile_k,
        noise_kind=noise_kind, emit_samples=return_samples,
        split_cost=split_cost, out_dim=out_dim, recurrent=recurrent,
        inject=inject, interpret=inject,
        zinj=_prep_zinj(zi, K, K_pad) if inject else zi,
        windowed=windowed,
    )
    lam_f = jnp.asarray(lam, jnp.float32)
    return costs, crash, num / d, -lam_f * m, d, U
