"""Map-side crossover sweep (round-5 VERDICT task 1a): ns/point of every
bilinear-query formulation vs map side, measured on the bench chip.

The round-4 in-kernel tent-mask costs 2*H*W FLOPs per query point (one
(H,W)@(W,128) f32-HIGHEST matmul per 128 points), so its per-point cost
grows with map AREA: ~1 ns at 128^2, ~16 ns predicted at 512^2 — where the
XLA gather it replaced costs a flat 5-20 ns. This sweep records the actual
crossover and the windowed variant's cost (tent-mask inside a DMA'd
(WIN, WIN) VMEM window of an HBM-resident map: work scales with WINDOW
area, constant in map size), which is the round-5 large-map design.

Formulations, all computing the identical CUDA linear-filter bilinear:

* ``gather``    — XLA 4-tap dynamic gather (serialized on TPU)
* ``onehot``    — XLA separable one-hot MXU matmuls (_query_tex_matmul)
* ``tent``      — in-kernel tent-mask, whole map VMEM-resident (the
                  round-4 path, cap lifted for measurement)
* ``win256``    — in-kernel tent-mask inside a 256^2 window DMA'd from
                  HBM once per kernel launch (pl.multiple_of-aligned
                  dynamic starts; see scripts/mosaic_capability_probe*.py)

Timing: two-length scan slope (bench.device_per_solve) with a data
dependency between iterations, so the relay's fixed ~27 ms dispatch cost
drops out. Query points are clustered in a ~100-texel neighborhood (the
realistic rollout footprint, and what the window must cover).

Usage (TPU):  timeout 3000 python scripts/map_size_sweep.py
"""

import functools
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import bench
from mppi_generic_tpu.maps.texture import MapTexture2D

ROWS = 512          # query rows of 128 lanes per call -> 65536 points
CHUNK_ROWS = 8      # pallas grid block (one sublane tile)
N_POINTS = ROWS * 128


class _GatherTex(MapTexture2D):
    """Force query_tex down the 4-tap XLA gather branch."""
    _MATMUL_GATHER_MAX_SIDE = 0


def _coords(side, rng):
    """Clustered normalized query coords, (ROWS, 128) each."""
    cx, cy = 0.61 * side, 0.37 * side
    px = cx + 50.0 * rng.standard_normal((ROWS, 128)).clip(-1, 1)
    py = cy + 50.0 * rng.standard_normal((ROWS, 128)).clip(-1, 1)
    u = ((px + 0.5) / side).astype(np.float32)
    v = ((py + 0.5) / side).astype(np.float32)
    return jnp.asarray(u), jnp.asarray(v)


def _tent_rows(data, u, v, W, H):
    """The tent-mask bilinear over already-local coords; data (H, W) array,
    u/v (rows, 128) map-frame texel positions (NOT normalized)."""
    iw = jax.lax.broadcasted_iota(jnp.int32, (W, 128), 0).astype(jnp.float32)
    ih = jax.lax.broadcasted_iota(jnp.int32, (H, 128), 0).astype(jnp.float32)
    outs = []
    for r in range(u.shape[0]):
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(iw - u[r: r + 1]))
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(ih - v[r: r + 1]))
        tmp = jax.lax.dot_general(
            data, wx, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        outs.append(jnp.sum(tmp * wy, axis=0, keepdims=True))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


def make_tent_query(side):
    """Whole-map-VMEM-resident tent-mask, grid over row chunks."""
    def kernel(d_ref, u_ref, v_ref, o_ref):
        d = d_ref[...]
        x = jnp.clip(u_ref[...] * side - 0.5, 0.0, side - 1.0)
        y = jnp.clip(v_ref[...] * side - 0.5, 0.0, side - 1.0)
        o_ref[...] = _tent_rows(d, x, y, side, side)

    def query(data, u, v):
        return pl.pallas_call(
            kernel,
            grid=(ROWS // CHUNK_ROWS,),
            in_specs=[
                pl.BlockSpec((side, side), lambda i: (0, 0)),
                pl.BlockSpec((CHUNK_ROWS, 128), lambda i: (i, 0)),
                pl.BlockSpec((CHUNK_ROWS, 128), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((CHUNK_ROWS, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.float32),
        )(data, u, v)

    return query


def make_window_query(side, win):
    """HBM-resident map; one aligned (win, win) window DMA at grid step 0
    (scratch persists across the sequential TPU grid); tent-mask inside the
    window. Window origin passed as SMEM scalars (in the integrated kernel
    it is computed from the initial state's map position)."""
    def kernel(org_ref, d_hbm, u_ref, v_ref, o_ref, winbuf, sem):
        y0 = pl.multiple_of(org_ref[0], 8)
        x0 = pl.multiple_of(org_ref[1], 128)

        @pl.when(pl.program_id(0) == 0)
        def _fetch():
            dma = pltpu.make_async_copy(
                d_hbm.at[pl.ds(y0, win), pl.ds(x0, win)], winbuf, sem
            )
            dma.start()
            dma.wait()

        x = jnp.clip(u_ref[...] * side - 0.5, 0.0, side - 1.0)
        y = jnp.clip(v_ref[...] * side - 0.5, 0.0, side - 1.0)
        xl = jnp.clip(x - x0.astype(jnp.float32), 0.0, win - 1.0)
        yl = jnp.clip(y - y0.astype(jnp.float32), 0.0, win - 1.0)
        o_ref[...] = _tent_rows(winbuf[...], xl, yl, win, win)

    def query(data, u, v):
        # origin from the cluster min, aligned down (cheap XLA scalars; the
        # fused kernel computes the same from x0)
        x = jnp.clip(u * side - 0.5, 0.0, side - 1.0)
        y = jnp.clip(v * side - 0.5, 0.0, side - 1.0)
        y0 = jnp.minimum(
            jnp.maximum(jnp.min(y).astype(jnp.int32) - 1, 0) // 8 * 8,
            side - win)
        x0 = jnp.minimum(
            jnp.maximum(jnp.min(x).astype(jnp.int32) - 1, 0) // 128 * 128,
            side - win)
        org = jnp.stack([y0, x0])
        return pl.pallas_call(
            kernel,
            grid=(ROWS // CHUNK_ROWS,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((CHUNK_ROWS, 128), lambda i: (i, 0)),
                pl.BlockSpec((CHUNK_ROWS, 128), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((CHUNK_ROWS, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((win, win), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        )(org, data, u, v)

    return query


def time_query(query_fn, data, u, v):
    """Scan-slope ns/point with an iteration-to-iteration data dependency
    (the output perturbs the next coords) so XLA cannot CSE the loop."""
    def body(carry, _):
        uu, vv = carry
        out = query_fn(data, uu, vv)
        eps = out * jnp.float32(1e-12)
        return (uu + eps, vv - eps), out[0, 0]

    def make_loop(S):
        return jax.jit(
            lambda uu, vv: jax.lax.scan(body, (uu, vv), None, length=S))

    dev, _fixed = bench.device_per_solve(make_loop, (u, v), S1=8, S2=32,
                                         n_timed=3)
    return dev / N_POINTS * 1e9


def main():
    rng = np.random.default_rng(0)
    for side in (128, 256, 512, 1024, 2048):
        data = jnp.asarray(
            np.abs(rng.standard_normal((side, side))).astype(np.float32))
        tex = MapTexture2D.create(data, resolution=1.0)
        gtex = _GatherTex.create(data, resolution=1.0)
        u, v = _coords(side, rng)
        row = {"side": side}

        # oracle values once per side, shared by all parity checks
        ref = np.asarray(gtex.query_tex(u, v))

        forms = {
            "gather": lambda d, uu, vv: gtex.query_tex(uu, vv),
            "onehot": lambda d, uu, vv: tex._query_tex_matmul(uu, vv),
            "tent": make_tent_query(side),
        }
        for win in (256, 512):
            if win < side:
                forms[f"win{win}"] = make_window_query(side, win)
        for name, fn in forms.items():
            try:
                got = np.asarray(jax.jit(fn)(data, u, v))
                err = float(np.abs(got - ref).max())
                if err > 1e-4:
                    row[name + "_error"] = f"parity {err:.2e}"
                    continue
                row[name + "_ns_per_point"] = round(
                    time_query(fn, data, u, v), 3)
            except Exception as e:
                row[name + "_error"] = f"{type(e).__name__}: {e}"[:160]
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    assert jax.default_backend() == "tpu", "run on a TPU backend"
    main()
