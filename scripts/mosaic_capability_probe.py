"""One-shot Mosaic capability probe for the large-map in-kernel design
(round 5): which primitives does this JAX/Mosaic version lower on this
chip?

1. take_along_axis along SUBLANES with per-(sublane, lane) indices —
   would make bilinear queries O(1)/point at any map size (two row
   gathers instead of the tent-mask's 2*H*W FLOPs/point matmul).
2. Dynamic-offset HBM->VMEM DMA (make_async_copy from a pl.ANY ref with
   traced pl.ds starts) — the coordinate-window fetch for HBM-resident
   maps.
3. pl.run_scoped returning the inner function's value — lets the map
   query allocate its window scratch locally, deep inside a traced cost.
4. dynamic_slice on a VMEM array with a traced scalar start (sublane dim).

Usage (TPU): timeout 570 python scripts/mosaic_capability_probe.py
"""

import functools
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


def probe(name):
    def deco(fn):
        def run():
            try:
                fn()
                print(f"{name}: OK")
                return True
            except Exception as e:
                msg = str(e).split("\n")[0][:160]
                print(f"{name}: FAIL ({type(e).__name__}: {msg})")
                return False
        return run
    return deco


@probe("take_along_axis_sublane")
def p_taa():
    H = 64

    def kernel(d_ref, idx_ref, out_ref):
        out_ref[...] = jnp.take_along_axis(d_ref[...], idx_ref[...], axis=0)

    d = jnp.arange(H * 128, dtype=jnp.float32).reshape(H, 128)
    idx = jnp.tile(jnp.arange(8, dtype=jnp.int32)[:, None] * 7 % H, (1, 128))
    idx = (idx + jnp.arange(128, dtype=jnp.int32)[None, :]) % H
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(d, idx)
    ref = np.take_along_axis(np.asarray(d), np.asarray(idx), axis=0)
    np.testing.assert_allclose(np.asarray(out), ref)


@probe("take_along_axis_sublane_big_H")
def p_taa_big():
    H = 1024

    def kernel(d_ref, idx_ref, out_ref):
        out_ref[...] = jnp.take_along_axis(d_ref[...], idx_ref[...], axis=0)

    d = jnp.arange(H * 128, dtype=jnp.float32).reshape(H, 128)
    idx = jnp.tile(
        (jnp.arange(8, dtype=jnp.int32)[:, None] * 131) % H, (1, 128)
    )
    idx = (idx + 17 * jnp.arange(128, dtype=jnp.int32)[None, :]) % H
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(d, idx)
    ref = np.take_along_axis(np.asarray(d), np.asarray(idx), axis=0)
    np.testing.assert_allclose(np.asarray(out), ref)


@probe("take_along_axis_lane")
def p_taa_lane():
    def kernel(d_ref, idx_ref, out_ref):
        out_ref[...] = jnp.take_along_axis(d_ref[...], idx_ref[...], axis=1)

    d = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    idx = (jnp.arange(8, dtype=jnp.int32)[:, None] * 31
           + jnp.arange(128, dtype=jnp.int32)[None, :] * 3) % 128
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(d, idx)
    ref = np.take_along_axis(np.asarray(d), np.asarray(idx), axis=1)
    np.testing.assert_allclose(np.asarray(out), ref)


@probe("dynamic_window_dma_hbm")
def p_window_dma():
    H = W = 1024
    WIN = 256

    def kernel(d_hbm, y0_ref, x0_ref, out_ref, scr, sem):
        y0 = y0_ref[0]
        x0 = x0_ref[0]
        dma = pltpu.make_async_copy(
            d_hbm.at[pl.ds(y0, WIN), pl.ds(x0, WIN)], scr, sem
        )
        dma.start()
        dma.wait()
        out_ref[...] = scr[...] * 2.0

    d = jnp.arange(H * W, dtype=jnp.float32).reshape(H, W)
    y0 = jnp.array([264], jnp.int32)
    x0 = jnp.array([384], jnp.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((WIN, WIN), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((WIN, WIN), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(d, y0, x0)
    ref = np.asarray(d)[264:264 + WIN, 384:384 + WIN] * 2.0
    np.testing.assert_allclose(np.asarray(out), ref)


@probe("dynamic_window_dma_unaligned")
def p_window_dma_unaligned():
    H = W = 512
    WIN = 128

    def kernel(d_hbm, y0_ref, x0_ref, out_ref, scr, sem):
        dma = pltpu.make_async_copy(
            d_hbm.at[pl.ds(y0_ref[0], WIN), pl.ds(x0_ref[0], WIN)], scr, sem
        )
        dma.start()
        dma.wait()
        out_ref[...] = scr[...]

    d = jnp.arange(H * W, dtype=jnp.float32).reshape(H, W)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((WIN, WIN), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((WIN, WIN), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(d, jnp.array([37], jnp.int32), jnp.array([219], jnp.int32))
    ref = np.asarray(d)[37:37 + WIN, 219:219 + WIN]
    np.testing.assert_allclose(np.asarray(out), ref)


@probe("run_scoped_returns_value")
def p_run_scoped():
    def kernel(x_ref, out_ref):
        def inner(scr):
            scr[...] = x_ref[...] + 1.0
            return scr[...] * 2.0

        out_ref[...] = pl.run_scoped(
            inner, scr=pltpu.VMEM((8, 128), jnp.float32)
        )

    x = jnp.ones((8, 128), jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    np.testing.assert_allclose(np.asarray(out), 4.0 * np.ones((8, 128)))


@probe("dyn_slice_vmem_sublane")
def p_dyn_slice():
    H = 256

    def kernel(d_ref, s_ref, out_ref):
        out_ref[...] = d_ref[pl.ds(s_ref[0], 8), :]

    d = jnp.arange(H * 128, dtype=jnp.float32).reshape(H, 128)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(d, jnp.array([93], jnp.int32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(d)[93:101])


if __name__ == "__main__":
    assert jax.default_backend() == "tpu", "run on a TPU backend"
    results = {}
    for fn in (p_taa, p_taa_big, p_taa_lane, p_window_dma,
               p_window_dma_unaligned, p_run_scoped, p_dyn_slice):
        results[fn.__name__] = fn()
    print("SUMMARY:", results)
