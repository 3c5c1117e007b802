"""Mosaic capability probe, part 2: narrow down the DMA-window and
lane-gather envelopes after probe 1 (take_along_axis lane-axis OK,
sublane-axis WRONG VALUES, 2D dynamic-window DMA = compiler crash).

Usage (TPU): timeout 570 python scripts/mosaic_capability_probe2.py
"""

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
                print(f"{name}: OK", flush=True)
                return True
            except Exception as e:
                msg = str(e).split("\n")[0][:160]
                print(f"{name}: FAIL ({type(e).__name__}: {msg})",
                      flush=True)
                return False
        return run
    return deco


def _dma_case(H, W, WIN_H, WIN_W, y0v, x0v, align=False):
    def kernel(d_hbm, y0_ref, x0_ref, out_ref, scr, sem):
        y0 = y0_ref[0]
        x0 = x0_ref[0]
        if align:
            y0 = pl.multiple_of(y0, 8)
            x0 = pl.multiple_of(x0, 128)
        src = (d_hbm.at[pl.ds(y0, WIN_H)] if WIN_W == W
               else d_hbm.at[pl.ds(y0, WIN_H), pl.ds(x0, WIN_W)])
        dma = pltpu.make_async_copy(src, scr, sem)
        dma.start()
        dma.wait()
        out_ref[...] = scr[...]

    d = jnp.arange(H * W, dtype=jnp.float32).reshape(H, W)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((WIN_H, WIN_W), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((WIN_H, WIN_W), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(d, jnp.array([y0v], jnp.int32), jnp.array([x0v], jnp.int32))
    ref = np.asarray(d)[y0v:y0v + WIN_H, x0v:x0v + WIN_W]
    np.testing.assert_allclose(np.asarray(out), ref)


@probe("dma_rowband_dynamic_y")
def p_rowband():
    _dma_case(1024, 1024, 256, 1024, 264, 0)


@probe("dma_rowband_unaligned_y")
def p_rowband_unal():
    _dma_case(1024, 1024, 256, 1024, 37, 0)


@probe("dma_2d_aligned_hint")
def p_2d_aligned():
    _dma_case(1024, 1024, 256, 256, 256, 384, align=True)


@probe("dma_2d_static_x")
def p_2d_static_x():
    H = W = 1024
    WIN = 256

    def kernel(d_hbm, y0_ref, out_ref, scr, sem):
        dma = pltpu.make_async_copy(
            d_hbm.at[pl.ds(y0_ref[0], WIN), pl.ds(128, WIN)], scr, sem
        )
        dma.start()
        dma.wait()
        out_ref[...] = scr[...]

    d = jnp.arange(H * W, dtype=jnp.float32).reshape(H, W)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((WIN, WIN), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((WIN, WIN), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(d, jnp.array([264], jnp.int32))
    ref = np.asarray(d)[264:264 + WIN, 128:128 + WIN]
    np.testing.assert_allclose(np.asarray(out), ref)


@probe("dma_3d_band_from_chw")
def p_3d_band():
    """Row-band from a (CH, H, W) multichannel map: one channel, dynamic
    y-band."""
    CH, H, W = 4, 512, 512
    WIN = 128

    def kernel(d_hbm, y0_ref, out_ref, scr, sem):
        dma = pltpu.make_async_copy(
            d_hbm.at[1, pl.ds(y0_ref[0], WIN)], scr, sem
        )
        dma.start()
        dma.wait()
        out_ref[...] = scr[...]

    d = jnp.arange(CH * H * W, dtype=jnp.float32).reshape(CH, H, W)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((WIN, W), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((WIN, W), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(d, jnp.array([67], jnp.int32))
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(d)[1, 67:67 + WIN])


def _lane_gather_case(S, W, name):
    @probe(name)
    def p():
        def kernel(d_ref, idx_ref, out_ref):
            out_ref[...] = jnp.take_along_axis(
                d_ref[...], idx_ref[...], axis=1
            )

        d = jnp.arange(S * W, dtype=jnp.float32).reshape(S, W)
        idx = (jnp.arange(S, dtype=jnp.int32)[:, None] * 131
               + jnp.arange(128, dtype=jnp.int32)[None, :] * 7) % W
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(d, idx)
        ref = np.take_along_axis(np.asarray(d), np.asarray(idx), axis=1)
        np.testing.assert_allclose(np.asarray(out), ref)
    return p


@probe("dyn_lane_slice_vmem")
def p_dyn_lane_slice():
    W = 1024

    def kernel(d_ref, s_ref, out_ref):
        out_ref[...] = d_ref[:, pl.ds(s_ref[0], 128)]

    d = jnp.arange(8 * W, dtype=jnp.float32).reshape(8, W)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(d, jnp.array([300], jnp.int32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(d)[:, 300:428])


if __name__ == "__main__":
    assert jax.default_backend() == "tpu", "run on a TPU backend"
    checks = [
        p_rowband, p_rowband_unal, p_2d_aligned, p_2d_static_x, p_3d_band,
        _lane_gather_case(8, 256, "lane_gather_8x256"),
        _lane_gather_case(8, 1024, "lane_gather_8x1024"),
        _lane_gather_case(128, 512, "lane_gather_128x512"),
        p_dyn_lane_slice,
    ]
    for fn in checks:
        fn()
    print("DONE")
