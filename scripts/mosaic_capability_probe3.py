"""Mosaic capability probe, part 3: the exact composition the windowed
map query needs — window origin computed IN-KERNEL from a coordinate
reduction (vector -> scalar -> aligned pl.ds DMA start), run_scoped
around the DMA, and the hinted multichannel (CH, H, W) band.

Usage (TPU): timeout 570 python scripts/mosaic_capability_probe3.py
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
                msg = str(e).split("\n")[0][:200]
                print(f"{name}: FAIL ({type(e).__name__}: {msg})",
                      flush=True)
                return False
        return run
    return deco


@probe("computed_window_bilinear")
def p_computed_window():
    """The full windowed tent-mask: coords in VMEM -> min-reduce ->
    aligned window origin -> DMA -> in-window tent bilinear; parity vs
    the NumPy 4-tap gather."""
    H = W = 1024
    WIN = 384

    def kernel(d_hbm, u_ref, v_ref, out_ref):
        u = u_ref[...]
        v = v_ref[...]
        x = jnp.clip(u * W - 0.5, 0.0, W - 1.0)
        y = jnp.clip(v * H - 0.5, 0.0, H - 1.0)
        y0 = jnp.minimum(
            jnp.maximum(jnp.min(y).astype(jnp.int32) - 1, 0) // 8 * 8,
            H - WIN,
        )
        x0 = jnp.minimum(
            jnp.maximum(jnp.min(x).astype(jnp.int32) - 1, 0) // 128 * 128,
            W - WIN,
        )
        y0 = pl.multiple_of(y0, 8)
        x0 = pl.multiple_of(x0, 128)

        def inner(win, sem):
            dma = pltpu.make_async_copy(
                d_hbm.at[pl.ds(y0, WIN), pl.ds(x0, WIN)], win, sem
            )
            dma.start()
            dma.wait()
            xl = jnp.clip(x - x0.astype(jnp.float32), 0.0, WIN - 1.0)
            yl = jnp.clip(y - y0.astype(jnp.float32), 0.0, WIN - 1.0)
            iw = jax.lax.broadcasted_iota(
                jnp.int32, (WIN, 128), 0).astype(jnp.float32)
            outs = []
            for r in range(xl.shape[0]):
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(iw - xl[r: r + 1]))
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(iw - yl[r: r + 1]))
                tmp = jax.lax.dot_general(
                    win[...], wx,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                outs.append(jnp.sum(tmp * wy, axis=0, keepdims=True))
            out_ref[...] = (outs[0] if len(outs) == 1
                            else jnp.concatenate(outs, axis=0))

        pl.run_scoped(
            inner,
            win=pltpu.VMEM((WIN, WIN), jnp.float32),
            sem=pltpu.SemaphoreType.DMA(()),
        )

    rng = np.random.RandomState(0)
    d = jnp.asarray(rng.randn(H, W), jnp.float32)
    # coords clustered in a ~150-texel neighborhood away from the origin
    cx, cy = 700.0, 333.0
    px = cx + 75.0 * rng.randn(4, 128).clip(-1, 1)
    py = cy + 75.0 * rng.randn(4, 128).clip(-1, 1)
    u = jnp.asarray((px + 0.5) / W, jnp.float32)
    v = jnp.asarray((py + 0.5) / H, jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(d, u, v)
    # NumPy 4-tap oracle
    dn = np.asarray(d)
    x = np.clip(np.asarray(u) * W - 0.5, 0, W - 1)
    y = np.clip(np.asarray(v) * H - 0.5, 0, H - 1)
    x0_, y0_ = np.floor(x).astype(int), np.floor(y).astype(int)
    x1_, y1_ = np.minimum(x0_ + 1, W - 1), np.minimum(y0_ + 1, H - 1)
    fx, fy = x - x0_, y - y0_
    top = dn[y0_, x0_] * (1 - fx) + dn[y0_, x1_] * fx
    bot = dn[y1_, x0_] * (1 - fx) + dn[y1_, x1_] * fx
    ref = top * (1 - fy) + bot * fy
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


@probe("computed_window_bilinear_interpret")
def p_computed_window_interpret():
    """Same composition in interpret mode (the CPU-suite path)."""
    H = W = 640
    WIN = 256

    def kernel(d_hbm, u_ref, v_ref, out_ref):
        u = u_ref[...]
        v = v_ref[...]
        x = jnp.clip(u * W - 0.5, 0.0, W - 1.0)
        y = jnp.clip(v * H - 0.5, 0.0, H - 1.0)
        y0 = jnp.minimum(
            jnp.maximum(jnp.min(y).astype(jnp.int32) - 1, 0) // 8 * 8,
            H - WIN,
        )
        x0 = jnp.minimum(
            jnp.maximum(jnp.min(x).astype(jnp.int32) - 1, 0) // 128 * 128,
            W - WIN,
        )

        def inner(win, sem):
            dma = pltpu.make_async_copy(
                d_hbm.at[pl.ds(y0, WIN), pl.ds(x0, WIN)], win, sem
            )
            dma.start()
            dma.wait()
            xl = jnp.clip(x - x0.astype(jnp.float32), 0.0, WIN - 1.0)
            yl = jnp.clip(y - y0.astype(jnp.float32), 0.0, WIN - 1.0)
            iw = jax.lax.broadcasted_iota(
                jnp.int32, (WIN, 128), 0).astype(jnp.float32)
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(iw - xl[0:1]))
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(iw - yl[0:1]))
            tmp = jax.lax.dot_general(
                win[...], wx, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                # XLA:CPU's DEFAULT f32 dot is reduced precision (~bf16,
                # max err 0.16 on a 256-deep f32 dot, measured); HIGHEST
                # is required for exactness even in interpret mode.
                precision=jax.lax.Precision.HIGHEST,
            )
            out_ref[...] = jnp.sum(tmp * wy, axis=0, keepdims=True)

        pl.run_scoped(
            inner,
            win=pltpu.VMEM((WIN, WIN), jnp.float32),
            sem=pltpu.SemaphoreType.DMA(()),
        )

    rng = np.random.RandomState(1)
    d = jnp.asarray(rng.randn(H, W), jnp.float32)
    px = 300.0 + 30.0 * rng.randn(1, 128).clip(-1, 1)
    py = 500.0 + 30.0 * rng.randn(1, 128).clip(-1, 1)
    u = jnp.asarray((px + 0.5) / W, jnp.float32)
    v = jnp.asarray((py + 0.5) / H, jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=True,
    )(d, u, v)
    dn = np.asarray(d)
    x = np.clip(np.asarray(u) * W - 0.5, 0, W - 1)
    y = np.clip(np.asarray(v) * H - 0.5, 0, H - 1)
    x0_, y0_ = np.floor(x).astype(int), np.floor(y).astype(int)
    x1_, y1_ = np.minimum(x0_ + 1, W - 1), np.minimum(y0_ + 1, H - 1)
    fx, fy = x - x0_, y - y0_
    top = dn[y0_, x0_] * (1 - fx) + dn[y0_, x1_] * fx
    bot = dn[y1_, x0_] * (1 - fx) + dn[y1_, x1_] * fx
    ref = top * (1 - fy) + bot * fy
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


@probe("multichannel_band_hinted")
def p_chw_band():
    CH, H, W = 4, 512, 512
    WIN = 128

    def kernel(d_hbm, y0_ref, out_ref, scr, sem):
        y0 = pl.multiple_of(y0_ref[0] // 8 * 8, 8)
        dma = pltpu.make_async_copy(
            d_hbm.at[1, pl.ds(y0, WIN), pl.ds(128, WIN)], scr, sem
        )
        dma.start()
        dma.wait()
        out_ref[...] = scr[...]

    d = jnp.arange(CH * H * W, dtype=jnp.float32).reshape(CH, H, W)
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
    )(d, jnp.array([64], jnp.int32))
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(d)[1, 64:64 + WIN, 128:256])


if __name__ == "__main__":
    assert jax.default_backend() == "tpu", "run on a TPU backend"
    for fn in (p_computed_window, p_computed_window_interpret, p_chw_band):
        fn()
    print("DONE")
