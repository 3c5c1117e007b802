"""Mosaic capability probe, part 4: the check-and-refetch window cache.

The round-5 windowed map query keeps the current window origin in SMEM
scratch (persisting across grid steps) and, per query call inside the
horizon loop, re-DMAs the (WIN, WIN) window only when the call's coord
bounding box escapes the cached window. This probe validates the exact
composition on hardware:

1. SMEM scratch persisting across sequential grid steps;
2. a DATA-DEPENDENT ``pl.when`` predicate around make_async_copy
   (start+wait) inside ``lax.fori_loop``;
3. origin updates feeding later pl.ds starts via pl.multiple_of.

Usage (TPU): timeout 570 python scripts/mosaic_capability_probe4.py
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


H = W = 1024
WIN = 384
T = 64
ROWS = 2


@probe("refetch_window_loop")
def p_refetch():
    """T-step loop over drifting clustered coords; window fetched lazily on
    first use and re-fetched when the cluster escapes; parity vs 4-tap."""

    def kernel(d_hbm, u_ref, v_ref, o_ref, win, org, sem, nfetch):
        @pl.when(pl.program_id(0) == 0)
        def _init():
            org[0] = -(2 ** 30)
            org[1] = -(2 ** 30)
            nfetch[0] = 0

        def body(t, _):
            x = jnp.clip(u_ref[pl.ds(t, 1)][0] * W - 0.5, 0.0, W - 1.0)
            y = jnp.clip(v_ref[pl.ds(t, 1)][0] * H - 0.5, 0.0, H - 1.0)
            xmin = jnp.min(x).astype(jnp.int32)
            xmax = jnp.max(x).astype(jnp.int32)
            ymin = jnp.min(y).astype(jnp.int32)
            ymax = jnp.max(y).astype(jnp.int32)
            y0c, x0c = org[0], org[1]
            need = ((ymin < y0c) | (ymax + 1 >= y0c + WIN)
                    | (xmin < x0c) | (xmax + 1 >= x0c + WIN))

            @pl.when(need)
            def _fetch():
                # center-ish the cluster: slack below min, aligned down
                y0n = jnp.clip((ymin - 64) // 8 * 8, 0, H - WIN)
                x0n = jnp.clip((xmin - 96) // 128 * 128, 0, W - WIN)
                org[0] = y0n
                org[1] = x0n
                nfetch[0] = nfetch[0] + 1
                dma = pltpu.make_async_copy(
                    d_hbm.at[
                        pl.ds(pl.multiple_of(y0n, 8), WIN),
                        pl.ds(pl.multiple_of(x0n, 128), WIN),
                    ],
                    win, sem,
                )
                dma.start()
                dma.wait()

            y0c, x0c = org[0], org[1]
            xl = jnp.clip(x - x0c.astype(jnp.float32), 0.0, WIN - 1.0)
            yl = jnp.clip(y - y0c.astype(jnp.float32), 0.0, WIN - 1.0)
            iw = jax.lax.broadcasted_iota(
                jnp.int32, (WIN, 128), 0).astype(jnp.float32)
            for r in range(ROWS):
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(iw - xl[r: r + 1]))
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(iw - yl[r: r + 1]))
                tmp = jax.lax.dot_general(
                    win[...], wx,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                o_ref[pl.ds(t, 1), pl.ds(r, 1)] = jnp.sum(
                    tmp * wy, axis=0, keepdims=True
                )[None]
            return 0

        jax.lax.fori_loop(0, T, body, 0)

    rng = np.random.RandomState(0)
    d = jnp.asarray(rng.randn(H, W), jnp.float32)
    # a drifting cluster: center moves ~6 texels/step -> crosses several
    # window refresh boundaries over T=64 steps
    centers_x = 200.0 + 6.0 * np.arange(T)
    centers_y = 700.0 - 5.0 * np.arange(T)
    px = centers_x[:, None, None] + 40.0 * rng.randn(T, ROWS, 128).clip(-1, 1)
    py = centers_y[:, None, None] + 40.0 * rng.randn(T, ROWS, 128).clip(-1, 1)
    u = jnp.asarray((px + 0.5) / W, jnp.float32)
    v = jnp.asarray((py + 0.5) / H, jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((T, ROWS, 128), lambda i: (0, 0, 0)),
            pl.BlockSpec((T, ROWS, 128), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((T, ROWS, 128), lambda i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, ROWS, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((WIN, WIN), jnp.float32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SMEM((1,), jnp.int32),
        ],
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


@probe("refetch_window_interpret")
def p_refetch_interpret():
    """The same composition in interpret mode (CPU-suite parity path) at a
    smaller size."""
    Hs = Ws = 512
    WINs = 256
    Ts = 16

    def kernel(d_hbm, u_ref, v_ref, o_ref, win, org, sem):
        @pl.when(pl.program_id(0) == 0)
        def _init():
            org[0] = -(2 ** 30)
            org[1] = -(2 ** 30)

        def body(t, _):
            x = jnp.clip(u_ref[pl.ds(t, 1)][0] * Ws - 0.5, 0.0, Ws - 1.0)
            y = jnp.clip(v_ref[pl.ds(t, 1)][0] * Hs - 0.5, 0.0, Hs - 1.0)
            xmin = jnp.min(x).astype(jnp.int32)
            xmax = jnp.max(x).astype(jnp.int32)
            ymin = jnp.min(y).astype(jnp.int32)
            ymax = jnp.max(y).astype(jnp.int32)
            need = ((ymin < org[0]) | (ymax + 1 >= org[0] + WINs)
                    | (xmin < org[1]) | (xmax + 1 >= org[1] + WINs))

            @pl.when(need)
            def _fetch():
                y0n = jnp.clip((ymin - 32) // 8 * 8, 0, Hs - WINs)
                x0n = jnp.clip((xmin - 64) // 128 * 128, 0, Ws - WINs)
                org[0] = y0n
                org[1] = x0n
                dma = pltpu.make_async_copy(
                    d_hbm.at[pl.ds(y0n, WINs), pl.ds(x0n, WINs)], win, sem
                )
                dma.start()
                dma.wait()

            xl = jnp.clip(x - org[1].astype(jnp.float32), 0.0, WINs - 1.0)
            yl = jnp.clip(y - org[0].astype(jnp.float32), 0.0, WINs - 1.0)
            iw = jax.lax.broadcasted_iota(
                jnp.int32, (WINs, 128), 0).astype(jnp.float32)
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(iw - xl[0:1]))
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(iw - yl[0:1]))
            tmp = jax.lax.dot_general(
                win[...], wx, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            o_ref[pl.ds(t, 1)] = jnp.sum(tmp * wy, axis=0, keepdims=True)[
                None
            ]
            return 0

        jax.lax.fori_loop(0, Ts, body, 0)

    rng = np.random.RandomState(2)
    d = jnp.asarray(rng.randn(Hs, Ws), jnp.float32)
    centers_x = 100.0 + 12.0 * np.arange(Ts)
    centers_y = 400.0 - 10.0 * np.arange(Ts)
    px = centers_x[:, None, None] + 30.0 * rng.randn(Ts, 1, 128).clip(-1, 1)
    py = centers_y[:, None, None] + 30.0 * rng.randn(Ts, 1, 128).clip(-1, 1)
    u = jnp.asarray((px + 0.5) / Ws, jnp.float32)
    v = jnp.asarray((py + 0.5) / Hs, jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((Ts, 1, 128), lambda i: (0, 0, 0)),
            pl.BlockSpec((Ts, 1, 128), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((Ts, 1, 128), lambda i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Ts, 1, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((WINs, WINs), jnp.float32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=True,
    )(d, u, v)
    dn = np.asarray(d)
    x = np.clip(np.asarray(u) * Ws - 0.5, 0, Ws - 1)
    y = np.clip(np.asarray(v) * Hs - 0.5, 0, Hs - 1)
    x0_, y0_ = np.floor(x).astype(int), np.floor(y).astype(int)
    x1_, y1_ = np.minimum(x0_ + 1, Ws - 1), np.minimum(y0_ + 1, Hs - 1)
    fx, fy = x - x0_, y - y0_
    top = dn[y0_, x0_] * (1 - fx) + dn[y0_, x1_] * fx
    bot = dn[y1_, x0_] * (1 - fx) + dn[y1_, x1_] * fx
    ref = top * (1 - fy) + bot * fy
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


if __name__ == "__main__":
    ok = True
    for fn in (p_refetch, p_refetch_interpret):
        ok = fn() and ok
    print("DONE" if ok else "SOME FAILED")
