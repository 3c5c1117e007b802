"""Map "texture" subsystem — HBM-resident arrays + bilinear gather.

TPU-native rebuild of the reference's CUDA texture helpers
(``utils/texture_helpers/texture_helper.{cuh,cu}``, ``two_d_texture_helper``,
``three_d_texture_helper``): there are no texture units on TPU, so the
hardware bilinear lookup becomes an explicit gather + lerp over an HBM/VMEM
array. The coordinate pipeline is reproduced exactly:

* world -> map: map = R @ (world - origin), R rows stored like
  texture_helper.cu:94-103;
* map -> normalized tex coord: (map / resolution) / extent
  (texture_helper.cu:106-123);
* query: CUDA ``cudaFilterModeLinear`` + ``cudaAddressModeClamp`` +
  ``normalizedCoords=1`` semantics — sample position x = u*N - 0.5,
  bilinear between clamped neighbor texels.

Double-buffered CPU staging (textures_buffer_) is unnecessary: textures are
immutable pytree leaves; "updating the map" is building a new pytree (cheap,
and safe while a solve is in flight).

Arrays are stored row-major [y, x] (2D) / [z, y, x] (3D) with an optional
trailing channel axis, matching the reference's row-major copies
(two_d_texture_helper.cu columnMajor handling).
"""

from __future__ import annotations

import contextlib
import contextvars
import os

import jax
import jax.numpy as jnp
from flax import struct

# MXU precision for the in-kernel tent-mask bilinear (_query_tex_pallas).
# "highest" = exact f32 (6-pass emulation); "high" = bf16x3 (3 passes, ~2x
# MXU rate, rel err ~1e-7 on bilinear weights — still ~5 orders of magnitude
# tighter than the reference's own interpolation: CUDA texture units quantize
# the lerp fraction to 9-bit fixed point, ~2e-3); "default" = single-pass
# bf16 (~2e-3 — enough to flip near-threshold crash flags; measure first).
# Trace-time constant: set the env var BEFORE building controllers (the A/B
# probe runs subprocesses). Unknown values fail HERE, at import: a typo'd
# A/B arm must not silently measure the wrong precision.
_MAP_MXU_PRECISION = os.environ.get("MPPI_MAP_MXU_PRECISION", "highest")
if _MAP_MXU_PRECISION not in ("highest", "high", "default"):
    raise ValueError(
        f"MPPI_MAP_MXU_PRECISION={_MAP_MXU_PRECISION!r}: expected one of "
        "'highest' (exact f32), 'high' (bf16x3), 'default' (bf16)"
    )
_MXU_PRECISION = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.DEFAULT,  # 3-pass is hand-rolled, see below
    "default": jax.lax.Precision.DEFAULT,
}[_MAP_MXU_PRECISION]


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _tent_dot(data, wx):
    """The tent-mask interpolation matmul ``data (H, W) @ wx (W, lanes)``
    at the module's precision knob.

    "highest": Precision.HIGHEST (XLA's exact-f32 6-pass bf16 emulation).
    "high": a HAND-ROLLED 3-pass bf16x3 — Mosaic has no lowering for
    Precision.HIGH at all (NotImplementedError, jax 0.9 mosaic
    lowering.py), so the classic decomposition is built explicitly: split
    each operand into a bf16 head + bf16 residual and sum the three
    significant cross terms (hi@hi + hi@lo + lo@hi; the lo@lo term is
    below f32 resolution). ~2^-22 relative error at HALF the HIGHEST pass
    count — 2x MXU rate on map-bound configs. "default": single-pass
    bf16 (~2e-3 — enough to flip near-threshold crash flags; measure
    first)."""
    if _MAP_MXU_PRECISION != "high":
        return jax.lax.dot_general(
            data, wx, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_MXU_PRECISION,
        )
    bf16 = jnp.bfloat16

    def split(a):
        hi = a.astype(bf16)
        lo = (a - hi.astype(jnp.float32)).astype(bf16)
        return hi, lo

    d_hi, d_lo = split(data)
    w_hi, w_lo = split(wx)

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return dot(d_hi, w_hi) + (dot(d_hi, w_lo) + dot(d_lo, w_hi))

# Set while a Pallas kernel body traces (ops/pallas_rollout, ops/pallas_solve
# wrap their kernels in ``pallas_layout()``): queries then use the
# sample-major tent-mask MXU formulation below instead of the XLA one-hot /
# gather paths, whose reshapes and batched one-hots do not lower in Mosaic.
_PALLAS_LAYOUT = contextvars.ContextVar("mppi_pallas_layout", default=False)


@contextlib.contextmanager
def pallas_layout():
    """Mark the dynamic extent of a Pallas kernel trace: map-texture queries
    lower via the in-kernel tent-mask bilinear (see ``_query_tex_pallas``)."""
    tok = _PALLAS_LAYOUT.set(True)
    try:
        yield
    finally:
        _PALLAS_LAYOUT.reset(tok)


def in_pallas_layout() -> bool:
    return _PALLAS_LAYOUT.get()


class _WindowedMapData:
    """In-kernel stand-in for a ``MapTexture2D.data`` leaf that stayed in
    HBM: the fused kernels route oversized maps through a lazily-fetched
    (win_h, win_w) VMEM window instead of a resident VMEM copy (whose
    tent-mask work scales with map AREA — ~17 ns/point at 512^2 and a
    compile failure at 1024^2, vs a map-size-CONSTANT ~4-15 ns/point for
    the window; scripts/map_size_sweep.py). The window origin lives in
    SMEM scratch and persists across grid steps; each query call re-DMAs
    the window only when its coordinate bounding box escapes the cached
    window (scripts/mosaic_capability_probe4.py validates the
    composition).

    This is the TPU-native answer to the reference's arbitrary-size CUDA
    texture objects (texture_helper.cuh:12-127): HBM is the texture
    memory, the VMEM window is the texture cache, and the refetch check
    is the (software) cache fill. Built by ops/pallas_rollout's leaf
    plumbing — never by user code.
    """

    def __init__(self, hbm_ref, win_ref, org_ref, sem, logical_shape,
                 win_hw, channel_major):
        self.hbm_ref = hbm_ref
        self.win_ref = win_ref
        self.org_ref = org_ref
        self.sem = sem
        self.shape = tuple(logical_shape)  # (H, W) or (CH, H, W) logical
        self.win_hw = tuple(win_hw)
        self.channel_major = bool(channel_major)

    @property
    def ndim(self):
        return len(self.shape)

    @property
    def dtype(self):
        return jnp.float32


# In-kernel resident-vs-windowed crossover (bench chip, f32 HIGHEST,
# scripts/map_size_sweep.py): the VMEM-resident tent-mask wins below this
# side (1.1 ns at 128, 4.4 at 256), the HBM-windowed form above it (4.9 ns
# at 512 vs 16.9 resident).
_PALLAS_RESIDENT_MAX_SIDE = 256
# Default window side for the HBM-windowed in-kernel path: 256 texels
# measured ~4 ns/point independent of map size; 512 measured ~14 ns/point
# (still 3x the XLA gather) and covers 4x the query-cluster area. The auto
# policy takes 256; set ``window_texels`` on the texture when one solve's
# per-timestep sample cloud can spread wider than ~(window - 130) texels
# in x / (window - 10) in y (beyond that, queries CLAMP to the window
# edge — see query_tex).
_DEFAULT_WINDOW_TEXELS = 256


def _bilinear_axis(coord_norm, n):
    """CUDA linear-filter sample setup along one axis: normalized coord ->
    (lo_index, hi_index, fraction) with clamp addressing."""
    # clamp addressing: the unnormalized sample coordinate saturates at the
    # edge texel centers, so out-of-range queries return the edge value
    x = jnp.clip(coord_norm * n - 0.5, 0.0, n - 1.0)
    lo = jnp.floor(x)
    frac = x - lo
    lo_i = lo.astype(jnp.int32)
    hi_i = jnp.clip(lo_i + 1, 0, n - 1)
    return lo_i, hi_i, frac


class MapTexture2D(struct.PyTreeNode):
    """One 2D map layer (TwoDTextureHelper analog).

    ``channel_major=True`` stores multichannel data as (CH, H, W) — the
    layout the in-kernel windowed query DMAs per-channel bands from (the
    reference's float4 texture layout, ``texture_helper.cuh:12-127``,
    interleaves channels per texel because CUDA texture units fetch 16-byte
    texels; on TPU the channel-separable band layout is what the DMA
    engine wants). ``window_texels`` overrides the windowed path's window
    side (0 = the 256-texel auto policy; see ``_DEFAULT_WINDOW_TEXELS``).
    """

    data: jnp.ndarray = None  # (H, W); (H, W, CH); (CH, H, W) channel_major
    origin: jnp.ndarray = None  # (3,)
    rotation: jnp.ndarray = None  # (3, 3), rows like the reference
    resolution: jnp.ndarray = None  # (3,) meters per texel per axis
    channel_major: bool = struct.field(pytree_node=False, default=False)
    window_texels: int = struct.field(pytree_node=False, default=0)

    @classmethod
    def create(cls, data, origin=(0, 0, 0), rotation=None, resolution=1.0,
               channel_major=False, window_texels=0):
        data = jnp.asarray(data, jnp.float32)
        if channel_major and data.ndim != 3:
            raise ValueError("channel_major requires (CH, H, W) data")
        if rotation is None:
            rotation = jnp.eye(3)
        resolution = jnp.asarray(resolution, jnp.float32)
        if resolution.ndim == 0:
            resolution = jnp.full((3,), resolution)
        return cls(
            data=data,
            origin=jnp.asarray(origin, jnp.float32),
            rotation=jnp.asarray(rotation, jnp.float32),
            resolution=resolution,
            channel_major=bool(channel_major),
            window_texels=int(window_texels),
        )

    @property
    def height(self):
        return self.data.shape[1 if self.channel_major else 0]

    @property
    def width(self):
        return self.data.shape[2 if self.channel_major else 1]

    @property
    def channels(self):
        """0 for single-channel (H, W) data."""
        if self.data.ndim == 2:
            return 0
        return self.data.shape[0 if self.channel_major else 2]

    # --- coordinate pipeline (texture_helper.cu:94-134) -------------------
    def world_to_map(self, world):
        """world (..., 3) -> map-frame meters (..., 3)."""
        diff = world - self.origin
        return jnp.einsum("ij,...j->...i", self.rotation, diff)

    def map_to_tex(self, map_pose):
        """map meters -> normalized tex coords (x, y[, z])."""
        px = map_pose[..., 0] / self.resolution[0] / self.width
        py = map_pose[..., 1] / self.resolution[1] / self.height
        return px, py

    def world_to_tex(self, world):
        return self.map_to_tex(self.world_to_map(world))

    # --- component-wise pipeline (Pallas-kernel friendly) -------------------
    # The trailing-axis ``world`` stacks above are hostile to Mosaic (the
    # component axis must LEAD in-kernel); these compute the identical
    # world -> map -> tex math on separate component arrays of any layout.
    def world_to_tex_components(self, wx, wy, wz=0.0):
        """(wx, wy[, wz]) world components -> normalized (u, v)."""
        R = self.rotation
        dx = wx - self.origin[0]
        dy = wy - self.origin[1]
        dz = wz - self.origin[2]
        mx = R[0, 0] * dx + R[0, 1] * dy + R[0, 2] * dz
        my = R[1, 0] * dx + R[1, 1] * dy + R[1, 2] * dz
        u = mx / self.resolution[0] / self.width
        v = my / self.resolution[1] / self.height
        return u, v

    def query_world_components(self, wx, wy, wz=0.0):
        """Bilinear lookup at world (wx, wy[, wz]) given component-wise —
        the query entry point every fused-kernel-admissible model/cost uses
        (texture_helper.cu:94-134 pipeline, identical values to
        ``query_at_world_pose``)."""
        u, v = self.world_to_tex_components(wx, wy, wz)
        return self.query_tex(u, v)

    def query_world_components_channel(self, wx, wy, ch, wz=0.0):
        """``query_world_components`` of ONE channel (``ch`` static) — the
        multichannel-map entry point that lowers on every path including
        the in-kernel windowed one."""
        u, v = self.world_to_tex_components(wx, wy, wz)
        return self.query_tex_channel(u, v, ch)

    # --- queries -----------------------------------------------------------
    # XLA's TPU gather serializes (flat 32-45 ns/point measured); for maps
    # up to this many texels per side the separable one-hot MXU formulation
    # below is faster at identical (float32) accuracy (6.8 ns at 256^2,
    # 20.8 at 512^2), but its area-scaling work loses to the gather past
    # 512 (77.7 ns at 1024^2) — scripts/map_size_sweep.py, bench chip.
    _MATMUL_GATHER_MAX_SIDE = 512
    _MATMUL_CHUNK_BYTES = 64 * 1024 * 1024

    def _query_tex_matmul(self, u, v):
        """Bilinear lookup as two separable interpolation-weight products:
        out = rowweights(v) @ data, then a weighted column reduction — both
        land on the MXU/VPU instead of a serialized gather."""
        import jax

        H, W = self.height, self.width
        u = jnp.asarray(u)
        v = jnp.asarray(v)
        x0, x1, fx = _bilinear_axis(u, W)
        y0, y1, fy = _bilinear_axis(v, H)
        batch = u.shape
        d = self.data
        ch = d.shape[2] if d.ndim == 3 else 0
        d2 = d.reshape(H, -1)  # (H, W) or (H, W*ch)

        def block(y0b, y1b, fyb, x0b, x1b, fxb):
            fyb = fyb[:, None]
            fxb = fxb[:, None]
            rw = (jax.nn.one_hot(y0b, H) * (1 - fyb)
                  + jax.nn.one_hot(y1b, H) * fyb)              # (n, H)
            cw = (jax.nn.one_hot(x0b, W) * (1 - fxb)
                  + jax.nn.one_hot(x1b, W) * fxb)              # (n, W)
            rows = jnp.dot(rw, d2, precision="float32",
                           preferred_element_type=jnp.float32)
            if ch:
                rows = rows.reshape(-1, W, ch)
                return jnp.sum(rows * cw[..., None], axis=1)   # (n, ch)
            return jnp.sum(rows * cw, axis=-1)                  # (n,)

        args = tuple(a.reshape(-1) for a in
                     (y0, y1, fy, x0, x1, fx))
        N = args[0].shape[0]
        chunk = max(128, self._MATMUL_CHUNK_BYTES // (4 * max(H, W)))
        if N <= chunk:
            out = block(*args)
        else:
            # bound peak memory: sequential lax.map over padded chunks
            n_chunks = -(-N // chunk)
            padded = tuple(
                jnp.pad(a, (0, n_chunks * chunk - N)).reshape(n_chunks, chunk)
                for a in args
            )
            out = jax.lax.map(lambda t: block(*t), padded)
            out = out.reshape((n_chunks * chunk,) + out.shape[2:])[:N]
        if ch:
            return out.reshape(batch + (ch,))
        return out.reshape(batch)

    # In-kernel (Pallas) sample tiles are lane-major: the last axis is the
    # 128-lane dim. Maps up to this many texels per side ride the tent-mask
    # MXU bilinear below with the whole map VMEM-resident (a 512x512 f32
    # map is 1 MB — within the 2 MB parameter-leaf budget).
    _PALLAS_VMEM_MAX_SIDE = 512

    def pallas_window(self):
        """The fused kernels' routing decision for this texture's data
        leaf: ``None`` = leave it a plain leaf (small single-channel maps
        ride VMEM-resident below the measured resident/windowed crossover,
        ``_PALLAS_RESIDENT_MAX_SIDE``; trailing-channel multichannel
        layouts are XLA-only); ``(win_h, win_w)`` = route it through the
        HBM-windowed in-kernel path (``_query_tex_windowed``). Static —
        depends only on shapes and the ``window_texels`` policy field."""
        d = self.data
        if isinstance(d, _WindowedMapData) or d is None:
            return None
        if d.ndim not in (2, 3) or (d.ndim == 3 and not self.channel_major):
            return None
        H, W = int(self.height), int(self.width)
        if d.ndim == 2 and max(H, W) <= _PALLAS_RESIDENT_MAX_SIDE:
            return None
        win = int(self.window_texels) or _DEFAULT_WINDOW_TEXELS
        wh = min(_round_up(win, 8), _round_up(H, 8))
        ww = min(_round_up(win, 128), _round_up(W, 128))
        return wh, ww

    def _query_tex_windowed(self, u, v, ch):
        """In-kernel bilinear through the lazily-cached HBM window (see
        ``_WindowedMapData``). Identical values to the XLA paths whenever
        each query call's coordinate bounding box fits the window
        (win - ~130 texels of x coverage, win - ~10 of y, after
        alignment slack); wider clusters CLAMP to the window edge — the
        documented degradation, chosen over the reference semantics only
        past the texture's configured window (``window_texels``).

        Per call: 4 VPU min/max reductions + scalar compares; the window
        DMA re-fires only when the cluster escapes the cached window
        (every few solve iterations for a moving vehicle), so its
        ~win^2*4-byte cost amortizes to ~nothing. The tent matmul runs at
        the MPPI_MAP_MXU_PRECISION knob like ``_query_tex_pallas``."""
        import jax
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        d = self.data
        H, W = int(self.height), int(self.width)
        wh, ww = d.win_hw
        n_ch = d.shape[0] if d.ndim == 3 else 0
        hbm = d.hbm_ref
        Hp, Wp = int(hbm.shape[-2]), int(hbm.shape[-1])
        lead = u.shape[:-1]
        lanes = int(u.shape[-1])
        x = jnp.clip(u * W - 0.5, 0.0, W - 1.0).reshape((-1, lanes))
        y = jnp.clip(v * H - 0.5, 0.0, H - 1.0).reshape((-1, lanes))
        org = d.org_ref
        xmin = jnp.min(x).astype(jnp.int32)
        ymin = jnp.min(y).astype(jnp.int32)
        # highest texel index any query touches (the bilinear hi neighbor,
        # clamped like the 4-tap path clamps it)
        xhi = jnp.minimum(jnp.max(x).astype(jnp.int32) + 1, W - 1)
        yhi = jnp.minimum(jnp.max(y).astype(jnp.int32) + 1, H - 1)
        need = ((ymin < org[0]) | (yhi > org[0] + (wh - 1))
                | (xmin < org[1]) | (xhi > org[1] + (ww - 1)))

        @pl.when(need)
        def _fetch():
            # center the cluster: slack below the min (so drift in either
            # direction survives a while), then align down — alignment can
            # eat up to 127/7 texels of the x/y slack
            sx = jnp.maximum((ww - 130 - (xhi - xmin)) // 2, 0)
            sy = jnp.maximum((wh - 10 - (yhi - ymin)) // 2, 0)
            x0n = jnp.clip((xmin - sx) // 128 * 128, 0, Wp - ww)
            y0n = jnp.clip((ymin - sy) // 8 * 8, 0, Hp - wh)
            org[0] = y0n
            org[1] = x0n
            y0a = pl.multiple_of(y0n, 8)
            x0a = pl.multiple_of(x0n, 128)
            if n_ch:
                for c in range(n_ch):
                    dma = pltpu.make_async_copy(
                        hbm.at[c, pl.ds(y0a, wh), pl.ds(x0a, ww)],
                        d.win_ref.at[c], d.sem,
                    )
                    dma.start()
                    dma.wait()
            else:
                dma = pltpu.make_async_copy(
                    hbm.at[pl.ds(y0a, wh), pl.ds(x0a, ww)], d.win_ref,
                    d.sem,
                )
                dma.start()
                dma.wait()

        xl = jnp.clip(x - org[1].astype(jnp.float32), 0.0, ww - 1.0)
        yl = jnp.clip(y - org[0].astype(jnp.float32), 0.0, wh - 1.0)
        win = d.win_ref[ch] if n_ch else d.win_ref[...]
        iw = jax.lax.broadcasted_iota(
            jnp.int32, (ww, lanes), 0).astype(jnp.float32)
        ih = jax.lax.broadcasted_iota(
            jnp.int32, (wh, lanes), 0).astype(jnp.float32)
        outs = []
        for r in range(xl.shape[0]):
            wxr = jnp.maximum(0.0, 1.0 - jnp.abs(iw - xl[r: r + 1]))
            wyr = jnp.maximum(0.0, 1.0 - jnp.abs(ih - yl[r: r + 1]))
            tmp = _tent_dot(win, wxr)
            outs.append(jnp.sum(tmp * wyr, axis=0, keepdims=True))
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
        return out.reshape(lead + (lanes,))

    def _query_tex_pallas(self, u, v):
        """In-kernel bilinear in sample-major layout — the TPU-native analog
        of the reference's hardware texture units (texture_helper.cuh:12-127)
        for fused rollout kernels. Per sublane-row of 128 samples (coords on
        lanes):

          x = clip(u*W - 0.5, 0, W-1)                  (CUDA linear-filter
                                                        sample position)
          wx[w, p] = relu(1 - |w - x_p|)               (W, 128) — the tent
            kernel IS the two-tap lerp weight row: (w==x0)(1-fx)+(w==x1)fx
          tmp = d (H, W) @ wx -> (H, 128)              one MXU op: column p
            holds the x-interpolated map column at sample p's x
          wy[h, p] = relu(1 - |h - y_p|)               (H, 128)
          out[p] = sum_h tmp[h, p] * wy[h, p]          sublane reduce

        No transposes, gathers, or lane-dim reshapes — everything Mosaic
        lowers. The matmul precision is the MPPI_MAP_MXU_PRECISION
        env knob, read at IMPORT time (a trace-time constant — set it
        before building controllers): "highest" (default) is f32-exact vs
        the XLA gather path (rel err ~3e-7 measured), "high" is bf16x3
        (~1e-7 rel err on the weights, ~2x MXU rate), "default" is
        single-pass bf16 (~2e-3 — enough to flip near-threshold crash
        flags). ~0.7 ns/point device time at 128x128 on v5e vs 5-20 ns for
        XLA's serialized gather. Leading dims (map-query corners,
        split-cost time chunks) flatten into extra sample rows.
        """
        import jax

        d = self.data
        H, W = int(d.shape[0]), int(d.shape[1])
        lead = u.shape[:-1]
        lanes = int(u.shape[-1])
        x = jnp.clip(u * W - 0.5, 0.0, W - 1.0).reshape((-1, lanes))
        y = jnp.clip(v * H - 0.5, 0.0, H - 1.0).reshape((-1, lanes))
        iw = jax.lax.broadcasted_iota(
            jnp.int32, (W, lanes), 0).astype(jnp.float32)
        ih = jax.lax.broadcasted_iota(
            jnp.int32, (H, lanes), 0).astype(jnp.float32)
        outs = []
        for r in range(x.shape[0]):
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(iw - x[r: r + 1]))
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(ih - y[r: r + 1]))
            tmp = _tent_dot(d, wx)
            outs.append(jnp.sum(tmp * wy, axis=0, keepdims=True))
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
        return out.reshape(lead + (lanes,))

    def query_tex(self, u, v):
        """Bilinear lookup at normalized (u, v); u indexes width (x),
        v indexes height (y). Batched over leading dims. Multichannel
        textures return a trailing channel axis (both layouts)."""
        if isinstance(self.data, _WindowedMapData):
            if self.data.ndim == 3:
                from mppi_generic_tpu.ops.pallas_rollout import (
                    PallasIncompatible,
                )

                raise PallasIncompatible(
                    "multichannel windowed map: query one channel at a "
                    "time with query_tex_channel (the trailing channel "
                    "axis the XLA paths return does not lower in Mosaic)"
                )
            return self._query_tex_windowed(u, v, None)
        if in_pallas_layout() and jnp.ndim(u) >= 2:
            if (self.data.ndim == 2
                    and self.height <= self._PALLAS_VMEM_MAX_SIDE
                    and self.width <= self._PALLAS_VMEM_MAX_SIDE):
                return self._query_tex_pallas(u, v)
            # refuse here rather than fall through: the one-hot/gather
            # paths below need lane-transposing reshapes / per-lane
            # gathers Mosaic cannot lower, so inside a kernel trace they
            # die with a raw Mosaic error that bypasses the controllers'
            # `except PallasIncompatible` fallback (round-4 review
            # finding). Maps larger than the resident cap normally never
            # reach here: the kernels' leaf plumbing routes them through
            # the HBM-windowed path (pallas_window) — this branch fires
            # only for direct _query_tex_pallas-era callers.
            from mppi_generic_tpu.ops.pallas_rollout import (
                PallasIncompatible,
            )

            raise PallasIncompatible(
                f"in-kernel map query: resident maps are single-channel "
                f"up to {self._PALLAS_VMEM_MAX_SIDE} texels/side (got "
                f"{self.data.shape}); larger/multichannel maps ride the "
                "windowed path via the fused kernels' leaf plumbing"
            )
        if self.channel_major:
            return jnp.stack(
                [self.query_tex_channel(u, v, c)
                 for c in range(self.channels)],
                axis=-1,
            )
        if (self.height <= self._MATMUL_GATHER_MAX_SIDE
                and self.width <= self._MATMUL_GATHER_MAX_SIDE):
            # under vmap the per-element trace sees scalars; the one-hot
            # products batch into full MXU matmuls either way
            return self._query_tex_matmul(u, v)
        x0, x1, fx = _bilinear_axis(u, self.width)
        y0, y1, fy = _bilinear_axis(v, self.height)
        d = self.data
        v00 = d[y0, x0]
        v01 = d[y0, x1]
        v10 = d[y1, x0]
        v11 = d[y1, x1]
        if d.ndim == 3:
            fx = fx[..., None]
            fy = fy[..., None]
        top = v00 + fx * (v01 - v00)
        bot = v10 + fx * (v11 - v10)
        return top + fy * (bot - top)

    def query_tex_channel(self, u, v, ch: int):
        """Bilinear lookup of ONE channel (``ch`` static). The in-kernel
        entry point for multichannel maps — the reference's AR costs read
        only channel .x of their float4 costmap the same way
        (ar_standard_cost.cu:356-360). Single-channel textures accept
        ch=0."""
        d = self.data
        if isinstance(d, _WindowedMapData):
            return self._query_tex_windowed(u, v, ch if d.ndim == 3 else None)
        if d.ndim == 2:
            if ch != 0:
                raise ValueError(f"channel {ch} of a single-channel map")
            return self.query_tex(u, v)
        if self.channel_major:
            return self.replace(data=d[ch], channel_major=False).query_tex(
                u, v
            )
        return self.replace(data=d[..., ch]).query_tex(u, v)

    def query_at_map_pose(self, map_pose):
        u, v = self.map_to_tex(map_pose)
        return self.query_tex(u, v)

    def query_at_world_pose(self, world):
        u, v = self.world_to_tex(world)
        return self.query_tex(u, v)

    def query_at_world_offset_pose(self, world, offset, rotation_rpy):
        """queryTextureAtWorldOffsetPose: rotate a body-frame offset into the
        world (Z-Y-X Euler), add, and query (texture_helper.cu:137-144)."""
        from mppi_generic_tpu.utils.math_utils import euler_to_quat, quat_rotate

        q = euler_to_quat(rotation_rpy[0], rotation_rpy[1], rotation_rpy[2])
        world_offset = world + quat_rotate(q, offset)
        return self.query_at_world_pose(world_offset)


def load_track_npz(path_or_dict, window_texels=0):
    """Load the reference's AutoRally track-map npz into a
    :class:`MapTexture2D` — the ``loadTrackData`` analog
    (ar_standard_cost.cu:85-140). Format: ``xBounds`` (2,), ``yBounds``
    (2,), ``pixelsPerMeter`` (1,), ``channel0..3`` flattened row-major
    float4 planes of shape (H, W) = ((y_max-y_min)*ppm,
    (x_max-x_min)*ppm).

    The returned texture is channel-major (the float4 layout re-blocked
    for the in-kernel windowed query; channel 0 carries the track, which
    is all the AR costs read — ar_standard_cost.cu:356-360), with
    origin/resolution chosen so ``world_to_tex`` reproduces the
    reference's normalized transform EXACTLY: R/trs there maps
    u = (x - x_min)/(x_max - x_min) (updateTransform,
    ar_standard_cost.cu:136-140); here origin=(x_min, y_min),
    resolution=1/ppm, W=(x_max-x_min)*ppm give the identical u.

    Accepts a path or an already-loaded dict-like (``np.load`` result).
    """
    import numpy as np

    d = path_or_dict
    if not hasattr(d, "__getitem__") or isinstance(d, (str, bytes)):
        d = np.load(d)
    x_min, x_max = (float(v) for v in np.asarray(d["xBounds"]).reshape(-1))
    y_min, y_max = (float(v) for v in np.asarray(d["yBounds"]).reshape(-1))
    ppm = float(np.asarray(d["pixelsPerMeter"]).reshape(-1)[0])
    W = int((x_max - x_min) * ppm)
    H = int((y_max - y_min) * ppm)
    chans = [
        np.asarray(d[f"channel{i}"], np.float32).reshape(H, W)
        for i in range(4)
    ]
    return MapTexture2D.create(
        np.stack(chans),
        origin=(x_min, y_min, 0.0),
        resolution=1.0 / ppm,
        channel_major=True,
        window_texels=window_texels,
    )


class MapTexture3D(struct.PyTreeNode):
    """One 3D (layered) map (ThreeDTextureHelper analog): trilinear lookup."""

    data: jnp.ndarray = None  # (D, H, W)
    origin: jnp.ndarray = None
    rotation: jnp.ndarray = None
    resolution: jnp.ndarray = None

    @classmethod
    def create(cls, data, origin=(0, 0, 0), rotation=None, resolution=1.0):
        data = jnp.asarray(data, jnp.float32)
        if rotation is None:
            rotation = jnp.eye(3)
        resolution = jnp.asarray(resolution, jnp.float32)
        if resolution.ndim == 0:
            resolution = jnp.full((3,), resolution)
        return cls(
            data=data,
            origin=jnp.asarray(origin, jnp.float32),
            rotation=jnp.asarray(rotation, jnp.float32),
            resolution=resolution,
        )

    @property
    def depth(self):
        return self.data.shape[0]

    @property
    def height(self):
        return self.data.shape[1]

    @property
    def width(self):
        return self.data.shape[2]

    def world_to_map(self, world):
        diff = world - self.origin
        return jnp.einsum("ij,...j->...i", self.rotation, diff)

    def map_to_tex(self, map_pose):
        px = map_pose[..., 0] / self.resolution[0] / self.width
        py = map_pose[..., 1] / self.resolution[1] / self.height
        pz = map_pose[..., 2] / self.resolution[2] / self.depth
        return px, py, pz

    # depth layers become channels of the MXU bilinear (maps up to 256/side,
    # modest depth); bigger volumes use the gather path
    _MATMUL_GATHER_MAX_SIDE = 256
    _MATMUL_GATHER_MAX_DEPTH = 32

    def _query_tex_matmul(self, u, v, w):
        """Trilinear as (MXU bilinear over all depth layers) + one-hot depth
        lerp: the (H, W, D) view runs through the 2D multichannel matmul
        formulation, then depth interpolation is a weighted reduction."""
        import jax

        z0, z1, fz = _bilinear_axis(jnp.asarray(w), self.depth)
        as2d = MapTexture2D(
            data=jnp.transpose(self.data, (1, 2, 0)),  # (H, W, D)
            origin=self.origin, rotation=self.rotation,
            resolution=self.resolution,
        )
        layers = as2d.query_tex(u, v)  # (..., D) bilinear per depth layer
        D = self.depth
        fzb = fz[..., None]
        dw = (jax.nn.one_hot(z0, D) * (1 - fzb)
              + jax.nn.one_hot(z1, D) * fzb)  # (..., D)
        return jnp.sum(layers * dw, axis=-1)

    def query_tex(self, u, v, w):
        if (self.height <= self._MATMUL_GATHER_MAX_SIDE
                and self.width <= self._MATMUL_GATHER_MAX_SIDE
                and self.depth <= self._MATMUL_GATHER_MAX_DEPTH):
            return self._query_tex_matmul(u, v, w)
        x0, x1, fx = _bilinear_axis(u, self.width)
        y0, y1, fy = _bilinear_axis(v, self.height)
        z0, z1, fz = _bilinear_axis(w, self.depth)
        d = self.data

        def plane(z):
            v00 = d[z, y0, x0]
            v01 = d[z, y0, x1]
            v10 = d[z, y1, x0]
            v11 = d[z, y1, x1]
            top = v00 + fx * (v01 - v00)
            bot = v10 + fx * (v11 - v10)
            return top + fy * (bot - top)

        p0 = plane(z0)
        p1 = plane(z1)
        return p0 + fz * (p1 - p0)

    def query_at_map_pose(self, map_pose):
        return self.query_tex(*self.map_to_tex(map_pose))

    def query_at_world_pose(self, world):
        return self.query_at_map_pose(self.world_to_map(world))
