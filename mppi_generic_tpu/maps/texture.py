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
    """One 2D map layer (TwoDTextureHelper analog)."""

    data: jnp.ndarray = None  # (H, W) or (H, W, CH)
    origin: jnp.ndarray = None  # (3,)
    rotation: jnp.ndarray = None  # (3, 3), rows like the reference
    resolution: jnp.ndarray = None  # (3,) meters per texel per axis

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
    def height(self):
        return self.data.shape[0]

    @property
    def width(self):
        return self.data.shape[1]

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

    # --- queries -----------------------------------------------------------
    # XLA's TPU gather serializes (~5-20 ns/point); for maps up to this many
    # texels per side the separable one-hot MXU formulation below is 10-45x
    # faster at identical (float32) accuracy. The (chunk, H) interpolation-
    # weight intermediates are kept under a fixed byte budget by chunking
    # the query batch; genuinely huge maps fall back to the gather.
    _MATMUL_GATHER_MAX_SIDE = 1024
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
            tmp = jax.lax.dot_general(
                d, wx, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision={
                    "highest": jax.lax.Precision.HIGHEST,
                    "high": jax.lax.Precision.HIGH,
                    "default": jax.lax.Precision.DEFAULT,
                }[_MAP_MXU_PRECISION],
            )
            outs.append(jnp.sum(tmp * wy, axis=0, keepdims=True))
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
        return out.reshape(lead + (lanes,))

    def query_tex(self, u, v):
        """Bilinear lookup at normalized (u, v); u indexes width (x),
        v indexes height (y). Batched over leading dims."""
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
            # finding: multichannel costmaps and 513..1024-texel maps
            # under an explicit kernel="pallas")
            from mppi_generic_tpu.ops.pallas_rollout import (
                PallasIncompatible,
            )

            raise PallasIncompatible(
                f"in-kernel map query supports single-channel maps up to "
                f"{self._PALLAS_VMEM_MAX_SIDE} texels/side (got "
                f"{self.data.shape}) — use the XLA rollout paths"
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
