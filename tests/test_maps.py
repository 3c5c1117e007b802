"""Map texture tests — analog of tests/texture_helpers/texture_helper_test.cu:
coordinate transforms + CUDA-texture bilinear semantics."""

import jax.numpy as jnp
import numpy as np

from mppi_generic_tpu.maps import MapTexture2D, MapTexture3D


def test_world_to_map_translation_rotation():
    R = jnp.array([[0.0, 1.0, 0.0], [-1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    tex = MapTexture2D.create(jnp.zeros((4, 4)), origin=(1.0, 2.0, 0.0), rotation=R)
    m = tex.world_to_map(jnp.array([2.0, 3.0, 0.0]))
    np.testing.assert_allclose(m, [1.0, -1.0, 0.0], atol=1e-6)


def test_map_to_tex_normalization():
    tex = MapTexture2D.create(jnp.zeros((10, 20)), resolution=0.5)
    u, v = tex.map_to_tex(jnp.array([5.0, 2.5, 0.0]))
    # 5m / 0.5m-per-px = 10px / 20 wide = 0.5 ; 2.5/0.5=5px / 10 high = 0.5
    assert np.isclose(float(u), 0.5) and np.isclose(float(v), 0.5)


def test_bilinear_at_texel_centers():
    """At texel centers (u = (i+0.5)/N) the query returns the texel value."""
    data = jnp.arange(12, dtype=jnp.float32).reshape(3, 4)
    tex = MapTexture2D.create(data)
    for y in range(3):
        for x in range(4):
            u = (x + 0.5) / 4
            v = (y + 0.5) / 3
            assert np.isclose(float(tex.query_tex(u, v)), data[y, x], atol=1e-5)


def test_bilinear_midpoint_interpolates():
    data = jnp.array([[0.0, 2.0], [4.0, 6.0]])
    tex = MapTexture2D.create(data)
    # midpoint between all four texels
    val = tex.query_tex(jnp.float32(0.5), jnp.float32(0.5))
    assert np.isclose(float(val), 3.0, atol=1e-5)


def test_clamp_addressing_outside():
    data = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    tex = MapTexture2D.create(data)
    assert np.isclose(float(tex.query_tex(-0.5, -0.5)), 1.0)
    assert np.isclose(float(tex.query_tex(1.5, 1.5)), 4.0)


def test_query_at_world_pose_batched():
    data = jnp.arange(16, dtype=jnp.float32).reshape(4, 4)
    tex = MapTexture2D.create(data, origin=(-2.0, -2.0, 0.0), resolution=1.0)
    pts = jnp.array([[-1.5, -1.5, 0.0], [0.5, 0.5, 0.0]])
    vals = tex.query_at_world_pose(pts)
    # (-1.5,-1.5) world -> map (0.5, 0.5)m -> texel center (0,0)
    assert np.isclose(float(vals[0]), data[0, 0], atol=1e-5)
    assert np.isclose(float(vals[1]), data[2, 2], atol=1e-5)


def test_multichannel_data():
    data = jnp.stack([jnp.ones((2, 2)), 2 * jnp.ones((2, 2))], axis=-1)
    tex = MapTexture2D.create(data)
    val = tex.query_tex(jnp.float32(0.5), jnp.float32(0.5))
    np.testing.assert_allclose(val, [1.0, 2.0], atol=1e-6)


def test_3d_trilinear():
    data = jnp.zeros((2, 2, 2)).at[1].set(1.0)  # plane z=1 is all ones
    tex = MapTexture3D.create(data)
    v_mid = tex.query_tex(jnp.float32(0.5), jnp.float32(0.5), jnp.float32(0.5))
    assert np.isclose(float(v_mid), 0.5, atol=1e-5)
    v_low = tex.query_tex(jnp.float32(0.5), jnp.float32(0.5), jnp.float32(0.25))
    assert np.isclose(float(v_low), 0.0, atol=1e-5)


def test_query_at_world_offset_pose():
    data = jnp.arange(16, dtype=jnp.float32).reshape(4, 4)
    tex = MapTexture2D.create(data, origin=(0.0, 0.0, 0.0))
    base = jnp.array([1.5, 0.5, 0.0])
    offset = jnp.array([1.0, 0.0, 0.0])
    # yaw of pi/2 rotates the +x offset into +y
    val = tex.query_at_world_offset_pose(
        base, offset, jnp.array([0.0, 0.0, jnp.pi / 2])
    )
    direct = tex.query_at_world_pose(jnp.array([1.5, 1.5, 0.0]))
    assert np.isclose(float(val), float(direct), atol=1e-4)


def test_query_world_components_matches_pose_path():
    """The component-wise pipeline (used by fused-kernel-admissible
    models/costs) must equal the trailing-axis world-pose path, including
    a rotated + offset map frame."""
    rng = np.random.RandomState(3)
    th = 0.4
    rot = np.array([
        [np.cos(th), np.sin(th), 0.0],
        [-np.sin(th), np.cos(th), 0.0],
        [0.0, 0.0, 1.0],
    ], np.float32)
    tex = MapTexture2D.create(
        rng.randn(24, 40).astype("f"), origin=(1.5, -2.0, 0.3),
        rotation=rot, resolution=0.25,
    )
    wx = jnp.asarray(rng.randn(5, 7) * 3, jnp.float32)
    wy = jnp.asarray(rng.randn(5, 7) * 3, jnp.float32)
    pts = jnp.stack([wx, wy, jnp.zeros_like(wx)], axis=-1)
    np.testing.assert_allclose(
        tex.query_world_components(wx, wy),
        tex.query_at_world_pose(pts), rtol=1e-5, atol=1e-5,
    )


def test_tent_mask_pallas_query_matches_gather():
    """The in-kernel tent-mask MXU bilinear (sample-major layout) must be
    f32-exact against the explicit gather bilinear, including the clamped
    boundary region and exact-integer sample positions."""
    rng = np.random.RandomState(7)
    H, W = 48, 96
    tex = MapTexture2D.create(rng.randn(H, W).astype("f"))
    # (R, 128) lane-major coords incl. out-of-range (clamp) and exact-texel
    u = jnp.asarray(rng.rand(3, 128) * 1.2 - 0.1, jnp.float32)
    v = jnp.asarray(rng.rand(3, 128) * 1.2 - 0.1, jnp.float32)
    u = u.at[0, :4].set(jnp.array([0.0, 1.0, (5 + 0.5) / W, 0.5]))
    got = tex._query_tex_pallas(u, v)
    # oracle: the explicit 4-tap gather (the > _MATMUL_GATHER_MAX_SIDE path)
    big = MapTexture2D(data=tex.data, origin=tex.origin,
                       rotation=tex.rotation, resolution=tex.resolution)
    ref_cls_limit = MapTexture2D._MATMUL_GATHER_MAX_SIDE
    try:
        MapTexture2D._MATMUL_GATHER_MAX_SIDE = 0
        ref = big.query_tex(u, v)
    finally:
        MapTexture2D._MATMUL_GATHER_MAX_SIDE = ref_cls_limit
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    # leading-dims flattening: (4, 2, 128) corners x rows
    u3 = jnp.asarray(rng.rand(4, 2, 128), jnp.float32)
    v3 = jnp.asarray(rng.rand(4, 2, 128), jnp.float32)
    got3 = tex._query_tex_pallas(u3, v3)
    assert got3.shape == (4, 2, 128)
    try:
        MapTexture2D._MATMUL_GATHER_MAX_SIDE = 0
        ref3 = big.query_tex(u3, v3)
    finally:
        MapTexture2D._MATMUL_GATHER_MAX_SIDE = ref_cls_limit
    np.testing.assert_allclose(got3, ref3, rtol=1e-5, atol=1e-5)


def test_component_wise_settling_matches_quat_oracle():
    """static_settling's component-wise Z-Y-X corner rotation must equal
    the quaternion formulation it replaced."""
    from mppi_generic_tpu.models.racer_dubins_elevation import (
        _FRONT_X, _HALF_TRACK, static_settling,
    )
    from mppi_generic_tpu.utils import math_utils

    rng = np.random.RandomState(11)
    tex = MapTexture2D.create(rng.randn(64, 64).astype("f"),
                              origin=(-32, -32, 0), resolution=1.0)
    pos_x = jnp.asarray(rng.randn(9) * 10, jnp.float32)
    pos_y = jnp.asarray(rng.randn(9) * 10, jnp.float32)
    yaw = jnp.asarray(rng.randn(9), jnp.float32)
    roll = jnp.asarray(rng.randn(9) * 0.2, jnp.float32)
    pitch = jnp.asarray(rng.randn(9) * 0.2, jnp.float32)

    # oracle: the original quaternion-rotation corner positions
    q = math_utils.euler_to_quat(roll, pitch, yaw)
    world = jnp.stack([pos_x, pos_y, jnp.zeros_like(yaw)], axis=-1)
    corners = [(_FRONT_X, _HALF_TRACK), (_FRONT_X, -_HALF_TRACK),
               (0.0, _HALF_TRACK), (0.0, -_HALF_TRACK)]
    offs = jnp.stack([
        jnp.stack([jnp.full_like(yaw, bx), jnp.full_like(yaw, by),
                   jnp.zeros_like(yaw)], axis=-1)
        for bx, by in corners
    ])
    pts = world[None] + math_utils.quat_rotate(
        jnp.broadcast_to(q, (4,) + q.shape), offs
    )
    heights = tex.query_at_world_pose(pts)
    asin = math_utils.asin_approx
    fl, fr, rl, rr = heights[0], heights[1], heights[2], heights[3]
    oracle_roll = 0.5 * (
        asin(jnp.clip(fl - fr, -1.472, 1.472) / 1.474)
        + asin(jnp.clip(rl - rr, -1.472, 1.472) / 1.474)
    )
    oracle_pitch = 0.5 * (
        asin(jnp.clip(rl - fl, -2.98, 2.98) / 2.981)
        + asin(jnp.clip(rr - fr, -2.98, 2.98) / 2.981)
    )
    oracle_height = 0.5 * (rl + rr)

    got_roll, got_pitch, got_height = static_settling(
        tex, pos_x, pos_y, yaw, roll, pitch
    )
    np.testing.assert_allclose(got_roll, oracle_roll, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got_pitch, oracle_pitch, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got_height, oracle_height, rtol=1e-4,
                               atol=1e-5)


def test_map_mxu_precision_env_knob():
    """ADVICE r4 (amended r5): each allowed MPPI_MAP_MXU_PRECISION value
    must trace a STRUCTURALLY DISTINCT interpolation matmul — the r4 A/B
    probe's two arms compiled identical kernels. "high" cannot use
    lax.Precision.HIGH (Mosaic has no lowering for it at all:
    'Unsupported dot precision: HIGH'), so it is the HAND-ROLLED 3-pass
    bf16x3: THREE dot_generals over bf16 operand splits. Unknown values
    reject at import."""
    import subprocess
    import sys

    prog = (
        "import jax, mppi_generic_tpu.maps.texture as t;"
        "print(t._MAP_MXU_PRECISION);"
        "import jax.numpy as jnp;"
        "jx = jax.make_jaxpr(lambda d, w: t.MapTexture2D.create(d)"
        "._query_tex_pallas(w, w))"
        "(jnp.zeros((8, 8)), jnp.zeros((1, 128)));"
        "eqs = [e for e in jx.eqns if e.primitive.name == 'dot_general']"
        " or [e for sub in jx.eqns"
        " if (sub.params.get('jaxpr') or sub.params.get('call_jaxpr'))"
        " for e in (sub.params.get('jaxpr') or"
        " sub.params.get('call_jaxpr')).eqns"
        " if e.primitive.name == 'dot_general'];"
        "print('ndots', len(eqs));"
        "print([str(e.params.get('precision')) for e in eqs]);"
        "print([str(v.aval.dtype) for e in eqs for v in e.invars])"
    )
    import os

    for val, expects in (
        # exact f32: ONE dot at HIGHEST over f32 operands
        ("highest", ("ndots 1", "Precision.HIGHEST")),
        # hand-rolled bf16x3: THREE dots over bf16 operand splits
        ("high", ("ndots 3", "bfloat16")),
        # single-pass bf16: ONE dot at DEFAULT
        ("default", ("ndots 1", "Precision.DEFAULT")),
    ):
        env = dict(os.environ, MPPI_MAP_MXU_PRECISION=val,
                   JAX_PLATFORMS="cpu")
        out = subprocess.run(
            [sys.executable, "-c", prog], env=env, capture_output=True,
            text=True, timeout=300,
        )
        assert out.returncode == 0, out.stderr
        for expect in expects:
            assert expect in out.stdout, (val, expect, out.stdout)
    env = dict(os.environ, MPPI_MAP_MXU_PRECISION="hihgest",
               JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-c", "import mppi_generic_tpu.maps.texture"],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert out.returncode != 0 and "MPPI_MAP_MXU_PRECISION" in out.stderr


def test_bf16x3_tent_dot_accuracy():
    """The hand-rolled 3-pass decomposition lands ~4e-6 relative on a
    256-deep dot (measured; the dropped lo@lo term and bf16 residual
    rounding) — ~500x tighter than the reference's own 9-bit texture
    lerp (~2e-3) and ~3 orders tighter than single-pass bf16."""
    import os
    import subprocess
    import sys

    prog = (
        "import numpy as np, jax, jax.numpy as jnp;"
        "import mppi_generic_tpu.maps.texture as t;"
        "rng = np.random.default_rng(0);"
        "d = jnp.asarray(rng.normal(size=(256, 256)), jnp.float32);"
        "w = jnp.asarray(rng.uniform(0, 1, size=(256, 128)), jnp.float32);"
        "got = t._tent_dot(d, w);"
        "ref = np.asarray(d, np.float64) @ np.asarray(w, np.float64);"
        "rel = np.abs(np.asarray(got, np.float64) - ref).max()"
        " / np.abs(ref).max();"
        "print('rel', rel);"
        "assert rel < 1e-5, rel"
    )
    env = dict(os.environ, MPPI_MAP_MXU_PRECISION="high",
               JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, "-c", prog], env=env,
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr


def test_load_track_npz_reference_fixture():
    """Round-trip the EXACT fixture the reference's generateTestMaps.py
    writes (scripts/autorally/test/generateTestMaps.py: width=10,
    height=20, ppm=2, channelN[i, j] = counter * 10^N flattened
    row-major) and verify the loaded texture reproduces the reference's
    loadTrackData semantics (ar_standard_cost.cu:85-140): float4 ->
    channel-major planes, W = (x_max-x_min)*ppm, H = (y_max-y_min)*ppm,
    and the world->tex transform u = (x - x_min)/(x_max - x_min)."""
    from mppi_generic_tpu.maps import load_track_npz

    width, height, ppm = 10, 20, 2
    ch = np.zeros((4, width * ppm, height * ppm), np.float32)
    counter = 0
    for i in range(width * ppm):
        for j in range(height * ppm):
            counter += 1
            for c in range(4):
                ch[c, i, j] = counter * 10 ** c
    d = {
        "xBounds": np.array([-width / 2, width / 2], np.float32),
        "yBounds": np.array([-height / 2, height / 2], np.float32),
        "pixelsPerMeter": np.array([ppm], np.float32),
        **{f"channel{c}": ch[c].flatten() for c in range(4)},
    }
    tex = load_track_npz(d)
    W, H = width * ppm, height * ppm
    assert tex.channel_major and tex.data.shape == (4, H, W)
    assert tex.channels == 4 and (tex.height, tex.width) == (H, W)
    # the flat buffer is interpreted exactly as CUDA's linear texture
    # copy does: texel (x, y) = flat[y*W + x]
    flat = ch[0].flatten()
    for (ix, iy) in ((0, 0), (3, 7), (W - 1, H - 1)):
        # world position of the texel CENTER: u*W - 0.5 == ix exactly
        wx = -width / 2 + (ix + 0.5) / ppm
        wy = -height / 2 + (iy + 0.5) / ppm
        got = float(tex.query_world_components_channel(
            jnp.float32(wx), jnp.float32(wy), 0))
        np.testing.assert_allclose(got, flat[iy * W + ix], rtol=1e-6)
    # normalized-transform endpoints match the reference's R/trs scaling
    u, v = tex.world_to_tex_components(jnp.float32(-width / 2),
                                       jnp.float32(-height / 2))
    np.testing.assert_allclose([float(u), float(v)], [0.0, 0.0], atol=1e-6)
    u, v = tex.world_to_tex_components(jnp.float32(width / 2),
                                       jnp.float32(height / 2))
    np.testing.assert_allclose([float(u), float(v)], [1.0, 1.0], atol=1e-6)
    # a loaded track drives the AR cost end-to-end (channel-0 read)
    from mppi_generic_tpu.costs import ARStandardCost

    cost = ARStandardCost(costmap=tex)
    y = jnp.zeros(6).at[0].set(0.25).at[1].set(0.25)
    c, crash = cost.running_cost(y, jnp.zeros(2), jnp.float32(0),
                                 jnp.int32(0))
    assert np.isfinite(float(c))
