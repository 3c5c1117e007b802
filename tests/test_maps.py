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
