"""Native host-sampler library: build, correctness vs numpy implementations."""

import numpy as np
import pytest

from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.design import (
    convex,
    generate_geometry,
)
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine import native
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.ops import rng as rng_ops


@pytest.fixture(scope="module")
def lib_available():
    if not native.build():
        pytest.skip("native toolchain unavailable")
    return True


def test_native_sampling_inside_polygon(lib_available):
    geom = generate_geometry(num_fov_x=4, num_fov_y=3)
    pts = native.sample_points_in_polygon(geom.ic, 2000, seed=7)
    assert pts is not None and pts.shape == (2000, 2)
    inside = convex.point_in_or_on(pts[:, 0], pts[:, 1], geom.ic)
    assert inside.all()
    # uniformity: mean should be close to the pupil center
    np.testing.assert_allclose(pts.mean(axis=0), geom.design.ic_center, atol=0.15)


def test_native_sampling_deterministic(lib_available):
    geom = generate_geometry(num_fov_x=4, num_fov_y=3)
    a = native.sample_points_in_polygon(geom.ic, 100, seed=1)
    b = native.sample_points_in_polygon(geom.ic, 100, seed=1)
    c = native.sample_points_in_polygon(geom.ic, 100, seed=2)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_native_ray_blocks_match_python_seeding(lib_available):
    """The native SoA fill must produce the exact seed_fast RNG streams."""
    points = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    cell_ids = np.array([5, 17], dtype=np.int32)
    rpc, rp, seed = 6, 8, 42
    out = native.fill_ray_blocks(points, cell_ids, rpc, rp, seed, iter_offset=0)
    assert out is not None
    rays, rng = out
    assert rays.shape == (2, 6, 8) and rng.shape == (2, 8)
    # TE/TM halves
    np.testing.assert_array_equal(rays[0, 2, :3], [1, 1, 1])     # ter TE half
    np.testing.assert_array_equal(rays[0, 4, 3:6], [1, 1, 1])    # tmr TM half
    np.testing.assert_array_equal(rays[0, 2, 6:], [0, 0])        # padding
    np.testing.assert_array_equal(rays[0, 0, :3], points[:, 0].astype(np.float32))
    np.testing.assert_array_equal(rays[0, 0, 3:6], points[:, 0].astype(np.float32))
    # rng matches seed_fast on global indices cell_id*rpc + i
    for ci, cid in enumerate(cell_ids):
        idx = np.arange(rpc, dtype=np.uint64) + np.uint64(int(cid) * rpc)
        expect = rng_ops.seed_fast(idx, seed)
        np.testing.assert_array_equal(rng[ci, :rpc], expect)
        np.testing.assert_array_equal(rng[ci, rpc:], [1, 1])
