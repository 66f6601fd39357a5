"""Unit tests of engine primitives against the numpy oracle implementations."""

import math

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine import oracle
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.ops import rng as rng_ops


def test_xorshift32_matches_oracle():
    states = np.array([1, 2, 12345, 0x9E3779B9, 0xFFFFFFFF], dtype=np.uint32)
    expected = np.array([oracle.xorshift32(int(s)) for s in states], dtype=np.uint32)
    got = np.asarray(rng_ops.xorshift32_step(jnp.asarray(states)))
    assert np.array_equal(got, expected)


def test_draw_uniform_matches_oracle_sequence():
    n = 64
    idx = np.arange(n, dtype=np.uint32)
    state = rng_ops.seed_parity(idx)
    jstate = jnp.asarray(state)
    ostate = state.astype(np.int64).copy()
    for _ in range(5):
        u_j, jstate = rng_ops.draw_uniform(
            jstate, jnp.asarray(idx), jnp.ones(n, bool)
        )
        u_o = np.empty(n)
        for i in range(n):
            u_o[i], ostate[i] = oracle.uniform_from_state(int(ostate[i]), i)
        # the engine draws from the top 24 bits (float32-exact); the oracle keeps
        # the reference's full 32-bit/float64 draw — equal to < 2^-24
        np.testing.assert_allclose(
            np.asarray(u_j), u_o.astype(np.float32), atol=1.0 / 16777216.0
        )
    assert np.array_equal(np.asarray(jstate), ostate.astype(np.uint32))


def test_draw_uniform_zero_state_reseeds():
    idx = np.array([3], dtype=np.uint32)
    u_j, s_j = rng_ops.draw_uniform(
        jnp.zeros(1, jnp.uint32), jnp.asarray(idx), jnp.ones(1, bool)
    )
    u_o, s_o = oracle.uniform_from_state(0, 3)
    assert abs(float(u_j[0]) - u_o) < 1e-6
    assert int(s_j[0]) == s_o


def test_draw_uniform_masked_does_not_advance():
    idx = np.arange(4, dtype=np.uint32)
    state = rng_ops.seed_parity(idx)
    mask = jnp.asarray([True, False, True, False])
    _, new_state = rng_ops.draw_uniform(jnp.asarray(state), jnp.asarray(idx), mask)
    new_state = np.asarray(new_state)
    assert np.array_equal(new_state[[1, 3]], state[[1, 3]])
    assert not np.array_equal(new_state[[0, 2]], state[[0, 2]])


def test_complex_state_equivalent_to_e_field_cal():
    """The complex 2-vector polarization form must match the reference's
    (|te|, |tm|, delta) form up to a global phase, for random Jones matrices."""
    rng = np.random.default_rng(0)
    for _ in range(200):
        ete, etm = rng.uniform(0, 1, 2)
        delta = rng.uniform(-np.pi, np.pi)
        j = rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
        # oracle form
        oa, ob, od = oracle.e_field_cal(ete, etm, delta, j[0, 0], j[0, 1], j[1, 0], j[1, 1])
        # complex-state form
        te_c = ete + 0j
        tm_c = etm * np.exp(1j * delta)
        te_o = j[0, 0] * te_c + j[0, 1] * tm_c
        tm_o = j[1, 0] * te_c + j[1, 1] * tm_c
        assert abs(abs(te_o) - oa) < 1e-12
        assert abs(abs(tm_o) - ob) < 1e-12
        if abs(te_o) > 1e-12 and abs(tm_o) > 1e-12:
            rel = np.angle(tm_o) - np.angle(te_o)
            rel = (rel + np.pi) % (2 * np.pi) - np.pi
            assert abs(rel - od) < 1e-9


def test_tir_phase_add_is_phasor_multiply():
    """delta += tir in (abs, delta) form == tm *= e^{i tir} in complex form."""
    rng = np.random.default_rng(1)
    ete, etm = 0.6, 0.8
    delta = 0.3
    tir = rng.uniform(-np.pi, np.pi)
    # abs/delta route
    d2 = oracle._wrap_pi(delta + tir)
    # complex route
    tm_c = etm * np.exp(1j * delta) * np.exp(1j * tir)
    rel = np.angle(tm_c) - 0.0
    rel = (rel + np.pi) % (2 * np.pi) - np.pi
    assert abs(rel - d2) < 1e-12


def test_seed_fast_device_bitwise_matches_host():
    """The uint32-pair splitmix emulation must reproduce the host uint64 hash
    bit for bit (the pipeline seeds all cells on device with it)."""
    import jax.numpy as jnp
    import numpy as np

    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.ops import rng

    r = np.random.default_rng(11)
    idx = r.integers(0, 2**32, size=65536, dtype=np.uint64)
    # include the edge indices
    idx[:4] = [0, 1, 2**32 - 1, 2**31]
    for seed in (0, 1, 42, 2**31 - 1):
        want = rng.seed_fast(idx, seed)
        got = np.asarray(rng.seed_fast_device(
            jnp.asarray(idx.astype(np.uint32)), seed))
        np.testing.assert_array_equal(want, got)


def test_lut_find_position_first_match_contract():
    """Vectorized rebuild keeps the reference's first-match-below-tol scan
    order (GPU_ray_tracing_functions.py:110-122), not the global minimum."""
    rs = np.random.RandomState(7)
    J, K = 9, 11
    lut = np.zeros((2, J, K))
    lut[0] = rs.uniform(-1, 1, (J, K))
    lut[1] = rs.uniform(-3, 3, (J, K))

    def ref_scalar(theta, phi):
        for j in range(J):
            for k in range(K):
                dt, dp = theta - lut[0, j, k], phi - lut[1, j, k]
                if dt * dt + dp * dp < 1e-5:
                    return j, k, True
        return -1, -1, False

    # queries: exact grid hits, near-hits with multiple in-range cells
    # (duplicate a grid point so scan order matters), and guaranteed misses
    lut[0, 5, 5], lut[1, 5, 5] = lut[0, 2, 3], lut[1, 2, 3]
    qs = [(lut[0, 2, 3], lut[1, 2, 3]), (lut[0, 8, 0] + 1e-4, lut[1, 8, 0]),
          (99.0, 99.0), (lut[0, 0, 0], lut[1, 0, 0] + 3e-3)]
    for theta, phi in qs:
        assert oracle.lut_find_position(lut, theta, phi) == ref_scalar(theta, phi)
    # vectorized over all queries at once
    th = np.array([q[0] for q in qs])
    ph = np.array([q[1] for q in qs])
    j, k, f = oracle.lut_find_position(lut, th, ph)
    exp = [ref_scalar(t, p) for t, p in qs]
    assert list(j) == [e[0] for e in exp]
    assert list(k) == [e[1] for e in exp]
    assert list(f) == [e[2] for e in exp]


# ---- seeding contracts (engine/seeding.py) ------------------------------------------


def test_build_ray_batch_rejects_odd_rays_per_fov():
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.config import TraceConfig
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.design import (
        generate_geometry,
    )
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine import seeding

    geom = generate_geometry(num_fov_x=2, num_fov_y=2)
    cfg = TraceConfig(num_fov_x=2, num_fov_y=2, rays_per_fov=5)
    with pytest.raises(ValueError, match="even"):
        seeding.build_ray_batch(geom, cfg)


def test_unshared_pupil_samples_rebatch_invariant():
    """Non-shared pupil sampling keys each cell's points by cell id: two
    batches covering the same cell draw identical points, and different cells
    never share points (the former single-restarted stream gave every batch
    the SAME leading points, duplicating samples across batches)."""
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.config import TraceConfig
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.design import (
        generate_geometry,
    )
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine import seeding

    geom = generate_geometry(num_fov_x=2, num_fov_y=2)
    cfg = TraceConfig(num_fov_x=2, num_fov_y=2, rays_per_fov=16,
                      shared_pupil_samples=False, seed=3)
    full = seeding.build_ray_batch(geom, cfg, cell_ids=np.arange(12))
    part = seeding.build_ray_batch(geom, cfg, cell_ids=np.arange(6, 12))
    # cell 6's points in the full batch == cell 6's points in the partial batch
    np.testing.assert_array_equal(full["x"][6 * 16:7 * 16],
                                  part["x"][:16])
    np.testing.assert_array_equal(full["y"][6 * 16:7 * 16],
                                  part["y"][:16])
    # different cells draw different points
    assert not np.array_equal(full["x"][:16], full["x"][16:32])


def test_r2_disk_center_unbiased_by_closing_vertex():
    """The R2 sampler's disk center must be the ring centroid, not the vertex
    mean including the duplicated closing vertex of the IC circle."""
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.design import (
        generate_geometry,
    )
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.seeding import (
        sample_points_r2_disk,
    )

    geom = generate_geometry(num_fov_x=2, num_fov_y=2)
    d = geom.design
    pts = sample_points_r2_disk(geom.ic, 200_000, np.random.default_rng(0))
    center = pts.mean(axis=0)
    # sample mean within 2e-3 mm of the true pupil center (the closing-vertex
    # bias was ~r/N = 0.02 mm)
    assert abs(center[0] - d.ic_center[0]) < 2e-3
    assert abs(center[1] - d.ic_center[1]) < 2e-3
