"""Ray seeding: pupil sampling and SoA batch construction.

Mirrors the reference driver's layout (gpu_ray_tracing_pro_fullColor.py:59-115): for
every (FoV_x, FoV_y, wavelength) cell, ``rays_per_fov`` rays start at sample points
inside the in-coupler pupil, the first half pure TE and the second half pure TM, with
the *same* sample points shared across all cells (and both polarizations) when
``shared_pupil_samples`` is set — the reference reuses one 2500-point set everywhere.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..config import TraceConfig
from ..design.convex import point_in_polygon
from ..design.geometry import DesignGeometry
from ..ops import rng as rng_ops


def sample_points_in_polygon(
    poly: np.ndarray, num: int, rng: np.random.Generator
) -> np.ndarray:
    """Rejection-sample ``num`` points uniformly inside a polygon (host-side).

    Same approach as the reference host helper ``generate_points_in_polygon``
    (GPU_ray_tracing_functions.py:12-23): uniform bbox proposals, 2x oversampling.
    """
    lo = poly.min(axis=0)
    hi = poly.max(axis=0)
    out = np.empty((0, 2))
    while len(out) < num:
        cand = rng.uniform(lo, hi, size=(2 * (num - len(out)) + 16, 2))
        keep = point_in_polygon(cand[:, 0], cand[:, 1], poly)
        out = np.concatenate([out, cand[keep]], axis=0)
    return out[:num]


_PLASTIC = 1.32471795724474602596  # plastic number, root of x^3 = x + 1


def sample_points_r2_disk(
    poly: np.ndarray, num: int, rng: np.random.Generator
) -> np.ndarray:
    """Randomized low-discrepancy points in the polygon's inscribed disk.

    The R2 lattice (additive recurrence with the plastic-number ratios) under
    a Cranley-Patterson rotation (one uniform 2-D shift drawn from ``rng``,
    making the estimator unbiased — randomized QMC), mapped square->disk with
    the concentric (Shirley-Chiu) map so stratification survives the warp.
    Points land in the polygon's *inscribed* circle (inradius = min
    center-to-edge distance), which for the reference's 100-gon in-coupler
    gives up only a ``1 - cos(pi/100) ~ 5e-4`` radius band while guaranteeing
    strict polygon containment for either ``ic_test`` mode.
    """
    # the IC ring closes with a (nearly) duplicated last vertex
    # (linspace(0, 2pi) is endpoint-inclusive); including it would bias the
    # vertex-mean center by ~r/N toward that vertex and shrink the inradius
    if len(poly) > 1 and np.hypot(*(poly[0] - poly[-1])) < 1e-9:
        poly = poly[:-1]
    center = poly.mean(axis=0)
    a = poly
    b = np.roll(poly, -1, axis=0)
    e = b - a
    elen = np.hypot(e[:, 0], e[:, 1])
    real = elen > 1e-12  # skip the zero-length closing edge of closed rings
    dist = np.abs(e[real, 0] * (center[1] - a[real, 1])
                  - e[real, 1] * (center[0] - a[real, 0])) / elen[real]
    r_in = float(dist.min())

    i = np.arange(num, dtype=np.float64)
    alpha = np.array([1.0 / _PLASTIC, 1.0 / _PLASTIC ** 2])
    u = (i[:, None] * alpha[None, :] + rng.uniform(0.0, 1.0, size=2)) % 1.0
    ab = 2.0 * u - 1.0
    ax, by = ab[:, 0], ab[:, 1]
    use_a = np.abs(ax) > np.abs(by)
    r = np.where(use_a, ax, by)
    phi = np.where(
        use_a,
        (np.pi / 4.0) * np.divide(by, ax, out=np.zeros_like(by),
                                  where=ax != 0.0),
        np.pi / 2.0 - (np.pi / 4.0) * np.divide(ax, by,
                                                out=np.zeros_like(ax),
                                                where=by != 0.0),
    )
    return center[None, :] + (r_in * r)[:, None] * np.stack(
        [np.cos(phi), np.sin(phi)], axis=1)


def build_ray_batch(
    geom: DesignGeometry,
    cfg: TraceConfig,
    cell_ids: Optional[np.ndarray] = None,
    rays_per_cell: Optional[int] = None,
    iteration: int = 0,
) -> dict:
    """Host-side SoA arrays for one trace batch.

    ``cell_ids``: flat cell indices (l*M + m)*N + n to seed; defaults to all cells.
    Returns numpy arrays: x, y, te, tm (complex), cid, idx, rng.
    """
    L, M, N = geom.th_out_ic.shape
    if cell_ids is None:
        cell_ids = np.arange(L * M * N)
    rpc = rays_per_cell if rays_per_cell is not None else cfg.rays_per_fov
    if rpc % 2:
        # the batch is half TE + half TM over the SAME pupil points
        # (gpu_ray_tracing_pro_fullColor.py:65-76); an odd count would leave
        # the SoA arrays mismatched in length
        raise ValueError(f"rays_per_fov must be even, got {rpc}")
    half = rpc // 2
    n_cells = len(cell_ids)
    total = n_cells * rpc

    def sample(n, rng, native_seed):
        if cfg.pupil_sampling == "r2":
            return sample_points_r2_disk(geom.ic, n, rng)
        if cfg.pupil_sampler == "native":
            from . import native

            pts = native.sample_points_in_polygon(geom.ic, n, seed=native_seed)
            if pts is not None:
                return pts
        return sample_points_in_polygon(geom.ic, n, rng)

    if cfg.shared_pupil_samples:
        host_rng = np.random.default_rng(cfg.seed + 7919 * iteration)
        pts = sample(half, host_rng, cfg.seed + 7919 * iteration)
        x = np.tile(np.concatenate([pts[:, 0], pts[:, 0]]), n_cells)
        y = np.tile(np.concatenate([pts[:, 1], pts[:, 1]]), n_cells)
    else:
        # one independent cell-id-keyed stream per cell: points depend only
        # on (seed, iteration, cell id), so results are invariant under
        # re-batching and two batches never silently reuse the same pupil
        # points (a single stream restarted per build_ray_batch call did
        # exactly that)
        xs = np.empty((n_cells, half))
        ys = np.empty((n_cells, half))
        for i, c in enumerate(np.asarray(cell_ids)):
            ss = np.random.SeedSequence(
                (cfg.seed, 7919 * iteration, int(c)))
            pts = sample(half, np.random.default_rng(ss),
                         int(ss.generate_state(1)[0]))
            xs[i], ys[i] = pts[:, 0], pts[:, 1]
        x = np.concatenate([xs, xs], axis=1).reshape(-1)
        y = np.concatenate([ys, ys], axis=1).reshape(-1)

    te = np.zeros(total, dtype=np.complex64)
    tm = np.zeros(total, dtype=np.complex64)
    pol_pattern = np.arange(rpc) < half  # True = TE
    pol = np.tile(pol_pattern, n_cells)
    te[pol] = 1.0
    tm[~pol] = 1.0

    cid = np.repeat(cell_ids.astype(np.int32), rpc)
    # globally stable ray index: independent of how cells are chunked into batches,
    # so results are bitwise invariant under re-batching.  Parity mode reproduces the
    # reference's global ordering (cells ordered (m, n, lambda),
    # gpu_ray_tracing_pro_fullColor.py:82-96).
    within = np.tile(np.arange(rpc, dtype=np.uint64), n_cells)
    total_cells = L * M * N
    if cfg.rng_mode == "parity":
        # Parity mode is single-iteration-only: the reference's num_iter loop
        # re-launches the kernel with the *same* ray arrays and RNG states that
        # carried over from the previous launch
        # (gpu_ray_tracing_pro_fullColor.py:169-177); reproducing that would
        # require threading final per-ray xorshift states across iterations.
        # Restarting the stream each iteration would silently duplicate samples,
        # so reject it instead.
        if iteration != 0:
            raise ValueError(
                "rng_mode='parity' supports a single iteration only "
                "(the reference carries RNG states across its re-launch loop); "
                "use num_iter=1 or rng_mode='fast'"
            )
        l = cell_ids // (M * N)
        mn = cell_ids % (M * N)
        ref_cell = (mn * L + l).astype(np.uint64)  # (m*N + n)*L + l
        idx = (np.repeat(ref_cell, rpc) * np.uint64(rpc) + within).astype(np.uint32)
        rng_state = rng_ops.seed_parity(idx)
    else:
        idx64 = (
            np.repeat(cell_ids.astype(np.uint64), rpc) * np.uint64(rpc) + within
            + np.uint64(iteration) * np.uint64(total_cells) * np.uint64(rpc)
        )
        idx = (idx64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        rng_state = rng_ops.seed_fast(idx64, cfg.seed)

    return {"x": x, "y": y, "te": te, "tm": tm, "cid": cid, "idx": idx,
            "rng": rng_state}
