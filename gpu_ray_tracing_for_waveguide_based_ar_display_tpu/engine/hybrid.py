"""Tail-patched transport: kill MC starvation of the eyebox-uniformity metric.

The reference's evaluation zeroes ``u_eyebox`` whenever ANY (FoV cell, eye
position) pupil window receives zero Monte-Carlo deposits
(AR_system_evaluation_functions.py:149-160), so at the reference's own default
budget (5,000 rays/FoV x 4 iters) the corner eye positions are starved and the
headline metric carries no information.  The fix is not "more rays everywhere"
— the starving windows have per-ray probabilities around 1e-4..1e-6 and sit in
a small tail of cells — but a *tail patch*: evaluate exactly that tail by a
separate, better-resolved pass and splice its rows into the per-cell
perception stack (which is per-cell in its leading axes, so the splice is a
2 MB row assignment, never a histogram-sized scatter).

Two tail engines:

- :class:`TailBoostHybrid` (production): the tail rows come from a boosted MC
  pass on the SAME persistent Pallas kernel — the per-cell spawn target is a
  runtime scalar (pipeline._pers_ctrl), so tier boosts of 4x..4096x the
  reference budget reuse the compiled kernel with zero recompiles and run at
  the kernel's full 3 G bounces/s.
- :class:`ExactTailHybrid` (exact): the tail rows are the zero-variance
  branch expectation from the per-cell splitting engine.  With the fast
  (one-hot/sort) splitting step this runs at ~4 ms/cell on v5e (was 155
  ms/cell on the gather-bound form), so it is viable as a production tail
  as well as the anchor for tests and convergence studies.

Unbiasedness (both engines, tested in tests/test_hybrid.py):

1. A **pilot** pass (an independent-seed MC run at the same budget, or an
   exact splitting pass) estimates every (cell, window) expected count.
2. **Selection + boost sizing** read ONLY the pilot — never the main run and
   never the tail pass itself.  The kept main-run rows are therefore not
   conditioned on their own noise (compare the naive "re-trace cells whose
   count came out low", which keeps upward-truncated rows), and the spliced
   rows are plain (boosted) MC or exact values — unbiased conditional on a
   selection they are independent of.  Every cell's final value comes from
   exactly one source.
3. MC branch roulette selects each branch with probability equal to its
   energy fraction and deposits unit weights (trace_jnp.bounce_step), so the
   splitting engine's weighted tiles per launch ray ARE per-ray MC deposit
   probabilities — the two tail engines estimate the same quantity.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import numpy as np

from ..config import EvalConfig
from ..eval.metrics import evaluate, eye_perceived_jnp, wavelength_channel_names


@dataclasses.dataclass
class HybridDiagnostics:
    selected_cells: int          # tail size (out of L*M*N)
    pilot_seconds: float
    tail_seconds: float
    mc_seconds: float
    tail_rays: int               # extra rays traced by the boost pass (0: exact)
    min_pilot_count: float       # smallest pilot window count over all cells
    min_tail_expected: float     # smallest post-boost expected window count
    tiers: dict                  # boost tier -> cell count (empty: exact)
    tau_select: float
    tau_target: float
    exact_pruned: float = 0.0    # splitting mode: sub-threshold pruned weight
    cell_tier: Optional[np.ndarray] = None   # per-selected-cell boost tier


def _cell_lnm(cells: np.ndarray, M: int, N: int):
    """Flat cell id (l*M + m)*N + n -> (l, n, m) perceive-stack indices."""
    l = cells // (M * N)
    m = (cells % (M * N)) // N
    n = cells % N
    return l, n, m


def _patched_result(sim, res, norm, selected, rows, sums, eval_cfg):
    """Splice tail rows into the perception stack; re-evaluate metrics and
    per-color efficiencies.  ``rows``/``sums`` are per-ray units."""
    import jax.numpy as jnp

    hist = res.histogram
    hist_dev = hist if not isinstance(hist, np.ndarray) else jnp.asarray(hist)
    perc = np.asarray(eye_perceived_jnp(hist_dev, eval_cfg)) / norm
    per_cell = np.asarray(jnp.sum(hist_dev, axis=(3, 4))) / norm  # (L, N, M)
    l, n, m = _cell_lnm(selected, sim.M, sim.N)
    mc_rows = perc[l, n, m].copy()
    perc[l, n, m] = rows
    per_cell[l, n, m] = sums
    met = evaluate(None, eval_cfg, perceive=perc)
    names = wavelength_channel_names(sim.L)
    # xL undoes the 1/L wavelength split of the launch budget (eval.metrics
    # .efficiencies semantics)
    eff = {names[i]: float(per_cell[i].sum() / (sim.M * sim.N))
           for i in range(sim.L)}
    return dataclasses.replace(res, metrics=met, efficiencies=eff), mc_rows


def _run_norm(sim, res, rays_per_fov, num_iter) -> float:
    """Mirror pipeline.run()'s histogram normalization (rays per cell)."""
    iters = num_iter if num_iter is not None else sim.cfg.num_iter
    cells_traced = sim.L * sim.M * sim.N * iters
    total = res.rays_traced
    if (sim.engine == "pallas_persistent"
            and (sim._spawn_iters > 0 or sim._spawn_mode == "count")):
        # rays_traced reports actual spawns; tiles are renormalized to nominal
        # units (pipeline._renorm_tiles), so normalize by the nominal target
        rpf = rays_per_fov if rays_per_fov is not None else sim.cfg.rays_per_fov
        total = rpf * cells_traced
    return total / cells_traced


class TailBoostHybrid:
    """MC bulk + tier-boosted MC tail on the persistent kernel.

    ``sim`` must be a ``pallas_persistent`` Simulator.  ``pilot_sim`` (same
    design, different cfg.seed) provides the selection pass; it shares
    ``sim``'s geometry/LUTs/kernel cache when built via
    :meth:`make_pilot_sim`.

    - ``tau_select``: a cell is tail-selected when its worst pilot window
      count is below this (pilot counts are ~Poisson; 50 keeps the miss
      probability of a truly-risky cell negligible).
    - ``tau_target``: post-boost expected count floor for the worst window;
      the boost factor per cell is ``1.5 * tau_target / pilot_count``
      rounded up to a power-of-``tier_base`` tier (P[window still empty]
      ~ exp(-tau_target) per pair).  Zero-count windows — the starved
      corners the feature exists for, where the pilot gives no rate
      information at all — escalate straight to ``max_boost``.
    - ``max_boost``: tier cap — bounds the tail cost for physics-dark windows.
    """

    def __init__(self, sim, pilot_sim=None, *, tau_select: float = 30.0,
                 tau_target: float = 20.0, tier_base: float = 2.0,
                 max_boost: float = 1024.0, cells_per_batch: int = 2048,
                 eval_cfg: EvalConfig = EvalConfig(),
                 pilot_seed_offset: int = 104729, tail=None):
        if sim.engine != "pallas_persistent":
            raise ValueError("TailBoostHybrid needs the persistent engine")
        self.sim = sim
        self.pilot_sim = pilot_sim or self.make_pilot_sim(
            sim, sim.cfg.seed + pilot_seed_offset)
        self.tau_select = tau_select
        self.tau_target = tau_target
        self.tier_base = tier_base
        self.max_boost = max_boost
        self.eval_cfg = eval_cfg
        self._cpb = cells_per_batch
        # (selected, rows, sums, diags fragment) cache.  ``tail`` is the
        # public share/carry handle: pass a previous ``build_tail()`` /
        # ``.tail`` result to reuse a tail across Simulators of the SAME
        # design + pilot seed (the tail depends on nothing else).  NOTE:
        # runs sharing a tail have identical spliced tail components — their
        # u_eyebox spread understates fully-independent reps.
        self._tail = tail

    @property
    def tail(self):
        """The built tail (or None): a shareable (selected, rows, sums,
        diagnostics) tuple — valid for any Simulator with the same design and
        pilot seed; pass it to ``TailBoostHybrid(..., tail=...)``."""
        return self._tail

    @staticmethod
    def make_pilot_sim(sim, seed: int):
        from .pipeline import Simulator

        cfg = dataclasses.replace(sim.cfg, seed=seed)
        pilot = Simulator(
            cfg=cfg, engine="pallas_persistent", geom=sim.geom, luts=sim.luts,
            persistent_slots=sim._persistent_slots,
            spawn_mode=sim._spawn_mode, fold_iterations=sim._fold_iterations,
            pers_accum_mode=sim._pers_accum_mode,
            pers_transit_jump=sim._pers_transit_jump)
        pilot._pers_cache = sim._pers_cache  # kernel is seed-independent
        return pilot

    # -- pilot + tier assignment ------------------------------------------
    def build_tail(self, rays_per_fov: Optional[int] = None,
                   num_iter: Optional[int] = None, **run_kw):
        """Pilot run -> selection -> boosted tail rows.  Cached per design."""
        import jax.numpy as jnp

        sim, pilot = self.sim, self.pilot_sim
        rpf = rays_per_fov if rays_per_fov is not None else sim.cfg.rays_per_fov
        iters = num_iter if num_iter is not None else sim.cfg.num_iter
        budget = rpf * iters

        t0 = time.perf_counter()
        run_kw.setdefault("histogram_device", True)
        pres = pilot.run(rays_per_fov=rays_per_fov, num_iter=num_iter,
                         evaluate_metrics=False, **run_kw)
        hist = pres.histogram
        hist_dev = (hist if not isinstance(hist, np.ndarray)
                    else jnp.asarray(hist))
        # raw pilot counts (nominal-sample units == deposit counts up to the
        # sub-1% spawn renormalization)
        counts = np.asarray(eye_perceived_jnp(hist_dev, self.eval_cfg))
        pnorm = _run_norm(pilot, pres, rays_per_fov, num_iter) * iters
        counts = counts * (budget / pnorm)
        pilot_s = time.perf_counter() - t0

        # Starvation is a property of the lambda-COMBINED luminance (evaluate's
        # y_chan sums the wavelength channels through the drive weights, all
        # positive) — per-lambda thresholds would select ~97% of the grid
        # (measured), combined thresholds a corner band.  A group = one
        # (FoVy, FoVx) site; its 3 lambda cells are boosted together so the
        # patched color at risky sites is fully re-resolved.
        comb = counts.sum(axis=0)                    # (fy, fx, py, px)
        worst = comb.min(axis=(2, 3)).reshape(-1)    # flat (fy=n, fx=m) groups
        gsel = np.where(worst < self.tau_select)[0]
        min_pilot = float(worst.min()) if len(worst) else 0.0

        # tier sizing: the pilot count w is ~Poisson(m); for w >= 1 the true
        # mean satisfies m >= w/1.5 with overwhelming probability at the w
        # ranges that matter, so boost = 1.5*tau_target/w puts the post-boost
        # expectation above tau_target (P[window still empty] ~ e^-tau_target
        # per pair; measured tail cost ~2x the base run at reference scale).
        # w == 0 gives no rate information at all — these are exactly the
        # starved corner windows the feature targets, so they escalate
        # straight to max_boost (a 1/max_boost-of-budget true mean still
        # lands ~tau_target expected counts post-boost)
        wsel = worst[gsel]
        boost = np.where(
            wsel <= 0.0, self.max_boost,
            np.clip(1.5 * self.tau_target / np.where(wsel > 0.0, wsel, 1.0),
                    self.tier_base, self.max_boost))
        gtier = np.minimum(
            self.tier_base ** np.ceil(np.log(boost) / np.log(self.tier_base)),
            self.max_boost)

        # group (n, m) -> its 3 lambda cell ids (l*M + m)*N + n
        L, M, N = sim.L, sim.M, sim.N
        gn, gm = gsel // M, gsel % M
        t0 = time.perf_counter()
        epy, epx = counts.shape[3:]
        rows = np.zeros((L * len(gsel), epy, epx), np.float64)
        sums = np.zeros(L * len(gsel), np.float64)
        cell_of = np.zeros(L * len(gsel), np.int64)
        tier_of = np.zeros(L * len(gsel), np.float64)
        tail_rays = 0
        tiers = {}
        min_exp = np.inf
        pos = 0
        for tier in np.unique(gtier):
            gmask = gtier == tier
            idx = np.where(gmask)[0]
            cells = np.sort(np.concatenate([
                (l * M + gm[idx]) * N + gn[idx] for l in range(L)]))
            tiers[int(tier)] = int(len(idx))
            tier_rpf = int(tier * budget)
            t_rows, t_sums, n_rays = self._tail_pass(cells, tier_rpf)
            rows[pos:pos + len(cells)] = t_rows
            sums[pos:pos + len(cells)] = t_sums
            cell_of[pos:pos + len(cells)] = cells
            tier_of[pos:pos + len(cells)] = tier
            pos += len(cells)
            tail_rays += n_rays
            # post-boost combined worst-window expectation for this tier
            li, ni, mi = _cell_lnm(cells, M, N)
            g_of = ni * M + mi
            order = np.argsort(g_of, kind="stable")
            gsum = t_rows[order].reshape(len(idx), L, epy, epx).sum(axis=1)
            min_exp = min(min_exp, float(gsum.min(axis=(1, 2)).min()
                                         * tier_rpf))
        tail_s = time.perf_counter() - t0
        order = np.argsort(cell_of, kind="stable")
        self._tail = (cell_of[order], rows[order], sums[order], dict(
            pilot_seconds=pilot_s, tail_seconds=tail_s, tail_rays=tail_rays,
            min_pilot_count=min_pilot,
            min_tail_expected=(0.0 if not len(gsel) else float(min_exp)),
            tiers=tiers, cell_tier=tier_of[order]))
        return self._tail

    def _tail_pass(self, cells: np.ndarray, tier_rpf: int):
        """Boosted MC over ``cells`` at ``tier_rpf`` rays/cell -> per-ray
        (C, epy, epx) window rows + (C,) tile sums.  Independent sample
        stream: the seeding iteration tag is displaced far beyond any main-run
        iteration index."""
        import jax.numpy as jnp

        from . import seeding

        sim = self.sim
        ny, nx = sim.cfg.eyebox_bins
        rows, sums, total = [], [], 0
        for s in range(0, len(cells), self._cpb):
            chunk = cells[s:s + self._cpb]
            slots, _ = sim._slots_gens(tier_rpf)
            batch = seeding.build_ray_batch(
                sim.geom, sim.cfg, cell_ids=chunk, rays_per_cell=slots,
                iteration=1_000_003 + int(np.log2(max(tier_rpf, 2))))
            tiles, nb, n = sim._trace_batch_tiles(batch, chunk, tier_rpf)
            nbh = np.asarray(nb)
            if nbh.shape[1] > 3 and int(nbh[:, 3].sum()):
                raise RuntimeError(
                    "tail pass overflowed kernel staging slots — lower "
                    "flush_w or the boost tier")
            perc = eye_perceived_jnp(tiles[:, :, :nx], self.eval_cfg)
            rows.append(np.asarray(perc, np.float64) / tier_rpf)
            sums.append(np.asarray(
                jnp.sum(tiles[:, :, :nx], axis=(1, 2)), np.float64) / tier_rpf)
            total += n
        return (np.concatenate(rows), np.concatenate(sums), total)

    # -- full hybrid run ----------------------------------------------------
    def run(self, rays_per_fov: Optional[int] = None,
            num_iter: Optional[int] = None, **run_kw):
        """Main MC run + tail splice -> (SimulationResult, HybridDiagnostics).

        The tail (pilot + boost passes) is built once per design and reused
        across repeated runs — it depends only on (design, pilot seed)."""
        if self._tail is None:
            self.build_tail(rays_per_fov, num_iter, **dict(run_kw))
        selected, rows, sums, frag = self._tail

        run_kw.setdefault("histogram_device", True)
        run_kw["evaluate_metrics"] = False
        t0 = time.perf_counter()
        res = self.sim.run(rays_per_fov=rays_per_fov, num_iter=num_iter,
                           **run_kw)
        mc_s = time.perf_counter() - t0
        iters = num_iter if num_iter is not None else self.sim.cfg.num_iter
        norm = _run_norm(self.sim, res, rays_per_fov, num_iter) * iters
        res, mc_rows = _patched_result(
            self.sim, res, norm, selected, rows, sums, self.eval_cfg)
        self.last_mc_rows = mc_rows
        self.last_selected = selected
        diags = HybridDiagnostics(
            selected_cells=int(len(selected)), mc_seconds=mc_s,
            tau_select=self.tau_select, tau_target=self.tau_target, **frag)
        return res, diags


class ExactTailHybrid:
    """MC bulk + zero-variance splitting tail (exact branch expectation).

    The tail engine is engine/splitting.py's per-cell wavefront tracer; the
    pilot is an exact pass over a coarse FoV subgrid, min-pooled to the fine
    grid (conservative: the coarse field upper-bounds no fine cell).  On the
    current TPU backend the splitting step is gather-bound (~155 ms/cell
    measured), so this class is the *anchoring* implementation — tests verify
    TailBoostHybrid against it on small grids.

    - ``tau``: expected-count threshold on the pilot's worst window.
    - ``threshold``: splitting prune threshold; per-tree peak width grows
      steeply below 1e-6 (measured: 3.4k slots/launch point at 1e-6, 18k at
      1e-7, 74k at 1e-8), so ``capacity`` must track it.  Pruned weight is
      ledgered in the diagnostics — it bounds the tail rows' bias.
    """

    def __init__(self, sim, *, tau: float = 20.0, stride: int = 4,
                 pilot_points: int = 4, exact_points: int = 16,
                 points_per_pass: int = 4, threshold: float = 1e-6,
                 capacity: int = 32768, max_steps: int = 4096,
                 cells_per_batch: Optional[int] = None,
                 eval_cfg: EvalConfig = EvalConfig(), pilot_seed: int = 99991):
        from . import splitting

        self.sim = sim
        self.tau = tau
        self.stride = stride
        self.eval_cfg = eval_cfg
        self.pilot_points = pilot_points
        self.exact_points = exact_points
        # per-tree peak widths add across simultaneously-launched points, so
        # points beyond this run as separate accumulation passes (each pass is
        # exact for its points; the mean over passes is exact for the union)
        self.points_per_pass = points_per_pass
        self._seed = pilot_seed
        self._trace = splitting.make_splitting_cells_fn(
            sim.tables, sim.tgeom, sim.cfg, capacity=capacity,
            weight_threshold=threshold, max_steps=max_steps)
        self._capacity = capacity
        self._cpb = cells_per_batch or max(1, (1 << 22) // capacity)
        self._exact = None

    def _seeds(self, num_points: int, seed: int):
        """Shared RQMC pupil launch seeds (R2 lattice + Cranley-Patterson
        rotation, seeding.sample_points_r2_disk) in the MC seeder's
        TE-then-TM layout."""
        import jax.numpy as jnp

        from . import seeding

        rng = np.random.default_rng(seed)
        pts = seeding.sample_points_r2_disk(self.sim.geom.ic, num_points, rng)
        x = np.concatenate([pts[:, 0], pts[:, 0]])
        y = np.concatenate([pts[:, 1], pts[:, 1]])
        te = np.concatenate([np.ones(num_points), np.zeros(num_points)])
        tm = np.concatenate([np.zeros(num_points), np.ones(num_points)])
        z = np.zeros(2 * num_points, np.float32)
        return {
            "x": jnp.asarray(x, jnp.float32), "y": jnp.asarray(y, jnp.float32),
            "ter": jnp.asarray(te, jnp.float32), "tei": jnp.asarray(z),
            "tmr": jnp.asarray(tm, jnp.float32), "tmi": jnp.asarray(z),
        }

    def _exact_perceive(self, cells: np.ndarray, points: int, seed: int):
        """(C, epy, epx) per-ray window probabilities + (C,) tile sums."""
        import jax.numpy as jnp

        ppp = min(points, self.points_per_pass)
        rows, sums = [], []
        trunc = pruned = 0.0
        for s in range(0, len(cells), self._cpb):
            chunk = jnp.asarray(cells[s:s + self._cpb], jnp.int32)
            tiles_acc = out_acc = None
            for g in range(0, points, ppp):
                seeds = self._seeds(min(ppp, points - g), seed + 31 * g)
                tiles, out_w, tr, pr, _steps, _peak = self._trace(chunk, seeds)
                tiles_acc = tiles if tiles_acc is None else tiles_acc + tiles
                out_acc = out_w if out_acc is None else out_acc + out_w
                trunc += float(jnp.sum(tr))
                pruned += float(jnp.sum(pr))
            rows.append(np.asarray(
                eye_perceived_jnp(tiles_acc, self.eval_cfg)))
            sums.append(np.asarray(out_acc))
        n_rays = 2 * points  # TE + TM branch trees per launch point
        rows = np.concatenate(rows, axis=0) / n_rays
        sums = np.concatenate(sums, axis=0) / n_rays
        if trunc > 0:
            raise RuntimeError(
                f"splitting wavefront truncated {trunc:.3g} weight at "
                f"capacity {self._capacity} — the exact-tail guarantee is "
                "void; raise capacity")
        return rows, sums, pruned

    def select(self) -> np.ndarray:
        """Starvation-risk cell ids — a pure function of (design, pilot
        seed), independent of every MC sample."""
        sim = self.sim
        L, M, N = sim.L, sim.M, sim.N
        ms = np.arange(0, M, self.stride)
        ns = np.arange(0, N, self.stride)
        if ms[-1] != M - 1:
            ms = np.append(ms, M - 1)
        if ns[-1] != N - 1:
            ns = np.append(ns, N - 1)
        ll, mm, nn = np.meshgrid(np.arange(L), ms, ns, indexing="ij")
        coarse = ((ll * M + mm) * N + nn).reshape(-1)
        t0 = time.perf_counter()
        rows, _sums, _pr = self._exact_perceive(
            coarse, self.pilot_points, self._seed)
        self._pilot_seconds = time.perf_counter() - t0
        epy, epx = rows.shape[1:]
        grid = rows.reshape(L, len(ms), len(ns), epy, epx)

        # conservative upsample: each fine (m, n) takes the elementwise MIN
        # of its bracketing coarse nodes; tau carries the curvature margin
        mi = np.searchsorted(ms, np.arange(M), side="right") - 1
        mi_hi = np.minimum(mi + 1, len(ms) - 1)
        ni = np.searchsorted(ns, np.arange(N), side="right") - 1
        ni_hi = np.minimum(ni + 1, len(ns) - 1)
        g = grid
        cand = np.minimum(
            np.minimum(g[:, mi][:, :, ni], g[:, mi][:, :, ni_hi]),
            np.minimum(g[:, mi_hi][:, :, ni], g[:, mi_hi][:, :, ni_hi]),
        )  # (L, M, N, epy, epx)
        budget = float(sim.cfg.rays_per_fov * sim.cfg.num_iter)
        expected = budget * cand.min(axis=(3, 4))
        self._min_expected = float(expected.min())
        # flat (l, m, n) order == the engine's cell-id layout
        return np.sort(np.where(
            (expected < self.tau).reshape(-1))[0]).astype(np.int64)

    def run(self, rays_per_fov: Optional[int] = None,
            num_iter: Optional[int] = None, exact_seed: int = 1_000_003,
            **run_kw):
        """MC run + exact-tail splice -> (SimulationResult, diagnostics)."""
        if self._exact is None:
            selected = self.select()
            t0 = time.perf_counter()
            rows, sums, pruned = (
                self._exact_perceive(selected, self.exact_points, exact_seed)
                if len(selected) else
                (np.zeros((0, 1, 1)), np.zeros((0,)), 0.0))
            self._exact = (selected, rows, sums, pruned,
                           time.perf_counter() - t0)
        selected, rows, sums, pruned, exact_s = self._exact

        run_kw.setdefault("histogram_device", True)
        run_kw["evaluate_metrics"] = False
        t0 = time.perf_counter()
        res = self.sim.run(rays_per_fov=rays_per_fov, num_iter=num_iter,
                           **run_kw)
        mc_s = time.perf_counter() - t0
        iters = num_iter if num_iter is not None else self.sim.cfg.num_iter
        norm = _run_norm(self.sim, res, rays_per_fov, num_iter) * iters
        res, mc_rows = _patched_result(
            self.sim, res, norm, selected, rows, sums, self.eval_cfg)
        self.last_mc_rows = mc_rows
        self.last_selected = selected
        diags = HybridDiagnostics(
            selected_cells=int(len(selected)),
            pilot_seconds=self._pilot_seconds, tail_seconds=exact_s,
            mc_seconds=mc_s, tail_rays=0,
            min_pilot_count=self._min_expected,
            min_tail_expected=self._min_expected, tiers={},
            tau_select=self.tau, tau_target=self.tau, exact_pruned=pruned)
        return res, diags
