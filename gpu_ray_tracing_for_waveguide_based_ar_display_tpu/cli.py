"""Command-line interface.

The reference has no CLI (parameters are edited in-source, README.md:94-98); this
provides the same workflows as commands::

    python -m gpu_ray_tracing_for_waveguide_based_ar_display_tpu simulate [...]
    python -m gpu_ray_tracing_for_waveguide_based_ar_display_tpu plot-design [...]
    python -m gpu_ray_tracing_for_waveguide_based_ar_display_tpu sweep [...]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

import numpy as np

from .config import TraceConfig
from .models import presets


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--design", default="paper_default",
                   choices=sorted(presets.PRESETS), help="design preset")
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="FIELD=VALUE",
                   help="override a WaveguideDesign field of the preset "
                        "(repeatable; the reference edits these in-source, "
                        "couplers_coor.py:124-188), e.g. --set lambda_ic=380 "
                        "--set phi_ic=-0.67; tuple fields take comma lists: "
                        "--set eyebox_center=1,15")
    p.add_argument("--fov-x", type=int, default=100, help="FoV grid columns")
    p.add_argument("--fov-y", type=int, default=75, help="FoV grid rows")
    p.add_argument("--luts-dir", default=None,
                   help="directory with lut_*_fullColor.npy (synthetic if absent)")
    p.add_argument("--seed", type=int, default=0)


def _design(args):
    """The chosen preset with any ``--set FIELD=VALUE`` overrides applied."""
    d = presets.get(args.design)
    fields = {f.name: f for f in dataclasses.fields(d)}
    repl = {}
    for ov in args.overrides:
        key, sep, val = ov.partition("=")
        key = key.strip()
        if not sep or key not in fields:
            raise SystemExit(
                f"--set expects FIELD=VALUE with a WaveguideDesign field; "
                f"got {ov!r} (fields: {', '.join(sorted(fields))})")
        cur = getattr(d, key)
        try:
            if isinstance(cur, tuple):
                elem = type(cur[0]) if cur else float
                repl[key] = tuple(elem(v) for v in val.split(","))
            elif isinstance(cur, bool):
                repl[key] = val.strip().lower() in ("1", "true", "yes")
            elif isinstance(cur, int):
                repl[key] = int(val)
            else:
                repl[key] = float(val)
        except ValueError:
            raise SystemExit(f"--set {key}: cannot parse {val!r} as "
                             f"{type(cur).__name__}")
    return dataclasses.replace(d, **repl) if repl else d


def cmd_simulate(args) -> int:
    from .engine.pipeline import Simulator, format_report
    from .eval.image import save_eyebox_center_view

    if args.fetch_luts:
        from .luts.io import fetch_luts

        if fetch_luts(args.fetch_luts):
            print(f"fetched reference LUTs into {args.fetch_luts}")
            args.luts_dir = args.fetch_luts
        else:
            print(f"LUT fetch failed (offline?); falling back to "
                  f"{'--luts-dir' if args.luts_dir else 'synthetic LUTs'}")
    mesh = None
    if args.mesh:
        import jax
        from jax.sharding import Mesh

        if args.engine != "pallas_persistent":
            # Simulator only threads the mesh through the persistent tracer;
            # silently running single-device would defeat the flag's purpose
            raise SystemExit(
                "--mesh requires --engine pallas_persistent (the other "
                "engines run single-device; the jnp engine's mesh path is "
                "the parallel.shard API)")
        devs = jax.devices()
        if len(devs) < args.mesh:
            raise SystemExit(
                f"--mesh {args.mesh}: only {len(devs)} device(s) visible "
                f"(use XLA_FLAGS=--xla_force_host_platform_device_count=N "
                f"JAX_PLATFORMS=cpu for a virtual mesh)")
        mesh = Mesh(np.asarray(devs[:args.mesh]), ("cells",))
    # fail fast on missing optional viz deps BEFORE the expensive trace: the
    # dense-eyebox / heatmap exports import matplotlib only after the full
    # simulation, which used to throw the ImportError away with the run
    # (ADVICE r3)
    needs_mpl = [name for flag, name in (
        (args.dense_eyebox and args.dense_eyebox != "-", "--dense-eyebox PNG"),
        (args.heatmaps, "--heatmaps"),
    ) if flag]
    if needs_mpl:
        try:
            import matplotlib  # noqa: F401
        except ImportError:
            raise SystemExit(
                f"matplotlib is required for {', '.join(needs_mpl)} — "
                "install the viz extra (pip install '.[viz]') or drop the "
                "PNG export (use '--dense-eyebox -' for metrics only)")
    cfg = TraceConfig(
        num_fov_x=args.fov_x, num_fov_y=args.fov_y,
        rays_per_fov=args.rays_per_fov, num_iter=args.num_iter,
        max_bounces=args.max_bounces, seed=args.seed,
        pupil_sampling=args.pupil_sampling,
    )
    sim = Simulator(design=_design(args), cfg=cfg,
                    luts_dir=args.luts_dir,
                    geometry_simplify_tol=args.simplify_tol,
                    engine=args.engine, spawn_iters=args.spawn_iters,
                    spawn_mode=args.spawn_mode,
                    fold_iterations=args.fold_iterations,
                    pers_accum_mode=args.accum_mode, mesh=mesh)
    wl = (tuple(int(w) for w in args.wavelengths.split(","))
          if args.wavelengths else None)
    from .utils import xla_trace

    diags = None
    if args.tail_boost and args.tail_exact:
        raise SystemExit("choose ONE of --tail-boost / --tail-exact")
    if args.tail_boost or args.tail_exact:
        # MC bulk + starvation tail (engine/hybrid.py): the reference's
        # u_eyebox min is zeroed by MC-starved corner windows at default
        # budgets (AR_system_evaluation_functions.py:149-160); the hybrid
        # re-resolves exactly that tail and splices it in unbiasedly —
        # tier-boosted MC (--tail-boost) or the zero-variance branch
        # expectation from the per-cell splitting engine (--tail-exact)
        which = "--tail-boost" if args.tail_boost else "--tail-exact"
        if args.tail_boost and args.engine != "pallas_persistent":
            raise SystemExit(
                "--tail-boost requires --engine pallas_persistent (the "
                "boost tiers reuse the persistent kernel's runtime spawn "
                "target)")
        for flag, name in ((args.error_bars, "--error-bars"),
                           (args.dense_eyebox, "--dense-eyebox"),
                           (args.checkpoint, "--checkpoint"),
                           (args.wavelengths, "--wavelengths"),
                           (mesh, "--mesh")):
            if flag:
                raise SystemExit(
                    f"{which} does not compose with {name} (the tail "
                    "splice patches the single-run perception stack)")
        if args.tail_boost:
            from .engine.hybrid import TailBoostHybrid

            hy = TailBoostHybrid(sim, tau_select=args.tail_tau_select,
                                 tau_target=args.tail_tau_target,
                                 max_boost=args.tail_max_boost)
        else:
            from .engine.hybrid import ExactTailHybrid

            # one launch point per pass = two (TE, TM) branch trees in the
            # buffer at once, keeping the per-cell wavefront peak under 8192
            # slots at the 1e-6 threshold (two trees measured 7,692 peak on
            # the full grid — demo_metrics 'exact_fullgrid')
            hy = ExactTailHybrid(sim, tau=args.tail_tau_select,
                                 points_per_pass=1, capacity=8192,
                                 max_steps=1024)
        with xla_trace(args.profile_dir or None):
            res, diags = hy.run(cells_per_batch=args.cells_per_batch,
                                verbose=args.verbose)
    else:
        # device-side metric colorimetry (one f32 jit, ~1e-4 rel of the host
        # path) whenever the eye-view image is not requested — it is the only
        # consumer of the host path's output_image
        with xla_trace(args.profile_dir or None):
            res = sim.run(cells_per_batch=args.cells_per_batch,
                          verbose=args.verbose, wavelengths=wl,
                          checkpoint_path=args.checkpoint,
                          histogram_device=(args.engine == "pallas_persistent"),
                          metrics_device=(args.engine == "pallas_persistent"
                                          and not args.image),
                          error_groups=args.error_bars,
                          dense_metrics=bool(args.dense_eyebox))
    print(format_report(res))
    if diags is not None and diags.tail_rays > 0:
        tiers = ", ".join(
            f"{int(k)}x:{v}" for k, v in sorted(diags.tiers.items()))
        print(
            f"  [tail boost: {diags.selected_cells} starvation-risk cells "
            f"(worst pilot window < {diags.tau_select:g}) re-resolved by "
            f"{diags.tail_rays:,} boosted rays in tiers [{tiers}] and "
            f"spliced into the perception stack — the metrics above use "
            f"the patched rows; one-time pilot {diags.pilot_seconds:.1f} s "
            f"+ tail {diags.tail_seconds:.1f} s, MC bulk "
            f"{diags.mc_seconds:.1f} s]")
    elif diags is not None:
        print(
            f"  [exact tail: {diags.selected_cells} starvation-risk cells "
            f"(expected worst window < {diags.tau_select:g}) replaced by "
            f"their zero-variance branch expectation and spliced into the "
            f"perception stack — the metrics above use the patched rows; "
            f"pruned weight {diags.exact_pruned:.3g} bounds the threshold "
            f"bias; one-time pilot {diags.pilot_seconds:.1f} s + tail "
            f"{diags.tail_seconds:.1f} s, MC bulk {diags.mc_seconds:.1f} s]")
    if res.metric_stderr:
        print("MC standard errors (jackknife over num_iter groups):")
        for k, v in res.metric_stderr.items():
            print(f"  {k:<10} +/- {v:.3g}")
    if res.dense is not None:
        # the dense metric lines are part of format_report; here only the
        # optional luminance-map export remains
        if args.dense_eyebox and args.dense_eyebox != "-":
            from .eval.image import save_eyebox_luminance_map

            save_eyebox_luminance_map(args.dense_eyebox,
                                      res.dense.eye_luminance)
            print(f"dense eyebox luminance map written to {args.dense_eyebox}")
    if args.image and res.metrics is not None:
        save_eyebox_center_view(args.image, res.metrics.output_image)
        print(f"Eyebox center view written to {args.image}")
    if args.heatmaps:
        from .eval.image import save_fov_efficiency_heatmaps

        save_fov_efficiency_heatmaps(args.heatmaps, res.histogram)
        print(f"FoV efficiency heatmaps written to {args.heatmaps}")
    if args.save_histogram:
        # the reference exports matrix_EB via scipy.io.savemat
        # (gpu_ray_tracing_pro_fullColor.py); same array, .npy format,
        # same (L, FoVy, FoVx, 80, 120) index order
        np.save(args.save_histogram, np.asarray(res.histogram))
        print(f"eyebox histogram written to {args.save_histogram}")
    if args.json:
        out = {
            "efficiencies": res.efficiencies,
            "delta_e": res.metrics.delta_e if res.metrics else None,
            "u_fov": res.metrics.u_fov if res.metrics else None,
            "u_eyebox": res.metrics.u_eyebox if res.metrics else None,
            "starved_eye_positions": (res.metrics.starved_eye_positions
                                      if res.metrics else None),
            "rays_traced": res.rays_traced,
            "total_bounces": res.total_bounces,
            "trace_seconds": res.trace_seconds,
            "metric_stderr": res.metric_stderr,
        }
        if diags is not None:
            out["tail_boost"] = {
                "mode": "boost" if args.tail_boost else "exact",
                "exact_pruned": diags.exact_pruned,
                "selected_cells": diags.selected_cells,
                "tail_rays": diags.tail_rays,
                "tiers": {str(int(k)): v for k, v in diags.tiers.items()},
                "tau_select": diags.tau_select,
                "tau_target": diags.tau_target,
                "min_pilot_count": diags.min_pilot_count,
                "min_tail_expected": diags.min_tail_expected,
                "pilot_seconds": diags.pilot_seconds,
                "tail_seconds": diags.tail_seconds,
            }
        if res.dense is not None:
            out["dense"] = {
                "delta_e": res.dense.delta_e,
                "u_fov": res.dense.u_fov,
                "u_eyebox": res.dense.u_eyebox,
                "starved_eye_positions": res.dense.starved_eye_positions,
                "eye_positions": list(res.dense.eye_luminance.shape),
            }
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)
    return 0


def cmd_plot_design(args) -> int:
    from .design.geometry import generate_geometry
    from .design.plotting import plot_design

    geom = generate_geometry(_design(args), args.fov_x, args.fov_y)
    paths = plot_design(geom, prefix=args.prefix)
    for p in paths:
        print(f"wrote {p}")
    return 0


def cmd_sweep(args) -> int:
    import itertools
    import time

    from .sweep import run_design_sweep, run_design_sweep_persistent

    base = _design(args)
    if args.sweep:
        # generalized sweep: Cartesian grid over any WaveguideDesign fields
        fields = {f.name for f in dataclasses.fields(base)}
        axes = []
        conv = {}
        for spec in args.sweep:
            key, sep, rng = spec.partition("=")
            parts = rng.split(":")
            if not sep or key not in fields or len(parts) != 3:
                raise SystemExit(
                    f"--sweep expects FIELD=MIN:MAX:N over a WaveguideDesign "
                    f"field; got {spec!r}")
            cur = getattr(base, key)
            # bool before int: bool is an int subclass
            if isinstance(cur, (tuple, bool)):
                raise SystemExit(
                    f"--sweep {key}: {type(cur).__name__}-valued fields "
                    f"cannot sweep over a linspace; use --set per run")
            conv[key] = int if isinstance(cur, int) else float
            lo, hi, n = float(parts[0]), float(parts[1]), int(parts[2])
            vals = np.linspace(lo, hi, n)
            if conv[key] is int:
                # integer fields (num_fc, num_oc, ...) take the unique
                # rounded grid points
                vals = np.unique(np.rint(vals).astype(int))
            axes.append((key, vals))
        keys = [k for k, _ in axes]
        designs = [
            dataclasses.replace(base, **{k: conv[k](v)
                                         for k, v in zip(keys, vals)})
            for vals in itertools.product(*(v for _, v in axes))
        ]
    else:
        keys = ["lambda_ic"]
        periods = np.linspace(args.period_min, args.period_max,
                              args.num_designs)
        designs = [
            dataclasses.replace(base, lambda_ic=float(p), lambda_oc=float(p))
            for p in periods
        ]
    cfg = TraceConfig(
        num_fov_x=args.fov_x, num_fov_y=args.fov_y,
        rays_per_fov=args.rays_per_fov, max_bounces=args.max_bounces,
        seed=args.seed,
    )
    if args.metrics and args.engine != "pallas_persistent":
        print("--metrics requires --engine pallas_persistent", file=sys.stderr)
        return 2

    def _run(group):
        if args.engine == "pallas_persistent":
            return run_design_sweep_persistent(group, cfg,
                                               spawn_iters=args.spawn_iters,
                                               interpret=args.interpret,
                                               spawn_mode=args.spawn_mode,
                                               slots=args.slots,
                                               evaluate_metrics=args.metrics)
        return run_design_sweep(group, cfg)

    # one kernel batch must share strip counts; a sweep over num_fc/num_oc
    # groups designs by count and stitches results back in design order
    t0 = time.perf_counter()
    by_counts = {}
    for i, d in enumerate(designs):
        by_counts.setdefault((d.num_fc, d.num_oc), []).append(i)
    if len(by_counts) == 1:
        res = _run(designs)
    else:
        eff = np.empty((len(designs), 3))
        bounces = np.empty(len(designs), np.int64)
        mets = [None] * len(designs)
        for idxs in by_counts.values():
            r = _run([designs[i] for i in idxs])
            eff[idxs] = r.efficiencies
            bounces[idxs] = r.bounces
            if r.metrics is not None:
                for j, i in enumerate(idxs):
                    mets[i] = r.metrics[j]
        from .sweep.design_sweep import SweepResult

        res = SweepResult(designs=designs, histograms=None,
                          efficiencies=eff, bounces=bounces,
                          metrics=mets if args.metrics else None)
    wall = time.perf_counter() - t0
    print(f"{len(designs)} designs in {wall:.2f} s "
          f"({len(designs) / wall * 3600:,.0f} designs/hour, "
          f"{int(res.bounces.sum()):,} bounces)")
    def _label(d):
        return " ".join(f"{k}={getattr(d, k):.4g}" for k in keys)

    for i, (d, eff) in enumerate(zip(res.designs, res.efficiencies)):
        line = (f"{_label(d)} -> efficiency B/G/R = "
                f"{eff[0]*100:6.3f}% {eff[1]*100:6.3f}% {eff[2]*100:6.3f}%")
        if res.metrics is not None and res.metrics[i] is not None:
            m = res.metrics[i]
            line += (f"  dE={m.delta_e:6.2f} u_fov={m.u_fov:.4f} "
                     f"u_eb={m.u_eyebox:.4f}")
        print(line)
    best = int(np.argmax(res.efficiencies.mean(axis=1)))
    print(f"best mean efficiency: design {best} ({_label(res.designs[best])})")
    if res.metrics is not None and all(m is not None for m in res.metrics):
        best_de = min(range(len(res.metrics)),
                      key=lambda i: res.metrics[i].delta_e)
        print(f"lowest color dispersion: design {best_de} "
              f"(dE={res.metrics[best_de].delta_e:.2f}, "
              f"{_label(res.designs[best_de])})")
    return 0


def cmd_optimize(args) -> int:
    import time

    from .design.geometry import generate_geometry
    from .engine.trace_geometry import build_trace_geometry
    from .luts.io import load_or_synthesize
    from .luts.packing import build_cell_tables
    from .opt import optimize_apodization

    cfg = TraceConfig(num_fov_x=args.fov_x, num_fov_y=args.fov_y,
                      rays_per_fov=args.rays_per_fov,
                      max_bounces=args.max_bounces, seed=args.seed)
    geom = generate_geometry(_design(args), args.fov_x, args.fov_y)
    luts = load_or_synthesize(geom, args.luts_dir)
    tables = build_cell_tables(geom, luts)
    tgeom = build_trace_geometry(geom)
    t0 = time.perf_counter()
    if args.params == "apodization":
        res = optimize_apodization(
            geom, tables, tgeom, cfg, rays_per_fov=args.rays_per_fov,
            steps=args.steps, learning_rate=args.lr,
            capacity=args.capacity, fixed_steps=args.trace_steps,
            pupil_bins=args.pupil_loss)
    else:
        from .opt import optimize_grating

        opt_params = tuple(s.strip() for s in args.params.split(","))
        res = optimize_grating(
            geom, tables, tgeom, cfg, opt_params=opt_params,
            rays_per_fov=args.rays_per_fov, steps=args.steps,
            learning_rate=args.lr, capacity=args.capacity,
            fixed_steps=args.trace_steps, pupil_bins=args.pupil_loss)
    wall = time.perf_counter() - t0
    print(f"{args.steps} Adam steps in {wall:.1f} s; "
          f"loss {res.loss_history[0]:.4f} -> {res.loss_history[-1]:.4f}")
    print(f"efficiency  {res.efficiency[0]*100:.3f}% -> "
          f"{res.efficiency[1]*100:.3f}%")
    print(f"FoV nonuniformity  {res.nonuniformity[0]:.3f} -> "
          f"{res.nonuniformity[1]:.3f}")
    if args.params == "apodization":
        print("s_fc:", " ".join(f"{s:.3f}" for s in res.s_fc))
        print("s_oc:", " ".join(f"{s:.3f}" for s in res.s_oc))
        payload = {"s_fc": res.s_fc.tolist(), "s_oc": res.s_oc.tolist()}
    else:
        for k, v in res.params.items():
            print(f"{k}: {getattr(geom.design, k):.4f} -> {v:.4f}")
        payload = {"params": res.params}
    if args.json:
        with open(args.json, "w") as f:
            json.dump({
                **payload,
                "loss_history": res.loss_history.tolist(),
                "efficiency": res.efficiency,
                "nonuniformity": res.nonuniformity,
            }, f, indent=2)
        print(f"wrote {args.json}")
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="gpu_ray_tracing_for_waveguide_based_ar_display_tpu",
        description="TPU-native waveguide AR display ray tracer",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("simulate", help="full-color Monte-Carlo simulation + metrics")
    _add_common(p)
    p.add_argument("--rays-per-fov", type=int, default=5000)
    p.add_argument("--num-iter", type=int, default=4)
    p.add_argument("--max-bounces", type=int, default=100_000)
    p.add_argument("--cells-per-batch", type=int, default=2048)
    p.add_argument("--simplify-tol", type=float, default=0.0)
    p.add_argument("--image", default="Eyebox Center View.png",
                   help="output PNG path ('' to skip)")
    p.add_argument("--heatmaps", default="",
                   help="write 3-panel per-FoV efficiency heatmaps PNG")
    p.add_argument("--profile-dir", default="",
                   help="capture a jax.profiler trace of the run to this dir")
    p.add_argument("--engine", default="jnp",
                   choices=("jnp", "pallas", "pallas_persistent", "cellblock",
                            "splitting"),
                   help="'splitting' = deterministic zero-variance transport: "
                        "exact branch expectation, rays-per-fov becomes the "
                        "pupil quadrature point count (small grids only)")
    p.add_argument("--pupil-sampling", default="uniform",
                   choices=("uniform", "r2"),
                   help="'r2' = randomized low-discrepancy pupil points "
                        "(unbiased RQMC; lower pupil-axis variance than the "
                        "reference's uniform sampler)")
    p.add_argument("--spawn-iters", type=int, default=0,
                   help="saturating-spawn iteration budget (pallas_persistent; "
                        "0 = fixed generations)")
    p.add_argument("--spawn-mode", default="gens", choices=("gens", "count"),
                   help="count = per-cell exact spawn-target respawn "
                        "(pallas_persistent; fastest for small rays/FoV)")
    p.add_argument("--fold-iterations", action="store_true",
                   help="trace num_iter x rays_per_fov in one kernel pass "
                        "(continued RNG streams; pays the drain tail once)")
    p.add_argument("--error-bars", action="store_true",
                   help="jackknife MC standard errors over the num_iter "
                        "groups (needs num_iter >= 2; disables folding)")
    p.add_argument("--wavelengths", default=None,
                   help="comma-separated wavelength indices (e.g. '1' = green only)")
    p.add_argument("--checkpoint", default=None, help="resumable checkpoint path")
    p.add_argument("--json", default=None, help="write metrics JSON here")
    p.add_argument("--save-histogram", default=None, metavar="PATH",
                   help="write the (L, FoVy, FoVx, 80, 120) eyebox histogram "
                        "as .npy (the reference's matrix_EB savemat export)")
    p.add_argument("--fetch-luts", default=None, metavar="DIR",
                   help="download the reference's seven Drive-hosted RCWA LUT "
                        ".npy files into DIR and use them (download_lut.py "
                        "parity; degrades gracefully offline)")
    p.add_argument("--dense-eyebox", default=None, metavar="PNG",
                   nargs="?", const="-",
                   help="also evaluate the metrics at EVERY valid eye "
                        "position (stride-1 pupil convolution; the "
                        "reference's commented-out dense scan, "
                        "AR_system_evaluation_functions.py:77-89) and, if a "
                        "PNG path is given, save the full-resolution eyebox "
                        "luminance map")
    p.add_argument("--tail-boost", action="store_true",
                   help="tail-patched transport (engine/hybrid.py): pilot-"
                        "selected starvation-risk (FoV, eye-window) cells "
                        "are re-resolved by tier-boosted passes on the same "
                        "kernel and spliced into the perception stack, so "
                        "u_eyebox carries information at default MC budgets "
                        "(requires --engine pallas_persistent)")
    p.add_argument("--tail-exact", action="store_true",
                   help="like --tail-boost, but the tail rows are the EXACT "
                        "branch expectation from the per-cell splitting "
                        "engine (zero variance, ~4 ms/cell on v5e); works "
                        "with any bulk engine")
    p.add_argument("--tail-tau-select", type=float, default=30.0,
                   metavar="COUNT", help="select cells whose worst pilot "
                                         "window count is below this")
    p.add_argument("--tail-tau-target", type=float, default=20.0,
                   metavar="COUNT", help="post-boost expected count floor "
                                         "for the worst window")
    p.add_argument("--tail-max-boost", type=float, default=1024.0,
                   metavar="X", help="boost tier cap (bounds tail cost for "
                                     "physics-dark windows)")
    p.add_argument("--accum-mode", default="fma",
                   choices=("fma", "select", "packed"),
                   help="persistent-kernel parameter-selection lowering: fma "
                        "= bitwise reference parity; packed = bf16-pair "
                        "selection, ~1.4x faster, physics within MC tolerance")
    p.add_argument("--mesh", type=int, default=0, metavar="N",
                   help="shard the cell axis over an N-device "
                        "jax.sharding.Mesh (pallas_persistent engine only; "
                        "requires N visible devices, and N must divide the "
                        "per-batch cell count)")
    p.add_argument("--verbose", action="store_true")
    p.set_defaults(fn=cmd_simulate)

    p = sub.add_parser("plot-design", help="k-space / layout / angular-response plots")
    _add_common(p)
    p.add_argument("--prefix", default="design", help="output file prefix")
    p.set_defaults(fn=cmd_plot_design)

    p = sub.add_parser("sweep", help="batched design sweep (default: coupler "
                                     "period; --sweep for arbitrary fields)")
    _add_common(p)
    p.add_argument("--num-designs", type=int, default=8)
    p.add_argument("--period-min", type=float, default=370.0)
    p.add_argument("--period-max", type=float, default=405.0)
    p.add_argument("--sweep", action="append", default=[],
                   metavar="FIELD=MIN:MAX:N",
                   help="sweep any WaveguideDesign field over a linspace "
                        "(repeatable; multiple axes form a Cartesian grid), "
                        "e.g. --sweep lambda_ic=370:405:16 "
                        "--sweep thickness=0.5:0.9:4")
    p.add_argument("--rays-per-fov", type=int, default=256)
    p.add_argument("--max-bounces", type=int, default=2048)
    p.add_argument("--engine", default="jnp",
                   choices=("jnp", "pallas_persistent"))
    p.add_argument("--spawn-iters", type=int, default=256,
                   help="saturating-spawn budget (pallas_persistent engine)")
    p.add_argument("--spawn-mode", default="gens", choices=("gens", "count"),
                   help="count = exact per-cell sample target (fastest "
                        "ranking sweeps; set --spawn-iters 0 with it)")
    p.add_argument("--slots", type=int, default=None,
                   help="persistent-kernel lanes per cell (default "
                        "min(rays_per_fov, 2048))")
    p.add_argument("--metrics", action="store_true",
                   help="also evaluate the four display metrics per design "
                        "(device-side batched colorimetry; "
                        "pallas_persistent engine only) and report the "
                        "lowest-color-dispersion design")
    p.add_argument("--interpret", action="store_true",
                   help="run the Pallas kernel in interpret mode (CPU)")
    p.set_defaults(fn=cmd_sweep)

    p = sub.add_parser(
        "optimize",
        help="gradient-based per-strip grating apodization (differentiable "
             "splitting tracer + Adam)")
    _add_common(p)
    p.add_argument("--rays-per-fov", type=int, default=16)
    p.add_argument("--max-bounces", type=int, default=2048)
    p.add_argument("--steps", type=int, default=40, help="Adam steps")
    p.add_argument("--lr", type=float, default=0.15)
    p.add_argument("--capacity", type=int, default=4096,
                   help="splitting wavefront buffer slots")
    p.add_argument("--trace-steps", type=int, default=64,
                   help="fixed differentiable trace depth (scan length)")
    p.add_argument("--params", default="apodization",
                   help="'apodization' (per-strip amplitudes) or a comma "
                        "list of grating parameters, e.g. "
                        "'lambda_ic,phi_ic' (differentiable analytic LUTs)")
    p.add_argument("--pupil-loss", type=int, default=0, metavar="BINS",
                   help="score the eyebox-uniformity loss term on "
                        "pupil-integrated radiance (disc of BINS bins over "
                        "every valid eye position — what the evaluation "
                        "metrics measure) instead of raw 0.1 mm bins; "
                        "30 = the 3 mm evaluation pupil")
    p.add_argument("--json", default=None, help="write optimized design here")
    p.set_defaults(fn=cmd_optimize)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
