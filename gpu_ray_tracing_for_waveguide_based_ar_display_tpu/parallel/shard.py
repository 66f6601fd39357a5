"""Multi-chip sharding of the Monte-Carlo trace over a ``jax.sharding.Mesh``.

The reference is single-GPU (no NCCL/MPI anywhere, SURVEY.md section 2.6); the
TPU-native scaling story is pure data parallelism over the ray axis:

- ray batches shard across every mesh axis (rays are independent; tables and
  geometry replicate),
- each device accumulates a local eyebox histogram from its rays' terminal
  deposits (atomic-free by construction),
- one ``psum`` over ICI merges histograms and bounce counters at batch end.

Works identically on a virtual CPU mesh (``--xla_force_host_platform_device_count``)
and real multi-chip TPU slices.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import TraceConfig
from ..luts.packing import CellTables
from ..engine import trace_jnp
from ..engine.trace_geometry import TraceGeometry


def make_mesh(devices: Optional[Sequence] = None,
              axis_names: Tuple[str, ...] = ("rays",),
              shape: Optional[Tuple[int, ...]] = None) -> Mesh:
    """A mesh over all (or given) devices; defaults to 1-D over the ray axis."""
    devices = list(devices) if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axis_names)


# neutral padding values per SoA key where zero is NOT neutral: a padded
# "dep" of 0 is a real bin-0 deposit code (the sentinel is -1,
# trace_jnp.make_ray_state), and cos_th divides the branch efficiencies
_PAD_FILL = {"dep": -1, "cos_th": 1}


def pad_rays_to(rays: dict, multiple: int) -> dict:
    """Pad a host-side SoA batch so its length divides the mesh size.

    Padding rays carry zero field amplitude, so their first-interaction roulette
    probability is exactly 0 and they terminate at init without depositing.
    Works on both the seeding batch (x/y/te/tm/cid/idx/rng) and a full
    ``make_ray_state`` pytree: keys whose neutral value is nonzero (the ``dep``
    deposit sentinel, ``cos_th``) are filled accordingly — zero-filled ``dep``
    padding would silently deposit one count per padding ray into cell 0, bin 0.
    """
    n = len(rays["x"])
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return rays
    pad = target - n
    out = {}
    for k, v in rays.items():
        v = np.asarray(v)
        pv = np.full((pad,) + v.shape[1:], _PAD_FILL.get(k, 0), dtype=v.dtype)
        out[k] = np.concatenate([v, pv], axis=0)
    return out


def make_sharded_trace_fn(
    tables: CellTables,
    tgeom: TraceGeometry,
    cfg: TraceConfig,
    mesh: Mesh,
):
    """Build ``trace(rays) -> (histogram, bounces)`` sharded over ``mesh``.

    ``rays`` is the SoA pytree from :func:`..engine.trace_jnp.make_ray_state`; its
    length must divide the mesh device count (see :func:`pad_rays_to`).  The
    returned histogram is replicated (already psum-merged over ICI); bounce counts
    are summed globally.
    """
    core = trace_jnp.make_trace_fn(tables, tgeom, cfg, jit=False)
    ny, nx = cfg.eyebox_bins
    L, M, N = tables.L, tables.M, tables.N
    axes = mesh.axis_names

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axes),),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def _sharded(rays):
        rays_f, bounces = core(rays)
        hist = trace_jnp.deposits_to_histogram(
            rays_f["dep"], rays_f["cid"], L, M, N, ny, nx
        )
        hist = jax.lax.psum(hist, axis_name=axes)
        bounces = jax.lax.psum(bounces, axis_name=axes)
        return hist, bounces

    @jax.jit
    def trace(rays):
        return _sharded(rays)

    return trace


def shard_ray_batch(rays: dict, mesh: Mesh) -> dict:
    """Device-put a host SoA batch with the ray axis sharded over the whole mesh."""
    sharding = NamedSharding(mesh, P(mesh.axis_names))
    return {k: jax.device_put(jnp.asarray(v), sharding) for k, v in rays.items()}


def _classify_rays(cell_params, geom_row, rays_in, n_dev: int):
    """Shared discriminator/validator for the cell-sharding wrappers.

    Returns ``(shared, design_sharded)``: whether ``rays_in`` is the shared
    per-design tile form (one (6, RT, 128) tile per design) or per-cell
    blocks, and whether the design axis itself shards over the mesh.

    The persistent kernel accepts ``rays_in`` with leading dim ``Cb``
    (per-cell-block tiles, where Cb = C / cells_per_block) or ``D``
    (one shared tile per design, ``D = geom_row.shape[0]``), so the design
    axis is the exact discriminator.  Multi-design calls shard when each
    device receives WHOLE designs — the kernel derives its design fan-out
    (``cpd = C // D``) from the local call shapes inside shard_map, so a
    device holding D/n_dev contiguous designs with their C/n_dev
    design-major cells computes exactly the single-device result
    (dryrun-verified bitwise).  Layouts that would split a design across
    devices are rejected loudly instead of producing silently wrong
    fan-out:

    - multi-design calls with ``D % n_dev != 0`` (a design would straddle a
      device boundary);
    - per-cell tiles whose block count differs from the cell count
      (``cells_per_block > 1``) — block rows would misalign with the
      cell shards.
    """
    D = geom_row.shape[0]
    C = cell_params.shape[0]
    nr = rays_in.shape[0]
    shared = nr == D and nr != C
    design_sharded = D > 1 and n_dev > 1
    if n_dev > 1:
        if D > 1:
            if D % n_dev:
                raise ValueError(
                    f"multi-design cell-axis sharding needs whole designs "
                    f"per device: {D} designs do not divide over {n_dev} "
                    f"devices of the mesh axis")
            if not shared:
                raise ValueError(
                    "multi-design cell-axis sharding supports the shared "
                    f"per-design ray-tile form only (got {nr} ray rows for "
                    f"{D} designs / {C} cells)")
        if not shared and nr != C:
            raise ValueError(
                f"per-cell ray tiles must have one row per cell to shard "
                f"(got {nr} rows for {C} cells; cells_per_block > 1 does "
                f"not compose with cell-axis sharding)")
    return shared, design_sharded


def make_sharded_cell_trace_fn(pers_fn, mesh: Mesh, axis: str = "rays",
                               packed: bool = False):
    """Shard the *cell* axis of the persistent Pallas tracer over a mesh.

    The persistent kernel already grids over (wavelength, FoV) cells on one
    chip; across chips the same axis is simply partitioned — each device runs
    the kernel on its cell subset and keeps its histogram tiles local (cells
    own disjoint histogram slices, so no collective is needed; assembly
    concatenates).  ``pers_fn`` is a
    :func:`..engine.trace_pallas_persistent.make_persistent_trace_fn` result.

    The number of cells must divide the mesh size.  Works on a virtual CPU
    mesh with ``interpret=True`` kernels and on real TPU slices compiled.
    """

    # rays_in is either per-cell (C, 6, RT, 128) — shards with the cell axis
    # — or the pipeline/sweep's shared per-design tile (D, 6, RT, 128), which
    # replicates for D=1 and shards with the design axis for device-aligned
    # multi-design sweeps; rng_in shards when it carries per-cell streams
    # (C rows) and replicates when designs share one per-cell-of-design seed
    # block (the sweep's broadcast form).  One shard_map per layout choice.
    _cache = {}

    def _sharded(shared_rays: bool, design_sharded: bool, rng_sharded: bool):
        key = (shared_rays, design_sharded, rng_sharded)
        if key not in _cache:
            rays_spec = (P(axis) if (design_sharded or not shared_rays)
                         else P())
            geom_spec = P(axis) if design_sharded else P()
            rng_spec = P(axis) if rng_sharded else P()
            if packed:
                # the packed bf16-pair selection table shards with the cell
                # axis like cell_params; shard_map wants positionals, the
                # public trace keeps the engine's keyword contract
                def _local(cp, cpk, geom_row, rays, rng, ctrl):
                    return pers_fn(cp, geom_row, rays, rng, ctrl,
                                   cell_params_packed=cpk)

                _cache[key] = shard_map(
                    _local,
                    mesh=mesh,
                    in_specs=(P(axis), P(axis), geom_spec, rays_spec,
                              rng_spec, P()),
                    out_specs=(P(axis), P(axis)),
                    check_vma=False,
                )
            else:
                def _local(cp, geom_row, rays, rng, ctrl):
                    return pers_fn(cp, geom_row, rays, rng, ctrl)

                _cache[key] = shard_map(
                    _local,
                    mesh=mesh,
                    in_specs=(P(axis), geom_spec, rays_spec, rng_spec, P()),
                    out_specs=(P(axis), P(axis)),
                    check_vma=False,
                )
        return _cache[key]

    def trace(cell_params, geom_row, rays_in, rng_in, ctrl,
              cell_params_packed=None):
        # the cell axis splits over THIS axis only (a 2-D cells x samples
        # mesh leaves the other axis to the sample-sharded wrapper)
        n_dev = mesh.shape[axis]
        if cell_params.shape[0] % n_dev:
            raise ValueError(
                f"{cell_params.shape[0]} cells do not divide over {n_dev} "
                f"devices of mesh axis {axis!r}")
        shared, design_sharded = _classify_rays(cell_params, geom_row,
                                                rays_in, n_dev)
        # per-cell RNG streams (C rows) shard; a per-cell-of-design block
        # shared across designs (C // D rows, the sweep broadcast form)
        # replicates — each device's local kernel still maps it as i % cpd
        rng_sharded = rng_in.shape[0] == cell_params.shape[0]
        if (n_dev > 1 and not rng_sharded
                and rng_in.shape[0] * geom_row.shape[0]
                != cell_params.shape[0]):
            C, nr = cell_params.shape[0], rng_in.shape[0]
            if nr and C % nr == 0 and C // nr > 1:
                # block-packed rng (C // cells_per_block rows): the actual
                # unsupported knob is cells_per_block, mirror the per-cell
                # tile rejection instead of a misleading row-count message
                raise ValueError(
                    f"rng_in has {nr} rows for {C} cells — "
                    f"cells_per_block == {C // nr} does not compose with "
                    "cell-axis sharding (block rows would misalign with "
                    "the cell shards)")
            raise ValueError(
                f"rng_in rows ({nr}) must equal the cell count "
                f"({C}) or the per-design cell count to "
                "shard soundly")
        sharded = _sharded(shared, design_sharded, rng_sharded)
        if packed:
            if cell_params_packed is None:
                raise ValueError("packed=True needs cell_params_packed")
            return sharded(jnp.asarray(cell_params),
                           jnp.asarray(cell_params_packed),
                           jnp.asarray(geom_row), jnp.asarray(rays_in),
                           jnp.asarray(rng_in), jnp.asarray(ctrl))
        return sharded(jnp.asarray(cell_params), jnp.asarray(geom_row),
                       jnp.asarray(rays_in), jnp.asarray(rng_in),
                       jnp.asarray(ctrl))

    return trace


def make_sample_sharded_cell_trace_fn(pers_fn, mesh: Mesh,
                                      axis: str = "samples",
                                      packed: bool = False):
    """MC-*sample*-axis data parallelism for the persistent Pallas tracer.

    The orthogonal direction to :func:`make_sharded_cell_trace_fn`: every
    device runs the kernel over ALL cells, but with its own slice of the RNG
    streams — ``rng_in`` carries a leading device axis ``(n_dev, C, RT, 128)``
    of *distinct* seeds — and its share of the per-cell sample budget (the
    caller divides ``gens`` / the count-spawn target by the device count).
    Per-cell histogram tiles merge with ONE ``psum`` over ICI at kernel exit;
    nb counters sum.  This lifts pure cell sharding's ``cells >= devices``
    requirement: cell sharding alone covers slices up to one chip per cell
    (22,500 for the reference grid — beyond any single v5e/v5p slice); for
    anything larger or for small-grid workloads on big slices, use
    :func:`make_2d_sharded_cell_trace_fn`, which partitions BOTH axes of a
    2-D (cells x samples) mesh in one shard_map.
    """

    if packed:
        # every device sees all cells, so the packed table replicates
        def _local(cp, cpk, geom_row, rays, rng, ctrl):
            tiles, nb = pers_fn(cp, geom_row, rays, rng[0], ctrl,
                                cell_params_packed=cpk)
            tiles = jax.lax.psum(tiles, axis_name=axis)
            nb = jax.lax.psum(nb, axis_name=axis)
            return tiles, nb

        sharded = shard_map(
            _local,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(axis), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
    else:
        def _local(cp, geom_row, rays, rng, ctrl):
            tiles, nb = pers_fn(cp, geom_row, rays, rng[0], ctrl)
            tiles = jax.lax.psum(tiles, axis_name=axis)
            nb = jax.lax.psum(nb, axis_name=axis)
            return tiles, nb

        sharded = shard_map(
            _local,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(axis), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )

    def trace(cell_params, geom_row, rays_in, rng_in, ctrl,
              cell_params_packed=None):
        # the leading seed axis splits over THIS axis only; sizing it to the
        # total device count on a multi-axis mesh would make each local block
        # carry several seed rows of which rng[0] uses one — silently tracing
        # a fraction of the intended samples
        n_dev = mesh.shape[axis]
        if rng_in.shape[0] != n_dev:
            raise ValueError(
                f"rng_in needs a leading device axis of {n_dev} (mesh axis "
                f"{axis!r}), got shape {rng_in.shape}")
        if packed:
            if cell_params_packed is None:
                raise ValueError("packed=True needs cell_params_packed")
            return sharded(jnp.asarray(cell_params),
                           jnp.asarray(cell_params_packed),
                           jnp.asarray(geom_row), jnp.asarray(rays_in),
                           jnp.asarray(rng_in), jnp.asarray(ctrl))
        return sharded(jnp.asarray(cell_params), jnp.asarray(geom_row),
                       jnp.asarray(rays_in), jnp.asarray(rng_in),
                       jnp.asarray(ctrl))

    return trace


def make_2d_sharded_cell_trace_fn(pers_fn, mesh: Mesh,
                                  cell_axis: str = "cells",
                                  sample_axis: str = "samples",
                                  packed: bool = False):
    """Compose cell-axis AND sample-axis data parallelism in ONE shard_map.

    For a 2-D ``(cell_axis, sample_axis)`` mesh: the cell tables and ray/RNG
    blocks partition over ``cell_axis`` (disjoint histogram tiles, no
    collective), while ``rng_in`` carries a leading ``mesh.shape[sample_axis]``
    axis of distinct seed blocks that partitions over ``sample_axis`` — each
    device traces its cell subset with its sample share, and tiles psum-merge
    over the sample axis only.  This is the scaling shape for slices larger
    than the cell count or for small-grid workloads on big slices
    (ceiling: cells x whatever sample multiple the budget affords).

    rng_in: (S, C, RT, 128) with S = mesh.shape[sample_axis]; all other
    operands exactly as the underlying persistent trace fn.
    """

    def _body(cp, geom_row, rays, rng, ctrl, cpk=None):
        kw = {"cell_params_packed": cpk} if cpk is not None else {}
        tiles, nb = pers_fn(cp, geom_row, rays, rng[0], ctrl, **kw)
        tiles = jax.lax.psum(tiles, axis_name=sample_axis)
        nb = jax.lax.psum(nb, axis_name=sample_axis)
        return tiles, nb

    cell_p, rng_p = P(cell_axis), P(sample_axis, cell_axis)
    _cache = {}

    def _sharded(shared_rays: bool):
        # shared per-design ray tiles replicate; per-cell blocks shard with
        # the cell axis (same contract as make_sharded_cell_trace_fn)
        if shared_rays not in _cache:
            rays_spec = P() if shared_rays else cell_p
            if packed:
                _cache[shared_rays] = shard_map(
                    lambda cp, cpk, g, r, s, c: _body(cp, g, r, s, c, cpk),
                    mesh=mesh,
                    in_specs=(cell_p, cell_p, P(), rays_spec, rng_p, P()),
                    out_specs=(cell_p, cell_p),
                    check_vma=False,
                )
            else:
                _cache[shared_rays] = shard_map(
                    _body,
                    mesh=mesh,
                    in_specs=(cell_p, P(), rays_spec, rng_p, P()),
                    out_specs=(cell_p, cell_p),
                    check_vma=False,
                )
        return _cache[shared_rays]

    def trace(cell_params, geom_row, rays_in, rng_in, ctrl,
              cell_params_packed=None):
        n_cell = mesh.shape[cell_axis]
        shared, design_sharded = _classify_rays(cell_params, geom_row,
                                                rays_in, n_cell)
        if design_sharded:
            raise ValueError(
                "multi-design calls are not supported on the 2-D mesh "
                "wrapper; use make_sharded_cell_trace_fn for sweep sharding")
        sharded = _sharded(shared)
        n_samp = mesh.shape[sample_axis]
        if cell_params.shape[0] % n_cell:
            raise ValueError(
                f"{cell_params.shape[0]} cells do not divide over {n_cell} "
                f"devices of mesh axis {cell_axis!r}")
        if rng_in.shape[0] != n_samp:
            raise ValueError(
                f"rng_in needs a leading device axis of {n_samp} (mesh axis "
                f"{sample_axis!r}), got shape {rng_in.shape}")
        if packed:
            if cell_params_packed is None:
                raise ValueError("packed=True needs cell_params_packed")
            return sharded(jnp.asarray(cell_params),
                           jnp.asarray(cell_params_packed),
                           jnp.asarray(geom_row), jnp.asarray(rays_in),
                           jnp.asarray(rng_in), jnp.asarray(ctrl))
        return sharded(jnp.asarray(cell_params), jnp.asarray(geom_row),
                       jnp.asarray(rays_in), jnp.asarray(rng_in),
                       jnp.asarray(ctrl))

    return trace
