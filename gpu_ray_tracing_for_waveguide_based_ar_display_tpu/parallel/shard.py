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


def pad_rays_to(rays: dict, multiple: int) -> dict:
    """Pad a host-side SoA batch so its length divides the mesh size.

    Padding rays carry zero field amplitude, so their first-interaction roulette
    probability is exactly 0 and they terminate at init without depositing.
    """
    n = len(rays["x"])
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return rays
    pad = target - n
    out = {}
    for k, v in rays.items():
        pv = np.zeros((pad,) + v.shape[1:], dtype=v.dtype)
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

    if packed:
        # the packed bf16-pair selection table shards with the cell axis like
        # cell_params; shard_map wants positionals, the public trace keeps the
        # engine's keyword contract
        def _local(cp, cpk, geom_row, rays, rng, ctrl):
            return pers_fn(cp, geom_row, rays, rng, ctrl,
                           cell_params_packed=cpk)

        sharded = shard_map(
            _local,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(), P(axis), P(axis), P()),
            out_specs=(P(axis), P(axis)),
            check_vma=False,
        )
    else:
        def _local(cp, geom_row, rays, rng, ctrl):
            return pers_fn(cp, geom_row, rays, rng, ctrl)

        sharded = shard_map(
            _local,
            mesh=mesh,
            in_specs=(P(axis), P(), P(axis), P(axis), P()),
            out_specs=(P(axis), P(axis)),
            check_vma=False,
        )

    def trace(cell_params, geom_row, rays_in, rng_in, ctrl,
              cell_params_packed=None):
        n_dev = mesh.devices.size
        if cell_params.shape[0] % n_dev:
            raise ValueError(
                f"{cell_params.shape[0]} cells do not divide over {n_dev} devices")
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
    (22,500 for the reference grid — beyond any single v5e/v5p slice), and a
    2-D (cells x samples) mesh composes both for anything larger or for
    small-grid workloads on big slices.
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
        n_dev = mesh.devices.size
        if rng_in.shape[0] != n_dev:
            raise ValueError(
                f"rng_in needs a leading device axis of {n_dev}, "
                f"got shape {rng_in.shape}")
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
