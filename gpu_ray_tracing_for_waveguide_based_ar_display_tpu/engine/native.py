"""ctypes bindings for the native host runtime (native/host_sampler.cpp).

The native layer covers the host data path — pupil rejection sampling and SoA ray
block construction (the reference's ``generate_points_in_polygon`` + driver init
loops).  Falls back to the numpy implementations transparently when the shared
library hasn't been built (``make -C native``); ``build()`` compiles it on demand.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libhostsampler.so"))
_lib: Optional[ctypes.CDLL] = None
_build_attempted = False


def build(force: bool = False) -> bool:
    """Compile the shared library; returns success.

    Always invokes make (a no-op when the library is newer than the source, per
    the Makefile dependency), so edits to host_sampler.cpp are never shadowed by
    a stale binary.  The result is cached per process unless ``force``.
    """
    global _build_attempted
    if _build_attempted and not force:
        return os.path.exists(_LIB_PATH)
    _build_attempted = True
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True, capture_output=True,
        )
        return os.path.exists(_LIB_PATH)
    except FileNotFoundError:
        # no make on this host: a previously-built library is as good as it
        # gets (sources cannot have changed without a toolchain)
        return os.path.exists(_LIB_PATH)
    except subprocess.CalledProcessError as e:
        if os.path.exists(_LIB_PATH):
            # an existing .so + a failing build means the sources changed and
            # no longer compile — running the stale binary silently would
            # break the never-shadowed-by-stale-binary guarantee above
            import sys

            print(f"[native] host_sampler build failed; IGNORING stale "
                  f"{os.path.basename(_LIB_PATH)} and falling back to the "
                  f"Python sampler:\n{e.stderr.decode(errors='replace')}",
                  file=sys.stderr)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.sample_points_in_polygon.restype = ctypes.c_long
    lib.sample_points_in_polygon.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_long,
        ctypes.c_uint64, ctypes.POINTER(ctypes.c_double),
    ]
    lib.fill_ray_blocks.restype = None
    lib.fill_ray_blocks.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.c_long, ctypes.c_long,
        ctypes.c_long, ctypes.c_uint64, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint32),
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def sample_points_in_polygon(
    poly: np.ndarray, num: int, seed: int
) -> Optional[np.ndarray]:
    """Native uniform sampling inside a polygon; None if the library is absent."""
    lib = _load()
    if lib is None:
        return None
    poly = np.ascontiguousarray(poly, dtype=np.float64)
    out = np.empty((num, 2), dtype=np.float64)
    lib.sample_points_in_polygon(
        poly.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(poly), num, seed & 0xFFFFFFFFFFFFFFFF,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out


def fill_ray_blocks(
    points: np.ndarray, cell_ids: np.ndarray, rpc: int, rp: int,
    seed: int, iter_offset: int
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native SoA kernel-block construction; None if the library is absent.

    Returns (rays (C, 6, rp) f32, rng (C, rp) u32) with seeding identical to
    :func:`..ops.rng.seed_fast` on indices ``cell_id * rpc + i + iter_offset``.
    """
    lib = _load()
    if lib is None:
        return None
    points = np.ascontiguousarray(points, dtype=np.float64)
    cell_ids = np.ascontiguousarray(cell_ids, dtype=np.int32)
    n_cells = len(cell_ids)
    rays = np.empty((n_cells, 6, rp), dtype=np.float32)
    rng = np.empty((n_cells, rp), dtype=np.uint32)
    lib.fill_ray_blocks(
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(points),
        cell_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n_cells, rpc, rp, seed & 0xFFFFFFFFFFFFFFFF,
        iter_offset & 0xFFFFFFFFFFFFFFFF,
        rays.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rng.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
    )
    return rays, rng
