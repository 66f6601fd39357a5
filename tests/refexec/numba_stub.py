"""Pure-Python stand-in for the slice of ``numba.cuda`` the reference uses.

Mirrors what ``NUMBA_ENABLE_CUDASIM=1`` provides: ``@cuda.jit`` kernels become
plain functions launched with ``kernel[blocks, threads](args...)`` over a serial
grid loop; device functions are called directly; atomics are ordinary reads and
writes (the grid loop is serial, so atomicity is trivial).

Covers exactly the API surface of /root/reference/GPU_ray_tracing_functions.py:
``cuda.jit`` (:25-833), ``cuda.grid`` (:169,:180,:202,:428,:842), ``cuda.atomic.add``
(:164,:187,:258), ``cuda.threadIdx``/``blockIdx`` (:175), the ``int32/float32/uint32``
cast types (:4,:29-34), and the unused ``xoroshiro128p_uniform_float32`` import (:9).
"""

from __future__ import annotations

import sys
import threading
import types

import numpy as np

_tls = threading.local()


def grid(ndim):
    if ndim != 1:
        raise NotImplementedError("only 1-D grids are used by the reference")
    return _tls.grid_idx


class _Atomic:
    @staticmethod
    def add(arr, idx, val):
        old = arr[idx]
        arr[idx] = old + val
        return old


class _Idx:
    """threadIdx/blockIdx stand-ins (``.x`` only)."""

    def __init__(self, kind):
        self._kind = kind

    @property
    def x(self):
        if self._kind == "thread":
            return _tls.grid_idx % _tls.block_dim
        return _tls.grid_idx // _tls.block_dim


class _Kernel:
    def __init__(self, fn):
        self.fn = fn
        self.__name__ = getattr(fn, "__name__", "kernel")

    def __getitem__(self, launch):
        blocks, threads = launch

        def run(*args):
            prev = getattr(_tls, "grid_idx", None)
            prev_bd = getattr(_tls, "block_dim", None)
            try:
                _tls.block_dim = threads
                for idx in range(blocks * threads):
                    _tls.grid_idx = idx
                    self.fn(*args)
            finally:
                _tls.grid_idx = prev
                _tls.block_dim = prev_bd

        return run


def jit(fn=None, device=False, **kwargs):
    if fn is None:
        def deco(f):
            return f if device else _Kernel(f)
        return deco
    return _Kernel(fn)


def _xoroshiro128p_uniform_float32(states, idx):  # imported but never called
    raise NotImplementedError


def install():
    """Register the stub as ``numba`` in sys.modules (no-op if numba exists)."""
    if "numba" in sys.modules and not getattr(
        sys.modules["numba"], "_IS_REF_STUB", False
    ):
        return
    try:
        import numba  # noqa: F401  (real package present: use it)

        return
    except ImportError:
        pass

    numba_mod = types.ModuleType("numba")
    numba_mod._IS_REF_STUB = True
    cuda_mod = types.ModuleType("numba.cuda")
    random_mod = types.ModuleType("numba.cuda.random")

    cuda_mod.jit = jit
    cuda_mod.grid = grid
    cuda_mod.atomic = _Atomic()
    cuda_mod.threadIdx = _Idx("thread")
    cuda_mod.blockIdx = _Idx("block")
    cuda_mod.random = random_mod
    cuda_mod.to_device = lambda a: np.array(a)
    cuda_mod.synchronize = lambda: None

    random_mod.xoroshiro128p_uniform_float32 = _xoroshiro128p_uniform_float32

    numba_mod.cuda = cuda_mod
    # cast types: numpy scalar constructors give the same wrapping semantics
    # the CUDA target applies (modular uint32 arithmetic etc.)
    numba_mod.int32 = np.int32
    numba_mod.float32 = np.float32
    numba_mod.uint32 = np.uint32

    sys.modules["numba"] = numba_mod
    sys.modules["numba.cuda"] = cuda_mod
    sys.modules["numba.cuda.random"] = random_mod
