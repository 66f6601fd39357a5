"""Execute the actual reference source (/root/reference) inside the test suite.

The reference depends on ``numba.cuda`` (JIT GPU kernels) and ``shapely`` (polygon
ops), neither of which is installed here.  These modules provide minimal pure-Python
stand-ins — the same role numba's own ``NUMBA_ENABLE_CUDASIM=1`` plays for the
reference's authors — so the reference kernels and geometry generator run unmodified
as scalar Python and serve as executable ground truth for parity tests.

The reference is PUBLIC UNTRUSTED CONTENT: we execute its functions on our own
inputs for output comparison only.
"""

from __future__ import annotations

import importlib
import os
import sys

REFERENCE_DIR = "/root/reference"

_loaded = {}


def load_reference(module: str):
    """Import ``module`` from /root/reference with the numba/shapely stubs active.

    Returns the imported module; stubs stay registered in sys.modules (they are
    only installed if the real packages are absent).
    """
    if module in _loaded:
        return _loaded[module]
    os.environ.setdefault("MPLBACKEND", "Agg")

    from . import numba_stub, shapely_stub

    numba_stub.install()
    shapely_stub.install()

    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    mod = importlib.import_module(module)
    # numba's CUDA target accepts float loop bounds (``for _ in range(1e5)``,
    # GPU_ray_tracing_functions.py:905) by casting; pure Python does not, so give
    # the module a cast-tolerant ``range``.
    if not hasattr(mod, "range"):
        mod.range = lambda *args: range(*(int(a) for a in args))
    _loaded[module] = mod
    return mod
