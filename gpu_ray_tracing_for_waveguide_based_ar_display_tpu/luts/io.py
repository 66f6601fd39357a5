"""Loading RCWA LUTs from disk (the reference's ``lut_*_fullColor.npy`` files).

File naming follows /root/reference/download_lut.py:13-19 and the loads at
/root/reference/gpu_ray_tracing_pro_fullColor.py:28-34.  Falls back to synthetic LUTs
when files are absent (see :mod:`.synthetic`).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..design.geometry import DesignGeometry
from .schema import RcwaLuts
from .synthetic import make_synthetic_luts

_FILES = {
    "ic1": "lut_ic1_fullColor.npy",
    "ic2": "lut_ic2_fullColor.npy",
    "ic3": "lut_ic3_fullColor.npy",
    "fc1": "lut_fc1_fullColor.npy",
    "fc2": "lut_fc2_fullColor.npy",
    "oc1": "lut_oc1_fullColor.npy",
    "oc2": "lut_oc2_fullColor.npy",
}


def load_luts(directory: str) -> RcwaLuts:
    """Load the seven full-color LUT files from ``directory``."""
    arrays = {}
    for key, fname in _FILES.items():
        path = os.path.join(directory, fname)
        arrays[key] = np.load(path, allow_pickle=False)
    return RcwaLuts(**arrays)


def luts_available(directory: str) -> bool:
    return all(os.path.exists(os.path.join(directory, f)) for f in _FILES.values())


def load_or_synthesize(
    geom: DesignGeometry, directory: Optional[str] = None, seed: int = 1234
) -> RcwaLuts:
    """Prefer real LUT files when present; otherwise synthesize from the design."""
    if directory is not None and luts_available(directory):
        luts = load_luts(directory)
        L, M, N = geom.th_out_ic.shape
        luts.validate(len(geom.fc_strips), len(geom.oc_strips), L, M, N)
        return luts
    return make_synthetic_luts(geom, seed=seed)
