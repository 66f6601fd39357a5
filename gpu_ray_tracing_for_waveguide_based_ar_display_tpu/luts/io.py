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

# Google Drive file ids of the published RCWA tables
# (/root/reference/download_lut.py:13-19)
_DRIVE_IDS = {
    "ic1": "1HiBhh3sw_5FW5Ylm0jLJ_3zmGPG0ibIN",
    "ic2": "13gRhhL6G-nojuwibtlxt3BOZijd5kXVP",
    "ic3": "1Zyy8lzUKki2iQ-u2F9JhMxsXbPI-M-YD",
    "fc1": "1wLNyFuBMWr2q3UtPI5FZy8GE5TPGaHGg",
    "fc2": "1MDjkBDgcs_YssEb6RHQtQJ6iWEqo_aGd",
    "oc1": "1WJZvcRpYeMwYBPxSLQewQXERYUAKD0in",
    "oc2": "11SCZNpk0bcX7tM_ihbsz-YSsRudMIrRB",
}


def fetch_luts(directory: str, downloader=None) -> bool:
    """Fetch any missing LUT files into ``directory`` (download_lut.py:5-19).

    ``downloader(url, path)`` defaults to ``gdown.download``; the fetch degrades
    gracefully (returns False) when gdown is unavailable or the network is
    unreachable — this environment is offline, so callers must treat False as
    'use the synthetic tables'.  Returns True when every file is present.
    """
    os.makedirs(directory, exist_ok=True)
    if downloader is None:
        try:
            import gdown

            downloader = lambda url, path: gdown.download(url, path, quiet=True)
        except ImportError:
            return luts_available(directory)
    for key, fname in _FILES.items():
        path = os.path.join(directory, fname)
        if os.path.exists(path):
            continue
        url = f"https://drive.google.com/uc?id={_DRIVE_IDS[key]}"
        # download to a temp name and publish atomically: a failure mid-write
        # must not leave a truncated lut_*.npy behind, which would make
        # luts_available() true and load_or_synthesize crash on the corrupt
        # file instead of degrading to the synthetic tables
        tmp = path + ".part"
        try:
            downloader(url, tmp)
            os.replace(tmp, path)
        except Exception:
            if os.path.exists(tmp):
                os.remove(tmp)
            return False
    return luts_available(directory)


def save_luts(luts: RcwaLuts, directory: str) -> None:
    """Write the seven LUTs to ``directory`` in the reference's exact on-disk
    layout: one ``lut_*_fullColor.npy`` per table (names of download_lut.py:
    13-19), complex dtype, axis order (L, M, N, C) / (S, L, M, N, C) — the
    layout ``np.load``-ed verbatim by the reference driver
    (gpu_ray_tracing_pro_fullColor.py:28-34).  Round-trips bitwise with
    :func:`load_luts`."""
    os.makedirs(directory, exist_ok=True)
    for key, fname in _FILES.items():
        arr = np.asarray(getattr(luts, key))
        if not np.iscomplexobj(arr):
            raise ValueError(f"lut_{key} must be complex valued")
        np.save(os.path.join(directory, fname), arr, allow_pickle=False)


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
    geom: DesignGeometry, directory: Optional[str] = None, seed: int = 1234,
    fetch: bool = False,
) -> RcwaLuts:
    """Prefer real LUT files when present; otherwise synthesize from the design.

    ``fetch=True`` first attempts to download missing files into ``directory``
    (skipped gracefully offline; see :func:`fetch_luts`)."""
    if directory is not None and fetch and not luts_available(directory):
        fetch_luts(directory)
    if directory is not None and luts_available(directory):
        luts = load_luts(directory)
        L, M, N = geom.th_out_ic.shape
        luts.validate(len(geom.fc_strips), len(geom.oc_strips), L, M, N)
        return luts
    return make_synthetic_luts(geom, seed=seed)
