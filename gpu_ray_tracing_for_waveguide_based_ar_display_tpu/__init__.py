"""TPU-native Monte-Carlo ray-tracing framework for waveguide-based AR displays.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``yefuzhang/GPU_ray_tracing_for_waveguide_based_AR_display`` (CUDA/Numba):

- k-space waveguide design + coupler geometry generation (``design``)
- RCWA diffraction look-up tables: loading, synthesis, packing (``luts``)
- Monte-Carlo polarized ray tracing engines (``engine``):
  a numpy oracle, a vectorized jnp engine, and a Pallas TPU megakernel
- eyebox radiance histograms and display metrics (``eval``)
- multi-chip sharding over ``jax.sharding.Mesh`` (``parallel``)
- batched design sweeps via ``vmap`` (``sweep``)

Import as ``import gpu_ray_tracing_for_waveguide_based_ar_display_tpu as wgtpu``.
"""

__version__ = "0.1.0"


def _disable_thp_first_touch() -> None:
    """Opt this process out of transparent huge pages (Linux).

    On the shared-hypervisor hosts this framework targets, the *first touch*
    of a fresh anonymous 2 MB huge page measures ~40 ms (hypervisor-side
    allocation), i.e. ~17 MB/s — touching a few hundred MB of new numpy/JAX
    host buffers costs ~10 s and was the dominant "host noise" in sweep prep
    and Simulator startup.  With THP disabled the same first touch runs at
    4 KB-page speed (~2 GB/s, measured 130x faster).  Set ``GRT_KEEP_THP=1``
    to keep THP (e.g. on hosts with healthy huge-page allocation).
    """
    import os
    import sys

    if os.environ.get("GRT_KEEP_THP") == "1" or not sys.platform.startswith(
            "linux"):
        return
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.prctl(41, 1, 0, 0, 0)  # PR_SET_THP_DISABLE
    except Exception:  # pragma: no cover - best effort
        pass


_disable_thp_first_touch()

from .config import WaveguideDesign, TraceConfig, EvalConfig  # noqa: F401
