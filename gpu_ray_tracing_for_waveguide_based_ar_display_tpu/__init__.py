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

from .config import WaveguideDesign, TraceConfig, EvalConfig  # noqa: F401
