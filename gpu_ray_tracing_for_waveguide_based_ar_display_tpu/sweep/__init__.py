from .design_sweep import SweepResult, run_design_sweep  # noqa: F401
