from .grating_opt import (  # noqa: F401
    ApodizationResult,
    apply_apodization,
    make_apodization_loss,
    optimize_apodization,
)
