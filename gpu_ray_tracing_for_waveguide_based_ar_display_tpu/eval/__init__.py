from .metrics import (  # noqa: F401
    EvalResult, evaluate, evaluate_dense, efficiencies,
)
from . import color  # noqa: F401
