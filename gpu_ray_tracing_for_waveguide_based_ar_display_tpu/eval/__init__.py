from .metrics import EvalResult, evaluate, efficiencies  # noqa: F401
from . import color  # noqa: F401
