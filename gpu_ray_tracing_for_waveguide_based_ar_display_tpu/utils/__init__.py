from .profiling import Timers, xla_trace  # noqa: F401
from .checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
