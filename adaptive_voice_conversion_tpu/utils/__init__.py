from .profiling import profile_trace, step_timer
from .debug import enable_nan_debugging

__all__ = ["profile_trace", "step_timer", "enable_nan_debugging"]
