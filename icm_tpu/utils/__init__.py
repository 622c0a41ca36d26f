from .profiling import StepTimer, Timer, trace

__all__ = ["StepTimer", "Timer", "trace"]
