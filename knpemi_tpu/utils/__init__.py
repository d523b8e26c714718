from .logging import bcolors, log_step, Timer

__all__ = ["bcolors", "log_step", "Timer"]
