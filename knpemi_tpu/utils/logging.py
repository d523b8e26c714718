"""Progress logging and timers.

Parity with the reference's observability surface (SURVEY.md section 5):
ANSI-colored step prints (reference bcolors, run_2D.py:29-37), scoped
wall-clock timers (dolfinx.common.Timer around the ODE sweep,
odeSolver.py:104-125).  For deeper traces, wrap the jitted step in
``jax.profiler.trace`` — it is a single XLA computation.
"""

from __future__ import annotations

import time


class bcolors:
    HEADER = "\033[95m"
    OKBLUE = "\033[94m"
    OKCYAN = "\033[96m"
    OKGREEN = "\033[92m"
    WARNING = "\033[93m"
    FAIL = "\033[91m"
    ENDC = "\033[0m"
    BOLD = "\033[1m"
    UNDERLINE = "\033[4m"


def log_step(t: float, unit: str = "s", extra: str = ""):
    print(f"{bcolors.OKBLUE}Solving for t = {t:.4f} {unit}{bcolors.ENDC} {extra}")


def warn(msg: str):
    print(f"{bcolors.WARNING}WARNING: {msg}{bcolors.ENDC}")


class Timer:
    """Scoped wall-clock timer: ``with Timer('ODE step') as t: ...``."""

    def __init__(self, name: str, verbose: bool = True):
        self.name = name
        self.verbose = verbose
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        if self.verbose:
            print(f"\t{self.name}: {self.elapsed:.4f}s")
        return False


_setup_t0 = [None]


def setup_mark(stage: str) -> None:
    """Incremental setup-stage timing print, enabled by
    KNPEMI_SETUP_TIMING=1 (same gate as the Simulation/build_hierarchy
    marks): prints seconds since the previous mark."""
    import os

    if os.environ.get("KNPEMI_SETUP_TIMING") != "1":
        return
    t1 = time.perf_counter()
    if _setup_t0[0] is not None:
        print(f"[setup] {stage}: {t1 - _setup_t0[0]:.1f}s", flush=True)
    _setup_t0[0] = t1
