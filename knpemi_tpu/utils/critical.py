"""Cooperative critical sections for wall-clock watchdogs.

bench.py bounds each case with ``signal.alarm``; some host-side work must
not be abandoned mid-flight (e.g. persisting a multi-minute MG hierarchy
build to the disk cache, solvers/mg.py::build_hierarchy_cached — an
interrupt there used to orphan the .tmp file and lose the whole build).
Kernel-level deferral (pthread_sigmask) is unreliable in a JAX process:
the process-directed SIGALRM can be consumed by a runtime thread while
the main thread has it blocked (measured — the pending signal vanishes).

This module keeps it in Python instead: guarded code enters
``critical_section()``; a watchdog's SIGALRM handler checks
``in_critical_section()`` and re-arms a short alarm instead of raising,
so the timeout lands right after the guarded work completes.  CPython
always runs signal handlers on the main thread, so a plain counter is
enough.
"""

from __future__ import annotations

from contextlib import contextmanager

_depth = 0


@contextmanager
def critical_section():
    """Mark the enclosed block as not-interruptible-by-watchdog."""
    global _depth
    _depth += 1
    try:
        yield
    finally:
        _depth -= 1


def in_critical_section() -> bool:
    return _depth > 0
