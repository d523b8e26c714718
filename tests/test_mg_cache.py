"""MG disk-cache behavior: hits, and watchdog-safe persistence.

The reference amortizes hypre's setup across a long-lived MPI job;
knpemi_tpu amortizes it through build_hierarchy_cached's disk cache
(solvers/mg.py).  bench.py bounds each case with signal.alarm — a
timeout landing during the (multi-minute at flagship scale) pickle dump
must not orphan the entry, so the write runs inside
utils/critical.py::critical_section and cooperating alarm handlers
defer until it completes.
"""

import os
import pickle
import signal
import time

import numpy as np
import pytest
import scipy.sparse as sp

from knpemi_tpu.solvers import mg
from knpemi_tpu.utils.critical import critical_section, in_critical_section


def _laplacian_2d(n1=30):
    I = sp.eye(n1, dtype=float)
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], (n1, n1))
    return (sp.kron(I, T) + sp.kron(T, I)).tocsr()


def test_cache_roundtrip(tmp_path):
    A = _laplacian_2d()
    d = str(tmp_path)
    h1 = mg.build_hierarchy_cached(A, cache_dir=d)
    files = os.listdir(d)
    assert len(files) == 1 and files[0].endswith(".pkl")
    t0 = time.perf_counter()
    h2 = mg.build_hierarchy_cached(A, cache_dir=d)
    hit = time.perf_counter() - t0
    assert len(h2.levels) == len(h1.levels)
    np.testing.assert_array_equal(h2.levels[0].diag, h1.levels[0].diag)
    # a different operator must not collide
    mg.build_hierarchy_cached(_laplacian_2d(31), cache_dir=d)
    assert len(os.listdir(d)) == 2
    assert hit < 5.0  # load, not rebuild


def test_cache_reuse_across_slab_dtype(tmp_path):
    """slab_dtype is storage-only: an entry built f64 serves an f32 run
    (cast on load) and vice versa — no rebuild, one entry."""
    A = _laplacian_2d(120)
    d = str(tmp_path)
    h64 = mg.build_hierarchy_cached(A, cache_dir=d, banded=True,
                                    slab_dtype=np.float64)
    h32 = mg.build_hierarchy_cached(A, cache_dir=d, banded=True,
                                    slab_dtype=np.float32)
    assert len(os.listdir(d)) == 1
    if h64.levels and h64.levels[0].a_band:
        s64 = h64.levels[0].a_band[0][0][0]
        s32 = h32.levels[0].a_band[0][0][0]
        assert s64.dtype == np.float64 and s32.dtype == np.float32
        np.testing.assert_allclose(s32, s64.astype(np.float32))


def test_cache_write_survives_watchdog_timeout(tmp_path):
    """An alarm firing mid-dump defers via the critical section; the
    entry lands intact and the timeout still raises afterwards."""
    A = _laplacian_2d()
    d = str(tmp_path)

    orig_dump = pickle.dump

    def slow_dump(obj, f, **kw):
        assert in_critical_section()
        signal.setitimer(signal.ITIMER_REAL, 0.02)
        time.sleep(0.15)  # several deferrals land here
        return orig_dump(obj, f, **kw)

    deferred = []

    def handler(signum, frame):
        if in_critical_section():
            deferred.append(1)
            signal.setitimer(signal.ITIMER_REAL, 0.02)
            return
        raise TimeoutError("watchdog")

    old_handler = signal.signal(signal.SIGALRM, handler)
    pickle.dump = slow_dump
    try:
        with pytest.raises(TimeoutError):
            mg.build_hierarchy_cached(A, cache_dir=d)
            time.sleep(0.1)  # the re-armed alarm lands here
    finally:
        signal.setitimer(signal.ITIMER_REAL, 0)
        pickle.dump = orig_dump
        signal.signal(signal.SIGALRM, old_handler)

    assert deferred, "alarm should have been deferred at least once"
    files = os.listdir(d)
    assert len(files) == 1 and files[0].endswith(".pkl")
    # the preserved entry is a valid cache hit
    h = mg.build_hierarchy_cached(A, cache_dir=d)
    assert h.levels


def test_critical_section_nesting():
    assert not in_critical_section()
    with critical_section():
        assert in_critical_section()
        with critical_section():
            assert in_critical_section()
        assert in_critical_section()
    assert not in_critical_section()


def test_emi_assembly_cache(tmp_path, monkeypatch):
    """Simulation._assemble_emi_cached: miss writes an entry whose hit
    reproduces the fresh CSR exactly; changed kappa keys a new entry
    (stale conductivity must never be served)."""
    import sys
    from pathlib import Path

    sys.path.insert(
        0, str(Path(__file__).resolve().parents[1] / "examples" / "idealized")
    )
    from run_2d import build_simulation
    from knpemi_tpu.solvers import direct as direct_mod

    monkeypatch.setenv("KNPEMI_MG_CACHE", str(tmp_path))
    # setup itself assembles once (MG build), leaving >=1 entry behind
    sim = build_simulation(resolution=1)
    n0 = sum(f.startswith("emi_") for f in os.listdir(tmp_path))
    kappa = {
        t: np.ones(s.n_cells) for t, s in sim.geom.subdomains.items()
    }
    A_fresh = direct_mod.assemble_emi_csr(sim.emi_sys, kappa)
    A_miss = sim._assemble_emi_cached(kappa)  # writes
    assert sum(f.startswith("emi_") for f in os.listdir(tmp_path)) == n0 + 1
    A_hit = sim._assemble_emi_cached(kappa)  # reads
    for A in (A_miss, A_hit):
        assert (A != A_fresh).nnz == 0
    kappa2 = {t: 2.0 * v for t, v in kappa.items()}
    A2 = sim._assemble_emi_cached(kappa2)
    assert sum(f.startswith("emi_") for f in os.listdir(tmp_path)) == n0 + 2
    assert (A2 != direct_mod.assemble_emi_csr(sim.emi_sys, kappa2)).nnz == 0


def test_cache_lru_eviction(tmp_path, monkeypatch):
    """Size-capped LRU: version bumps strand unreachable multi-GB
    entries (the key folds _BUILD_VERSION into the hash), so writes
    evict oldest-mtime files past KNPEMI_MG_CACHE_MAX_GB; reads touch
    mtime so hot entries survive."""
    d = str(tmp_path)
    # three fake stale entries, 1 MiB each, distinct ages
    for i, name in enumerate(["old_a.pkl", "old_b.pkl", "old_c.pkl"]):
        p = os.path.join(d, name)
        with open(p, "wb") as f:
            f.write(b"\0" * (1 << 20))
        past = time.time() - 3600 * (3 - i)
        os.utime(p, (past, past))
    # cap of ~2 MiB: the next cached build must evict the oldest
    monkeypatch.setenv("KNPEMI_MG_CACHE_MAX_GB", str(2 / 1024))
    mg.build_hierarchy_cached(_laplacian_2d(), cache_dir=d)
    names = set(os.listdir(d))
    # the new entry itself exceeds the tiny cap, so ALL stale files go
    # (the just-written entry is protected and survives)
    assert not any(n.startswith("old_") for n in names)
    assert any(n.endswith(".pkl") for n in names)
    # a cache HIT refreshes mtime (no eviction of the hot entry later)
    entry = next(n for n in names if not n.startswith("old_"))
    p = os.path.join(d, entry)
    past = time.time() - 9999
    os.utime(p, (past, past))
    mg.build_hierarchy_cached(_laplacian_2d(), cache_dir=d)
    assert os.path.getmtime(p) > time.time() - 60
    # cap <= 0 disables eviction entirely
    monkeypatch.setenv("KNPEMI_MG_CACHE_MAX_GB", "0")
    with open(os.path.join(d, "old_z.pkl"), "wb") as f:
        f.write(b"\0" * (1 << 20))
    mg.build_hierarchy_cached(_laplacian_2d(31), cache_dir=d)
    assert "old_z.pkl" in os.listdir(d)
