"""Driver-level checkpoint/resume (astrocyte flagship driver).

The reference writes per-step .bp output but cannot restart a run
(SURVEY.md §5 "Checkpoint / resume"); here the driver checkpoints the
complete SimState + observer traces every ``checkpoint_every`` steps and
``--resume`` continues to Tstop.  Asserted:

* a run split across a clean stop + resume reproduces the uninterrupted
  run bit-exactly (state, traces, and XDMF series);
* resuming from a *pre-crash* checkpoint (ckpt_prev, with the XDMF h5
  containing frames that postdate it) truncates the lost tail and still
  reproduces the uninterrupted run.
"""

import importlib.util
import shutil
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_EX = Path(__file__).resolve().parents[1] / "examples"


def _load_driver():
    name = "astro_driver_resume"
    spec = importlib.util.spec_from_file_location(
        name, _EX / "astrocyte" / "run_stim_duration.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _config(tmpdir_name):
    from knpemi_tpu.sim.config import load_config

    cfg = load_config(_EX / "astrocyte" / "config_files" / "baseline.yml")
    cfg.update(
        mesh_n=8, Tstop=1.0, save_frequency=2, save_frequency_fields=2,
        checkpoint_every=4, fname=tmpdir_name,
        # refresh disabled -> resumed and uninterrupted runs share one
        # frozen hierarchy and must agree bit-exactly
        solver={"mg_refresh_every": 0, "mg_refresh_async": False},
    )
    return cfg


def _read_series(path):
    import h5py

    out = {}
    with h5py.File(path, "r") as h5:
        for name in h5["Function"]:
            for i in h5[f"Function/{name}"]:
                out[f"{name}/{i}"] = np.asarray(h5[f"Function/{name}/{i}"])
        for i in h5.get("Time", {}):
            out[f"t/{i}"] = float(h5[f"Time/{i}"][()])
    return out


def _assert_same_run(out_a, out_b, tr_a, tr_b, st_a, st_b):
    np.testing.assert_array_equal(np.asarray(tr_a["t"]), np.asarray(tr_b["t"]))
    for k in tr_a:
        np.testing.assert_allclose(
            np.asarray(tr_a[k]), np.asarray(tr_b[k]), rtol=0, atol=0,
            err_msg=k)
    for tag in st_a.c:
        np.testing.assert_array_equal(st_a.c[tag], st_b.c[tag])
        np.testing.assert_array_equal(st_a.phi[tag], st_b.phi[tag])
    for tag in st_a.phi_M:
        np.testing.assert_array_equal(st_a.phi_M[tag], st_b.phi_M[tag])
        np.testing.assert_array_equal(st_a.ode_states[tag], st_b.ode_states[tag])
    for f in sorted(out_a.glob("results_sub_*.h5")):
        a = _read_series(f)
        b = _read_series(out_b / f.name)
        assert a.keys() == b.keys(), f.name
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=f"{f.name}:{k}")


def test_clean_stop_and_crash_resume(tmp_path):
    drv = _load_driver()

    # uninterrupted 1.0 ms run: the gold standard
    cfg = _config("gold")
    st_gold, tr_gold, _, _ = drv.solve_system(
        cfg, verbose=False, outdir=str(tmp_path))
    gold_dir = tmp_path / "gold"
    assert (gold_dir / "ckpt.npz").exists()

    # leg 1: clean stop at 0.4 ms; leg 2: --resume to 1.0 ms
    cfg = _config("split")
    cfg["Tstop"] = 0.4
    drv.solve_system(cfg, verbose=False, outdir=str(tmp_path))
    cfg["Tstop"] = 1.0
    st_b, tr_b, _, _ = drv.solve_system(
        cfg, verbose=False, outdir=str(tmp_path), resume=True)
    st_gold_h, st_b_h = map(_host, (st_gold, st_b))
    _assert_same_run(gold_dir, tmp_path / "split", tr_gold, tr_b,
                     st_gold_h, st_b_h)

    # resuming a completed run is a no-op
    st_c, tr_c, it_e, _ = drv.solve_system(
        cfg, verbose=False, outdir=str(tmp_path), resume=True)
    assert len(it_e) == 0 and int(st_c.step) == 10

    # crash simulation: run to 0.8 ms (checkpoints at steps 4 and 8),
    # then "lose" everything after step 4 by restoring ckpt_prev — the
    # XDMF h5 retains post-step-4 frames that resume must truncate
    cfg = _config("crash")
    cfg["Tstop"] = 0.8
    drv.solve_system(cfg, verbose=False, outdir=str(tmp_path))
    crash_dir = tmp_path / "crash"
    prev = crash_dir / "ckpt_prev.npz"
    assert prev.exists()
    shutil.copy(prev, crash_dir / "ckpt.npz")
    cfg["Tstop"] = 1.0
    st_d, tr_d, _, _ = drv.solve_system(
        cfg, verbose=False, outdir=str(tmp_path), resume=True)
    assert int(st_d.step) == 10
    _assert_same_run(gold_dir, crash_dir, tr_gold, tr_d,
                     st_gold_h, _host(st_d))


def _host(state):
    import jax

    return jax.device_get(state)
