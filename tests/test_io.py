"""I/O tests: XDMF mesh round-trip, time-series output, checkpoint/resume."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples" / "idealized"))

from knpemi_tpu.mesh import unit_square_mms_mesh, idealized_3d_mesh
from knpemi_tpu.io import (
    read_mesh, write_mesh, TimeSeriesWriter,
    save_checkpoint, load_checkpoint,
)


@pytest.mark.parametrize("make", [lambda: unit_square_mms_mesh(6),
                                  lambda: idealized_3d_mesh(0, l=1)])
def test_xdmf_mesh_roundtrip(tmp_path, make):
    mesh = make()
    p = tmp_path / "mesh.xdmf"
    write_mesh(p, mesh)
    back = read_mesh(p)
    np.testing.assert_allclose(back.points, mesh.points)
    np.testing.assert_array_equal(back.cells, mesh.cells)
    np.testing.assert_array_equal(back.cell_tags, mesh.cell_tags)
    # facet tags are matched through sorted vertex tuples
    np.testing.assert_array_equal(
        np.sort(back.facet_tags[back.facet_tags > 0]),
        np.sort(mesh.facet_tags[mesh.facet_tags > 0]),
    )
    # exact per-facet equality (facet enumeration is deterministic)
    np.testing.assert_array_equal(back.facet_tags, mesh.facet_tags)


def test_timeseries_writer(tmp_path):
    mesh = unit_square_mms_mesh(4)
    w = TimeSeriesWriter(tmp_path / "out.xdmf", mesh.points, mesh.cells)
    for i in range(3):
        w.write(0.1 * i, {"phi": np.full(mesh.n_points, float(i))})
    w.close()
    import h5py

    with h5py.File(tmp_path / "out.h5", "r") as h5:
        assert np.allclose(h5["/Function/phi/2"][...], 2.0)
    assert (tmp_path / "out.xdmf").exists()


def test_timeseries_reader_point_evaluation(tmp_path):
    """Post-hoc probing parity (reference make_figures.py:54-62:
    read_function + scifem.evaluate_function at arbitrary points): write
    a series of LINEAR fields, reopen it, and point-evaluate anywhere —
    P1 interpolation of a linear function is exact, including at points
    never registered as probes during the 'run'."""
    from knpemi_tpu.io import TimeSeriesReader

    mesh = unit_square_mms_mesh(8)
    w = TimeSeriesWriter(tmp_path / "out.xdmf", mesh.points, mesh.cells)
    for i in range(4):
        f = (1.0 + i) * mesh.points[:, 0] + 2.0 * mesh.points[:, 1] + i
        w.write(0.5 * i, {"phi": f, "c_K": 3.0 * f})
    w.close()

    with TimeSeriesReader(tmp_path / "out.xdmf") as r:
        assert r.fields == ["c_K", "phi"]
        np.testing.assert_allclose(r.times, [0.0, 0.5, 1.0, 1.5])
        pts = np.array([[0.33, 0.41], [0.05, 0.93], [0.5, 0.5]])
        tr = r.evaluate("phi", pts)  # (n_times, n_pts)
        for i in range(4):
            exact = (1.0 + i) * pts[:, 0] + 2.0 * pts[:, 1] + i
            np.testing.assert_allclose(tr[i], exact, rtol=1e-12)
        # single-step + nearest-time read
        np.testing.assert_allclose(
            r.evaluate("c_K", pts, step=2),
            3.0 * (3.0 * pts[:, 0] + 2.0 * pts[:, 1] + 2.0), rtol=1e-12,
        )
        np.testing.assert_allclose(
            r.read("phi", time=0.49), r.read("phi", step=1)
        )


def test_checkpoint_resume_bitexact(tmp_path):
    from run_2d import build_simulation

    sim = build_simulation(resolution=1)
    s = sim.init_state()
    s, _, _ = sim.run(s, 5)
    save_checkpoint(tmp_path / "ck.npz", s, note=42)
    loaded, meta = load_checkpoint(tmp_path / "ck.npz")
    assert int(meta["note"]) == 42
    assert int(loaded.step) == 5
    # resume both and compare bit-exactly after 5 more steps
    a, _, _ = sim.run(s, 5)
    b, _, _ = sim.run(loaded, 5)
    for tag in a.c:
        np.testing.assert_array_equal(np.asarray(a.c[tag]), np.asarray(b.c[tag]))
    for m in a.ode_states:
        np.testing.assert_array_equal(
            np.asarray(a.ode_states[m]), np.asarray(b.ode_states[m])
        )
    assert float(a.t) == float(b.t)


def test_checkpoint_orbax_roundtrip(tmp_path):
    from run_2d import build_simulation
    from knpemi_tpu.io.checkpoint import (
        save_checkpoint_orbax, load_checkpoint_orbax,
    )

    sim = build_simulation(resolution=1)
    s = sim.init_state()
    s, _, _ = sim.run(s, 2)
    save_checkpoint_orbax(tmp_path / "ck_orbax", s, note=7)
    loaded, meta = load_checkpoint_orbax(tmp_path / "ck_orbax")
    assert int(np.asarray(meta["note"])) == 7
    assert int(loaded.step) == 2
    for tag in s.c:
        np.testing.assert_array_equal(np.asarray(s.c[tag]),
                                      np.asarray(loaded.c[tag]))
    for m in s.ode_states:
        np.testing.assert_array_equal(np.asarray(s.ode_states[m]),
                                      np.asarray(loaded.ode_states[m]))
    assert float(s.t) == float(loaded.t)
