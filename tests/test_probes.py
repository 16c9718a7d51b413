"""Probe tests: generators, cell location via shape-map inversion, sampling
accuracy, HDF5 time appends."""

import numpy as np

from hifiles_tpu.config.params import RunInput
from hifiles_tpu.io.probes import (ProbeHDF5Writer, ProbeSet, locate_points,
                                   probe_circle, probe_cone, probe_cube,
                                   probe_line)
from hifiles_tpu.mesh.generate import periodic_quad_mesh
from hifiles_tpu.solver.ics import eval_isentropic_vortex
from hifiles_tpu.solver.solver import Solver


def _solver():
    p = RunInput()
    p.equation = 0
    p.viscous = 0
    p.order = 3
    p.ic_form = 0
    p.test_case = 1
    p.n_steps = 0
    p.adv_type = 3
    p.riemann_solve_type = 0
    p.dt_type = 0
    p.dt = 1e-3
    p.vcjh_scheme_quad = 1
    p.dx_cyclic = 10.0
    p.dy_cyclic = 10.0
    mesh = periodic_quad_mesh(8, 8, -5, 5, -5, 5)
    return Solver(p, mesh)


def test_generators():
    line = probe_line([0, 0], [1, 1], 5)
    assert line.shape == (5, 2) and np.allclose(line[-1], [1, 1])
    circ = probe_circle([0, 0], 2.0, 8)
    assert np.allclose(np.linalg.norm(circ, axis=1), 2.0)
    circ3 = probe_circle([0, 0, 0], 1.0, 16, normal=[0, 0, 1])
    assert np.allclose(circ3[:, 2], 0.0)
    cone = probe_cone([0, 0, 0], [0, 0, 1], 1.0, 0.5, 3, 8)
    assert cone.shape == (24, 3)
    cube = probe_cube([0, 0], [1, 2], [3, 5])
    assert cube.shape == (15, 2)


def test_locate_and_sample():
    s = _solver()
    pts = np.array([[0.3, 0.7], [-2.1, 1.9], [4.9, -4.9]])
    ele, ref = locate_points(s.mesh, pts)
    assert (ele >= 0).all()
    ps = ProbeSet(s, pts, ["rho", "u", "v", "pressure"])
    vals = ps.sample()
    rho_a, vel_a, p_a = eval_isentropic_vortex(pts, 0.0, 1.4)
    # p=3 interpolation of the vortex on h=1.25 cells
    np.testing.assert_allclose(vals[:, 0], rho_a, atol=2e-3)
    np.testing.assert_allclose(vals[:, 1], vel_a[:, 0], atol=5e-3)
    np.testing.assert_allclose(vals[:, 3], p_a, atol=5e-3)


def test_point_outside_mesh():
    s = _solver()
    ele, _ = locate_points(s.mesh, np.array([[11.0, 0.0]]))
    assert ele[0] == -1


def test_hdf5_probe_appends(tmp_path):
    import h5py
    s = _solver()
    ps = ProbeSet(s, probe_line([-4, 0], [4, 0], 9), ["rho", "pressure"])
    w = ProbeHDF5Writer(str(tmp_path / "probe_line.h5"), ps)
    w.append(0.0)
    s.run(3, dt=1e-3)
    w.append(s.time)
    with h5py.File(w.path) as f:
        assert f["time"].shape == (2,)
        assert f["data"].shape == (2, 9, 2)
        assert np.isfinite(f["data"][...]).all()


# ----------------------------------------------------------------------
# mixed-mesh probes (round-5: per-type locate + per-type opp_probe,
# ref:src/probe_input.cpp:1190-1204 set_loc_probepts -> per-type calc_p2c)

def test_locate_and_sample_mixed_2d():
    """Probes on the tri+quad vortex mesh (the BASELINE #2 layout): both
    element types must locate and sample against the analytic vortex."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_mixed import vortex_input

    from hifiles_tpu.mesh.generate import periodic_mixed_mesh_2d
    from hifiles_tpu.solver.multiblock import MixedSolver

    p = vortex_input(order=3)
    mesh = periodic_mixed_mesh_2d(8, 8, -10, 10, -10, 10)
    s = MixedSolver(p, mesh)
    # left half = quads, right half = tris; core point + far corner
    pts = np.array([[-5.1, 0.3], [5.2, -0.7], [0.05, 0.0], [-9.9, 9.9]])
    ele, _ = locate_points(mesh, pts)
    assert (ele >= 0).all()
    assert set(np.asarray(mesh.ctype)[ele].tolist()) == {0, 1}
    ps = ProbeSet(s, pts, ["rho", "u", "v", "pressure"])
    assert ps.owned.size == pts.shape[0]
    vals = ps.sample()
    rho_a, vel_a, p_a = eval_isentropic_vortex(pts, 0.0, 1.4)
    # h=2.5 cells: the vortex-core probe (index 2, kept for tri-side
    # location coverage) carries ~3e-2 p=3 interpolation error that the
    # momentum/density division amplifies to ~0.1 on u — check it loosely
    # and the off-core probes tightly
    np.testing.assert_allclose(vals[:, 0], rho_a, atol=3e-2)
    np.testing.assert_allclose(vals[:, 1], vel_a[:, 0], atol=1.5e-1)
    off = [0, 1, 3]
    np.testing.assert_allclose(vals[off, 0], rho_a[off], atol=2e-3)
    np.testing.assert_allclose(vals[off, 1], vel_a[off, 0], atol=5e-3)
    np.testing.assert_allclose(vals[off, 3], p_a[off], atol=5e-3)


def test_probes_prism_tet_wm_wall_layer():
    """Probe the wall layer of the prism/tet wall-modeled channel — the
    production configuration mixed probes exist for (BASELINE #4 twin)."""
    import os

    from hifiles_tpu.mesh.generate import channel_prism_tet_mesh
    from hifiles_tpu.solver.multiblock import MixedSolver

    deck = os.path.join(os.path.dirname(__file__), "decks",
                        "input_prism_tet_wm_25")
    p = RunInput.from_deck(deck)
    mesh = channel_prism_tet_mesh(4, 4, 2, 2, x1=2.0, y1=1.0, z1=1.0)
    s = MixedSolver(p, mesh)
    # wall-normal line through the prism layer (y<0.5) into the tet
    # region (y>0.5)
    pts = probe_line([1.01, 0.02, 0.52], [1.01, 0.93, 0.52], 7)
    ps = ProbeSet(s, pts, ["rho", "u", "pressure"])
    assert ps.owned.size == 7
    cts = set(np.asarray(mesh.ctype)[ps.ele[ps.owned]].tolist())
    assert cts == {2, 3}, cts        # TET and PRISM both sampled
    s.run(2, dt=p.dt)
    vals = ps.sample()
    assert np.isfinite(vals).all() and (vals[:, 0] > 0).all()


def test_probes_sharded_mixed_match():
    """ShardedMixedSolver probes (gather_u tuple path) must equal the
    single-device MixedSolver samples."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_mixed import vortex_input

    import jax
    from hifiles_tpu.mesh.generate import periodic_mixed_mesh_2d
    from hifiles_tpu.parallel.mixed_sharding import ShardedMixedSolver
    from hifiles_tpu.solver.multiblock import MixedSolver

    p = vortex_input(order=2)
    mesh = periodic_mixed_mesh_2d(8, 4, -10, 10, -10, 10)
    pts = np.array([[-5.1, 0.3], [5.2, -0.7], [0.05, 0.0]])
    s1 = MixedSolver(p, mesh)
    ps1 = ProbeSet(s1, pts, ["rho", "u", "pressure"])
    import jax.numpy as jnp
    ss = ShardedMixedSolver(vortex_input(order=2), mesh,
                            devices=jax.devices()[:4], dtype=jnp.float64)
    ps2 = ProbeSet(ss, pts, ["rho", "u", "pressure"])
    np.testing.assert_allclose(ps2.sample(), ps1.sample(), atol=1e-12)


def test_ascii_probe_writer(tmp_path):
    """ProbeASCIIWriter: per-point .dat files, one %20.10e row per append,
    viscous rows re-dimensionalized (ref:src/output.cpp:1403-1548)."""
    from hifiles_tpu.io.probes import ProbeASCIIWriter

    s = _solver()
    pts = probe_line([-4, 0], [4, 0], 5)
    ps = ProbeSet(s, pts, ["rho", "pressure"])
    w = ProbeASCIIWriter(str(tmp_path / "line"), ps)
    w.append(0.0)
    s.run(2, dt=1e-3)
    w.append(s.time)
    vals = ps.sample()
    for k in range(5):
        rows = (tmp_path / "line" / f"probe_{k}.dat").read_text() \
            .splitlines()
        assert len(rows) == 2
        cols = [float(c) for c in rows[1].split()]
        assert len(cols) == 3
        # inviscid run: no re-dimensionalization
        np.testing.assert_allclose(cols[1:], vals[k], rtol=1e-9)
        assert abs(cols[0] - s.time) < 1e-12
