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
