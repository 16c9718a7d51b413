"""Tecplot writer, ASCII restart, SEM restart, probe scripts, and
time-averaged fields (ref:src/output.cpp:165-460 write_tec,
:1753-1818 write_restart_ascii; ref:src/bdy_inters.cpp:2227-2320 SEM
restart; ref:src/probe_input.cpp:278-741 read_probe_script;
ref:src/eles.cpp:5630-5700 CalcTimeAverageQuantities)."""

import os

import numpy as np
import pytest

from hifiles_tpu.config.params import RunInput
from hifiles_tpu.mesh.generate import periodic_quad_mesh
from hifiles_tpu.solver.solver import Solver


def vortex_input(**kw):
    p = RunInput()
    p.equation = 0
    p.viscous = 0
    p.order = 2
    p.ic_form = 0
    p.test_case = 1
    p.adv_type = 3
    p.riemann_solve_type = 0
    p.dt_type = 0
    p.dt = 1e-3
    p.mach_free_stream = 0.3
    p.dx_cyclic = 20.0
    p.dy_cyclic = 20.0
    for k, v in kw.items():
        setattr(p, k, v)
    return p


def test_tecplot_writer(tmp_path):
    p = vortex_input()
    p.diagnostic_fields = ["u", "v", "pressure", "mach"]
    s = Solver(p, periodic_quad_mesh(4, 4, -10, 10, -10, 10))
    from hifiles_tpu.io.tecplot import write_tec
    fname = write_tec(s, str(tmp_path), 7)
    lines = open(fname).read().splitlines()
    assert lines[0].startswith("Title")
    assert '"mach"' in lines[1] and '"x"' in lines[1]
    zone = lines[2]
    assert "FEQUADRILATERAL" in zone
    # N points, then E connectivity rows of 4 one-based indices
    n_pts = int(zone.split("N =")[1].split(",")[0])
    table = np.loadtxt(lines[3:3 + n_pts])
    assert table.shape[1] == 2 + 4 + 4      # x y + cons + diag
    conn = np.loadtxt(lines[3 + n_pts:], dtype=int)
    assert conn.min() == 1 and conn.max() == n_pts


def test_ascii_restart_roundtrip(tmp_path):
    from hifiles_tpu.io.restart import read_restart_ascii, write_restart_ascii
    p = vortex_input()
    mesh = periodic_quad_mesh(4, 4, -10, 10, -10, 10)
    s = Solver(p, mesh)
    s.run(10, dt=1e-3)
    u_ref = np.asarray(s.u, dtype=np.float64).copy()
    t_ref = s.time
    path = write_restart_ascii(str(tmp_path), s, step=10)
    assert os.path.basename(path) == "Rest_000000010_p0000.dat"

    s2 = Solver(vortex_input(), mesh)
    t = read_restart_ascii(path, s2)
    assert abs(t - t_ref) < 1e-15
    np.testing.assert_allclose(np.asarray(s2.u, dtype=np.float64), u_ref,
                               rtol=0, atol=1e-14)


def test_probe_script_parsing(tmp_path):
    from hifiles_tpu.io.probes import read_probe_script
    script = tmp_path / "probes.txt"
    script.write_text("""
line wake ( 0.0 0.0 0.0  1.0 0.0 0.0  0.1 5 )
point ( 0.25 0.5 0.0 )
volume box {
  cube ( 0.0 0.0 0.0  2 2 1  0.5 0.5 1.0 )
}
""")
    sets = read_probe_script(str(script), 2)
    names = [n for n, _ in sets]
    assert names == ["wake", "point_0", "box"]
    wake = dict(sets)["wake"]
    assert wake.shape == (5, 2)
    np.testing.assert_allclose(wake[0], [0.0, 0.0])
    np.testing.assert_allclose(wake[-1], [1.0, 0.0], atol=1e-9)
    # geometric growth: first gap == init_incre
    np.testing.assert_allclose(wake[1, 0] - wake[0, 0], 0.1, rtol=1e-8)
    assert dict(sets)["box"].shape == (4, 2)


def test_time_average_fields():
    """rho/u averages: for a steady uniform flow the running average equals
    the instantaneous value; machinery matches ref::5676-5698."""
    p = vortex_input()
    p.ic_form = 1
    p.rho_c_ic, p.u_c_ic, p.v_c_ic = 1.0, 0.4, 0.1
    p.p_c_ic = 17.857142857142858
    p.gamma, p.R_gas = 1.4, 286.9
    p.test_case = 0
    p.average_fields = ["rho_average", "u_average", "v_average",
                        "e_average"]
    p.dx_cyclic = p.dy_cyclic = 2.0
    s = Solver(p, periodic_quad_mesh(4, 4, -1, 1, -1, 1))
    assert s.u_avg is not None and not s._simple
    s.run(25, dt=1e-4)
    avg = np.asarray(s.u_avg)
    np.testing.assert_allclose(avg[..., 0], 1.0, atol=1e-10)
    np.testing.assert_allclose(avg[..., 1], 0.4, atol=1e-10)
    np.testing.assert_allclose(avg[..., 2], 0.1, atol=1e-10)
    assert abs(float(s._t_sim) - 25e-4) < 1e-12


def test_sem_restart_roundtrip(tmp_path):
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_turb_inlet import make_solver
    from hifiles_tpu.io.restart import read_sem_restart, write_sem_restart
    s = make_solver(inlet_type=2, n_eddy=12)
    s.run(5, dt=1e-5)
    pos_ref = np.asarray(s._ti_state[0]).copy()
    sgn_ref = np.asarray(s._ti_state[1]).copy()
    write_sem_restart(str(tmp_path), 5, s.turb_inlet, s._ti_state, s.p)

    s2 = make_solver(inlet_type=2, n_eddy=12)
    assert read_sem_restart(str(tmp_path), 5, s2)
    np.testing.assert_allclose(np.asarray(s2._ti_state[0]), pos_ref,
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(s2._ti_state[1]), sgn_ref)
    assert not read_sem_restart(str(tmp_path), 99, s2)   # missing file


def test_tet_prism_vtu_and_probes(tmp_path):
    """ParaView output + probe location for 3-D simplex/hybrid types."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from hifiles_tpu.mesh.generate import (periodic_prism_mesh,
                                           periodic_tet_mesh)
    from hifiles_tpu.io.vtu import write_vtu
    from hifiles_tpu.io.probes import ProbeSet
    from test_face_path import tgv_input
    for gen in (periodic_tet_mesh, periodic_prism_mesh):
        p = tgv_input()
        p.viscous = 0
        p.mu_inf = float("nan")
        p.order = 2
        p.diagnostic_fields = ["u", "pressure"]
        s = Solver(p, gen(2, 2, 2))
        f = write_vtu(s, str(tmp_path), 1)
        assert "<VTKFile" in open(f).read()
        ps = ProbeSet(s, np.array([[0.3, 0.2, 0.1], [1.0, -1.0, 2.0]]),
                      ["rho", "pressure"])
        assert ps.owned.size == 2
        vals = ps.sample()
        assert np.isfinite(vals).all() and vals.shape == (2, 2)
