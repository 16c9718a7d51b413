"""Mixed-element-type (tri+quad) solver tests: the global-slot face space
couples blocks of different types exactly (ref:src/geometry.cpp:250-420
wires mixed meshes through shared inters objects; here a quad edge and a
tri edge meet in one flat gather table)."""

import numpy as np
import pytest

from hifiles_tpu.config.params import RunInput
from hifiles_tpu.mesh.generate import periodic_mixed_mesh_2d, periodic_quad_mesh
from hifiles_tpu.solver.multiblock import MixedSolver
from hifiles_tpu.solver.solver import Solver

from test_adv_diff import adv_diff_input


def vortex_input(order=3, viscous=0):
    p = RunInput()
    p.equation = 0
    p.viscous = viscous
    p.order = order
    p.ic_form = 0          # isentropic vortex
    p.test_case = 1
    p.adv_type = 3
    p.riemann_solve_type = 0
    p.dt_type = 0
    p.dt = 5e-4
    p.gamma = 1.4
    p.mach_free_stream = 0.3
    p.dx_cyclic = 20.0
    p.dy_cyclic = 20.0
    if viscous:
        p.mu_inf = 1e-4
        p.rt_inf = 1.0
        p.c_sth = 0.0
        p.fix_vis = 1
        p.prandtl = 0.72
    return p


def test_mixed_mesh_has_both_types():
    mesh = periodic_mixed_mesh_2d(8, 8, -10, 10, -10, 10)
    from hifiles_tpu import QUAD, TRI
    assert set(np.unique(mesh.ctype)) == {TRI, QUAD}


def test_mixed_vortex_accuracy_and_conservation():
    """Inviscid isentropic vortex on a tri+quad box: stable, conservative,
    and accurate at p=3."""
    p = vortex_input(order=3)
    mesh = periodic_mixed_mesh_2d(8, 8, -10, 10, -10, 10)
    s = MixedSolver(p, mesh)
    m0 = s.total_mass_energy()
    s.run(200, dt=5e-4)    # t = 0.1
    m1 = s.total_mass_energy()
    for u in s.u:
        assert np.isfinite(np.asarray(u)).all()
    # conservation of mass/momentum/energy on a periodic mesh
    assert np.abs(m1 - m0).max() < 1e-10, (m0, m1)
    err = s.compute_error(norm_type=2)
    l2_rho = np.sqrt(err[0, 0])
    assert l2_rho < 0.03, l2_rho   # == pure-quad error scale, see next test


def test_mixed_matches_pure_quad_flow():
    """The same vortex on a pure-quad mesh of the same box gives the same
    global error scale (sanity: the tri half doesn't corrupt the flow)."""
    p = vortex_input(order=3)
    mesh_m = periodic_mixed_mesh_2d(8, 8, -10, 10, -10, 10)
    sm = MixedSolver(p, mesh_m)
    sm.run(100, dt=5e-4)
    em = np.sqrt(sm.compute_error(norm_type=2)[0, 0])

    p2 = vortex_input(order=3)
    mesh_q = periodic_quad_mesh(8, 8, -10, 10, -10, 10)
    sq = Solver(p2, mesh_q)
    sq.run(100, dt=5e-4)
    eq = np.sqrt(sq.compute_error(norm_type=2)[0, 0])
    # same discretization error scale (measured: mixed within 5% of quad)
    assert em < 1.2 * eq, (em, eq)


def test_mixed_viscous_adv_diff():
    """LDG viscous path across the tri/quad interface: decaying sine wave
    (test_case 2) matches the analytic solution."""
    p = adv_diff_input(order=3, diff=0.05)
    mesh = periodic_mixed_mesh_2d(8, 8, -1, 1, -1, 1)
    s = MixedSolver(p, mesh)
    s.run(100, dt=1e-3)
    err = s.compute_error(norm_type=2)
    l2 = np.sqrt(err[0, 0])
    # measured 4.74e-4 at n=8; converges at order 4.05 (4->8->16 study)
    assert l2 < 6e-4, l2


def test_mixed_navier_stokes_stable():
    """Viscous NS on the mixed mesh: runs without blowup, mass conserved."""
    p = vortex_input(order=2, viscous=1)
    mesh = periodic_mixed_mesh_2d(6, 6, -10, 10, -10, 10)
    s = MixedSolver(p, mesh)
    m0 = s.total_mass_energy()
    s.run(100, dt=5e-4)
    m1 = s.total_mass_energy()
    for u in s.u:
        assert np.isfinite(np.asarray(u)).all()
    assert abs(m1[0] - m0[0]) < 1e-10


def test_mixed_vtu_output(tmp_path):
    from hifiles_tpu.io.vtu import write_vtu
    p = vortex_input(order=2)
    p.diagnostic_fields = ["u", "v", "pressure"]
    s = MixedSolver(p, periodic_mixed_mesh_2d(4, 4, -10, 10, -10, 10))
    out = write_vtu(s, str(tmp_path), 3)
    assert out.endswith(".pvtu")
    txt = open(out).read()
    assert txt.count("<Piece") == 2      # one piece per element type


def test_mixed_les_over_int_shock_capture():
    """LES (WALE), de-aliasing, and shock capture all run on the mixed
    mesh (previously gated)."""
    p = vortex_input(order=3, viscous=1)
    p.LES, p.SGS_model, p.C_s = 1, 1, 0.5
    p.filter_ratio = 2.0
    p.over_int, p.over_int_order = 1, 4
    p.shock_cap, p.shock_det = 1, 0
    p.s0, p.expf_fac, p.expf_order = -6.0, 4.0, 4
    mesh = periodic_mixed_mesh_2d(4, 4, -10, 10, -10, 10)
    s = MixedSolver(p, mesh)
    assert s.sensor_fns is not None
    s.run(20, dt=5e-4)
    for u in s.u:
        assert np.isfinite(np.asarray(u)).all()
    # pure similarity model (4) also runs now
    p2 = vortex_input(order=2, viscous=1)
    p2.LES, p2.SGS_model = 1, 4
    p2.filter_type, p2.filter_ratio = 2, 2.0
    s2 = MixedSolver(p2, mesh)
    s2.run(10, dt=5e-4)
    for u in s2.u:
        assert np.isfinite(np.asarray(u)).all()


def test_mixed_restart_roundtrip(tmp_path):
    """Mixed HDF5 restart: one dataset sized by the largest type, per-type
    hyperslabs by global cell id (ref:src/output.cpp:1841-1875)."""
    from hifiles_tpu.io.restart import read_restart, write_restart
    p = vortex_input(order=2)
    mesh = periodic_mixed_mesh_2d(4, 4, -10, 10, -10, 10)
    s = MixedSolver(p, mesh)
    s.run(10, dt=5e-4)
    refs = [np.asarray(u).copy() for u in s.u]
    path = write_restart(str(tmp_path), s, step=10)

    s2 = MixedSolver(vortex_input(order=2), mesh)
    t = read_restart(path, s2)
    assert abs(t - s.time) < 1e-15
    for a, b in zip(s2.u, refs):
        np.testing.assert_allclose(np.asarray(a), b, atol=1e-14)
    s2.run(5, dt=5e-4)
    for u in s2.u:
        assert np.isfinite(np.asarray(u)).all()


def test_mixed_similarity_and_rans():
    """Similarity SGS (WSM, model 2) and SA-RANS run on mixed meshes."""
    mesh = periodic_mixed_mesh_2d(4, 4, -10, 10, -10, 10)
    p = vortex_input(order=2, viscous=1)
    p.LES, p.SGS_model, p.C_s = 1, 2, 0.5
    p.filter_type, p.filter_ratio = 2, 2.0
    s = MixedSolver(p, mesh)
    s.run(15, dt=5e-4)
    for u in s.u:
        assert np.isfinite(np.asarray(u)).all()

    p2 = vortex_input(order=1, viscous=1)
    p2.RANS = 1
    p2.mu_tilde_c_ic = 5e-4
    p2.mu_tilde_inf = 5e-4
    p2.Kappa = 0.41
    s2 = MixedSolver(p2, mesh)
    assert s2.n_fields == 5          # 2-D + SA working variable
    s2.run(15, dt=2e-4)
    for u in s2.u:
        assert np.isfinite(np.asarray(u)).all()
