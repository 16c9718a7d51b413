"""I/O tests: HDF5 restart round-trip (incl. cross-order re-interpolation),
vtu output well-formedness, history/integral diagnostics."""

import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from hifiles_tpu.config.params import RunInput
from hifiles_tpu.io.history import HistoryWriter, integral_quantities
from hifiles_tpu.io.restart import read_restart, write_restart
from hifiles_tpu.io.vtu import write_vtu
from hifiles_tpu.mesh.generate import periodic_quad_mesh
from hifiles_tpu.solver.solver import Solver


def vortex_input(order=3):
    p = RunInput()
    p.equation = 0
    p.viscous = 0
    p.order = order
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
    p.diagnostic_fields = ["u", "v", "pressure", "mach", "vorticity",
                           "q_criterion"]
    p.integral_quantities = ["kineticenergy", "enstropy"]
    return p


def test_restart_roundtrip(tmp_path):
    p = vortex_input()
    mesh = periodic_quad_mesh(6, 6, -5, 5, -5, 5)
    s = Solver(p, mesh)
    s.run(5, dt=1e-3)
    u_before = np.asarray(s.u)
    path = write_restart(str(tmp_path), s, step=5)
    assert os.path.basename(path) == "Rest_000000005.h5"

    s2 = Solver(p, mesh)
    t = read_restart(path, s2)
    np.testing.assert_allclose(np.asarray(s2.u), u_before, atol=0)
    assert abs(t - 5e-3) < 1e-12

    # layout check: matches the reference's (fields, cells, upts) dataset
    import h5py
    with h5py.File(path) as f:
        assert f["data"].shape == (4, 36, 16)
        assert "QUADS" in f
        assert f.attrs["order"] == 3


def test_restart_cross_order(tmp_path):
    """Restart written at p=3 read into a p=2 run re-interpolates
    (ref:src/eles.cpp:3692 opp_r)."""
    mesh = periodic_quad_mesh(6, 6, -5, 5, -5, 5)
    s3 = Solver(vortex_input(order=3), mesh)
    path = write_restart(str(tmp_path), s3, step=0)

    s2 = Solver(vortex_input(order=2), mesh)
    read_restart(path, s2)
    # vortex IC projected at p=3 then interpolated to p=2 points should be
    # close to the direct p=2 IC (coarse 6x6 mesh: interpolation error of
    # the sharp vortex core dominates, ~1% relative)
    direct = np.asarray(Solver(vortex_input(order=2), mesh).u)
    rel = (np.linalg.norm(np.asarray(s2.u) - direct)
           / np.linalg.norm(direct))
    assert rel < 0.01, rel


def test_vtu_output(tmp_path):
    p = vortex_input()
    p.p_res = 3
    p.data_file_name = "vort"
    mesh = periodic_quad_mesh(4, 4, -5, 5, -5, 5)
    s = Solver(p, mesh)
    fname = write_vtu(s, str(tmp_path), step=0)
    assert os.path.exists(fname)
    tree = ET.parse(fname)          # well-formed XML
    names = [da.get("Name") for da in tree.iter("DataArray")]
    for want in ("rho", "pressure", "mach", "vorticity", "q_criterion"):
        assert want in names, names
    assert os.path.exists(os.path.join(str(tmp_path), "vort_000000000.pvtu"))


def test_history_and_integrals(tmp_path):
    p = vortex_input()
    mesh = periodic_quad_mesh(6, 6, -5, 5, -5, 5)
    s = Solver(p, mesh)
    ints = integral_quantities(s, ["kineticenergy", "enstropy",
                                   "pressuredilatation",
                                   "straincolonproduct"])
    # vortex KE on [-5,5]^2: (1/2)rho|v|^2 with background |v|=sqrt(2)
    assert 90 < ints["kineticenergy"] < 110
    assert ints["enstropy"] > 0
    assert ints["straincolonproduct"] > 0

    hw = HistoryWriter(str(tmp_path / "history.plt"), s)
    row = hw.write(0)
    assert np.isfinite(row["residual"]).all()
    text = (tmp_path / "history.plt").read_text()
    assert "VARIABLES" in text and "kineticenergy" in text
    assert len(text.splitlines()) == 3


def test_restart_cross_order_ascii(tmp_path):
    """ASCII restart re-interpolates across orders too — the reference's
    opp_r path is format-independent (ref:src/eles.cpp:3692-3712)."""
    from hifiles_tpu.io.restart import (read_restart_ascii,
                                        write_restart_ascii)
    mesh = periodic_quad_mesh(6, 6, -5, 5, -5, 5)
    s3 = Solver(vortex_input(order=3), mesh)
    path = write_restart_ascii(str(tmp_path), s3, step=0)

    s2 = Solver(vortex_input(order=2), mesh)
    read_restart_ascii(path, s2)
    direct = np.asarray(Solver(vortex_input(order=2), mesh).u)
    rel = (np.linalg.norm(np.asarray(s2.u) - direct)
           / np.linalg.norm(direct))
    assert rel < 0.01, rel


def test_restart_cross_order_mixed(tmp_path):
    """Cross-order restart on a mixed tri+quad mesh: per-type opp_r."""
    from hifiles_tpu.mesh.generate import periodic_mixed_mesh_2d
    from hifiles_tpu.solver.multiblock import MixedSolver
    mesh = periodic_mixed_mesh_2d(4, 4, -10, 10, -10, 10)
    s3 = MixedSolver(vortex_input(order=3), mesh)
    path = write_restart(str(tmp_path), s3, step=0)

    s2 = MixedSolver(vortex_input(order=2), mesh)
    t = read_restart(path, s2)
    assert t == 0.0
    direct = MixedSolver(vortex_input(order=2), mesh)
    for a, b in zip(s2.u, direct.u):
        rel = (np.linalg.norm(np.asarray(a) - np.asarray(b))
               / np.linalg.norm(np.asarray(b)))
        assert rel < 0.02, rel
    s2.run(3, dt=5e-4)
    for u in s2.u:
        assert np.isfinite(np.asarray(u)).all()


def test_restart_cross_order_hex(tmp_path):
    """Cross-order restart for 3-D hexes (p=2 file -> p=1 run)."""
    from hifiles_tpu.mesh.generate import periodic_hex_mesh
    p2 = vortex_input(order=2)
    p2.ic_form = 1
    p2.u_c_ic = p2.v_c_ic = p2.w_c_ic = 0.1
    p2.dz_cyclic = 10.0
    mesh = periodic_hex_mesh(3, 3, 3, -5, 5, -5, 5, -5, 5)
    s2 = Solver(p2, mesh)
    path = write_restart(str(tmp_path), s2, step=0)

    p1 = vortex_input(order=1)
    p1.ic_form = 1
    p1.u_c_ic = p1.v_c_ic = p1.w_c_ic = 0.1
    p1.dz_cyclic = 10.0
    s1 = Solver(p1, mesh)
    read_restart(path, s1)
    # uniform flow is exactly representable at any order
    direct = np.asarray(Solver(p1, mesh).u)
    np.testing.assert_allclose(np.asarray(s1.u), direct, rtol=1e-12,
                               atol=1e-12)


def test_cgns_output(tmp_path):
    """CGNS/HDF5 writer: valid node tree, 1-based connectivity in range,
    vertex fields sized to the plot lattice (ref:src/output.cpp:901-1401)."""
    from hifiles_tpu.io.cgns import read_cgns_summary, write_cgns
    p = vortex_input()
    p.p_res = 3
    p.diagnostic_fields = ["u", "v", "pressure", "mach"]
    mesh = periodic_quad_mesh(4, 4, -5, 5, -5, 5)
    s = Solver(p, mesh)
    path = write_cgns(s, str(tmp_path), step=0)
    assert path.endswith("_000000000.cgns")
    info = read_cgns_summary(path)
    z = info["zones"][0]
    E, P = 16, 9
    assert z["n_vertices"] == E * P
    assert z["n_cells"] == E * 4
    assert z["conn_min"] >= 1 and z["conn_max"] <= E * P
    assert set(z["fields"]) >= {"Density", "VelocityX", "VelocityY",
                                "Pressure", "Mach"}
    assert z["x"].min() >= -5 - 1e-12 and z["x"].max() <= 5 + 1e-12


def test_cgns_output_mixed(tmp_path):
    """CGNS writer on a mixed tri+quad mesh: one zone per element type."""
    from hifiles_tpu.io.cgns import read_cgns_summary, write_cgns
    from hifiles_tpu.mesh.generate import periodic_mixed_mesh_2d
    from hifiles_tpu.solver.multiblock import MixedSolver
    p = vortex_input(order=2)
    p.p_res = 3
    mesh = periodic_mixed_mesh_2d(4, 4, -10, 10, -10, 10)
    s = MixedSolver(p, mesh)
    path = write_cgns(s, str(tmp_path), step=2)
    info = read_cgns_summary(path)
    assert len(info["zones"]) == 2
    for z in info["zones"]:
        assert z["n_vertices"] > 0 and z["n_cells"] > 0
        assert z["conn_max"] <= z["n_vertices"]
