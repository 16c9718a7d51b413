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
