"""Golden-value regression against the reference solver binary.

This mirrors the reference's own regression harness
(ref:testcases/regression_tests.py:292-307): L1 residual norms of the
monitor row at iteration 25, tol=1e-5.  The golden values below were
MEASURED by building the reference (CMake Release, BLAS=NO) and running the
unmodified TGV deck on this host — the script's published numbers
[0.00013215, 0.05076817, ...] are stale: the fork's own binary does not
reproduce them either (it prints the values used here).

The monitored residual in the reference is the one computed by the *last RK
stage* of the step (div_tconf is left over from stage 5's CalcResidual,
ref:src/HiFiLES.cpp:201-218 + output.cpp:2166), so the final step is
replayed stage-by-stage here.
"""

import os

import numpy as np
import pytest

from hifiles_tpu.config.params import RunInput
from hifiles_tpu.mesh.gambit import read_gambit
from hifiles_tpu.solver.solver import Solver
from hifiles_tpu.solver.step import RK45_A, RK45_B

TGV_DIR = "/root/reference/testcases/navier-stokes/Taylor_Green_vortex"
CYL_DIR = "/root/reference/testcases/navier-stokes/cylinder"

# measured from the reference binary, iter-25 monitor row, 2026-08-16
TGV_GOLD = [0.00810359, 0.05676473, 0.05674665, 0.07418955, 2.01757042]

# Viscous cylinder (ref:testcases/regression_tests.py:288-296): Mach-1.1
# flow over a cylinder — 2-D quadratic-tri mesh, Sutherland viscosity,
# isothermal no-slip wall + supersonic in/outflow, CFL-driven global dt,
# SSP-RK34, shock capture.  Golden values MEASURED from the reference
# binary (iter-25 monitor row + Fx/Fy, 2026-08-16); the script's published
# numbers are stale, as for TGV.  The shipped deck SEGFAULTS under the
# unmodified reference binary: eles::set_transforms (ref:src/eles.cpp:4023)
# only allocates the interface-cubature arrays when calc_force!=0, but
# bdy_inters::add_les_inlet -> cal_inlet_area
# (ref:src/bdy_inters.cpp:1278,2104-2123) dereferences them whenever the
# mesh has an inlet BC.  Repaired minimally by adding "calc_force 1" /
# "area_ref 1.0" to the deck (pure diagnostics — the solution and the
# monitored residuals are unaffected) and goldens were measured on that
# repaired deck.
CYL_GOLD = [0.17023244, 0.22772988, 0.09086940, 0.46347871]
CYL_GOLD_FORCE = [1.94739123, -0.03981771]

# HiOCFD C1.4 laminar flat-plate boundary layer, mesh a2, p=3 (BASELINE
# config family; ref:testcases/navier-stokes/readme.txt:42-77).  Golden
# values MEASURED from the reference binary (iter-200 L2 monitor row +
# Fx/Fy, 2026-08-17) on tests/decks/input_flatplate_a2_200 — the shipped
# input_flatplate_a uses the pre-fork deck format, so the deck was
# repaired for the UF fork: named-group BCs added for the mesh's
# Slip_Wall/Adiabat_Fix/Char/Sub_Out_Simp groups (freestream state from
# Re=1e6: rho=Re*mu/(u*L)=0.10526358, p=rho*R*T=9060.2 Pa), rho/IC keys
# the fork requires, calc_force enabled, and dt rescaled to
# 2e-6*time_ref because the fork divides deck dt by time_ref
# (ref:src/input.cpp:617) while the legacy deck's dt was already
# non-dimensional (2e-6 as dimensional seconds is unstable: CFL~13).
FP_DIR = os.path.join(os.path.dirname(__file__), "decks")
FP_GOLD = [0.06421395, 0.13984144, 0.11072044, 0.64321392]
FP_GOLD_FORCE = [0.05970840, 0.06847462]
FP_MESH = ("/root/reference/testcases/navier-stokes/flatplate/"
           "flatplate_a2-125-2s.neu")

# Inviscid (Euler) cylinder (ref:testcases/euler/cylinder): Mach-0.1
# flow, characteristic far field + slip wall, global CFL dt, HLLC, RK45.
# Golden values MEASURED from the reference binary (iter-25 L1 row +
# Fx/Fy, 2026-08-17) on tests/decks/input_cylinder_inv_25 — repaired
# minimally: the shipped deck's BC keys use the stale group name "far"
# while the mesh's group is "Char"; write_type 2 (CGNS) hard-aborts in a
# non-CGNS reference build (switched to ParaView); n_steps=25;
# calc_force enabled (also required to avoid the fork's inlet-area
# segfault, see CYL_GOLD notes).  The euler branch performs no
# non-dimensionalization, so residuals are in dimensional units.
CYL_INV_GOLD = [6.17442828, 1829.77315318, 1337.25064793, 1861625.56379559]
CYL_INV_GOLD_FORCE = [22.16527890, -0.07263786]

# Sod shock tube (ref:testcases/euler/stube): Gmsh quad strip, slip
# walls, Persson sensor + exponential filter each RK stage, fixed dt.
# Golden = iter-100 L1 monitor row measured from the reference binary
# (2026-08-17); the y-momentum residual is zero by symmetry.  Deck
# repaired only in n_steps/plot_freq (tests/decks/input_shock_tube_100).
STUBE_GOLD = [57.68885576, 19489.43382489, 0.0, 16331957.89797418]

# same case with the Werner-Wengle wall model on the plate
# (wall_model 1 + bc_Adiabat_Fix_use_wm 1) — BASELINE.json's wall-model
# configuration family; goldens measured 2026-08-17
FP_WM_GOLD = [0.00585716, 0.06137557, 0.00457232, 0.05648320]
FP_WM_GOLD_FORCE = [0.00961978, -0.00133826]


def last_stage_residual(solver, n_steps, dt, post_stage=None):
    """Replicate n_steps of RK45, returning the stage-5 rhs of the last step
    (what the reference's residual monitor reports).  ``post_stage`` is the
    per-stage shock-capture hook (ref:src/HiFiLES.cpp:211-218)."""
    import jax.numpy as jnp

    ps = post_stage if post_stage is not None else (lambda u: u)
    if n_steps > 1:
        solver.run(n_steps - 1, dt=dt)
    u, r = solver.u, solver.reg * 0.0
    rhs_last = None
    for s in range(5):
        rhs_last = solver.residual_fn(u)
        r = RK45_A[s] * r + dt * rhs_last
        u = ps(u + RK45_B[s] * r)
    solver.u = u
    return np.asarray(rhs_last)


@pytest.mark.skipif(not os.path.isdir(CYL_DIR), reason="reference absent")
def test_cylinder_residual_forces_regression():
    """No-slip wall + supersonic char BCs + shock capture + CFL dt golden
    check on the reference's second regression case — coverage TGV's fully
    periodic box cannot give (ref:testcases/regression_tests.py:288-296)."""
    from hifiles_tpu.io.forces import compute_forces

    p = RunInput.from_deck(os.path.join(CYL_DIR, "input_cylinder_visc"))
    p.n_steps = 25
    mesh = read_gambit(os.path.join(CYL_DIR, "cylinder_2ndorder_tri_vis.neu"))
    s = Solver(p, mesh)
    for _ in range(24):
        s.run(1)          # dt_type=1: global CFL dt recomputed per step
    # final step: SSP-RK34 stage-by-stage with per-stage shock capture
    # (ref:src/HiFiLES.cpp:201-218); the monitor reports the residual of
    # the LAST CalcResidual of the step
    dt = s.compute_dt()
    ps = s._post_stage if s._post_stage is not None else (lambda u: u)
    u0 = u = s.u
    rhs = s.residual_fn(u)
    u = ps(u + dt / 2.0 * rhs)
    rhs = s.residual_fn(u)
    u = ps(u + dt / 2.0 * rhs)
    rhs = s.residual_fn(u)
    u = ps(u / 3.0 + 2.0 / 3.0 * u0 + dt / 6.0 * rhs)
    rhs = s.residual_fn(u)
    u = ps(u + dt / 2.0 * rhs)
    s.u = u
    res = s.residual_norm(norm_type=1, r=np.asarray(rhs))
    for mine, gold in zip(res, CYL_GOLD):
        assert abs(mine - gold) < 1e-5, (list(res), CYL_GOLD)
    force = compute_forces(s)["force"]
    for mine, gold in zip(force, CYL_GOLD_FORCE):
        assert abs(mine - gold) < 1e-5, (list(force), CYL_GOLD_FORCE)


@pytest.mark.skipif(not os.path.isdir(CYL_DIR), reason="reference absent")
def test_euler_cylinder_residual_forces_regression():
    """Inviscid Mach-0.1 cylinder: char far field + slip wall + CFL dt on
    the Euler branch (no non-dimensionalization), HLLC, RK45."""
    from hifiles_tpu.io.forces import compute_forces

    p = RunInput.from_deck(os.path.join(FP_DIR, "input_cylinder_inv_25"))
    mesh = read_gambit(os.path.join(
        "/root/reference/testcases/euler/cylinder",
        "cylinder_2ndorder_tri_vis.neu"))
    s = Solver(p, mesh)
    for _ in range(24):
        s.run(1)
    rhs = last_stage_residual(s, 1, s.compute_dt())
    res = s.residual_norm(norm_type=1, r=rhs)
    for mine, gold in zip(res, CYL_INV_GOLD):
        assert abs(mine - gold) < 1e-7 * max(1.0, abs(gold)), \
            (list(res), CYL_INV_GOLD)
    force = compute_forces(s)["force"]
    for mine, gold in zip(force, CYL_INV_GOLD_FORCE):
        assert abs(mine - gold) < 1e-6 * max(1.0, abs(gold)), \
            (list(force), CYL_INV_GOLD_FORCE)


@pytest.mark.skipif(not os.path.isdir(CYL_DIR), reason="reference absent")
def test_shock_tube_residual_regression():
    """Sod shock tube with per-stage shock capture: the stabilization
    path (Persson sensor + exp filter) against the reference binary."""
    from hifiles_tpu.mesh.gmsh import read_gmsh

    p = RunInput.from_deck(os.path.join(FP_DIR, "input_shock_tube_100"))
    mesh = read_gmsh(os.path.join("/root/reference/testcases/euler/stube",
                                  "shock_tube101.msh"))
    s = Solver(p, mesh)
    rhs = last_stage_residual(s, 100, p.dt, post_stage=s._post_stage)
    res = s.residual_norm(norm_type=1, r=rhs)
    for mine, gold in zip(res, STUBE_GOLD):
        assert abs(mine - gold) < 1e-7 * max(1.0, abs(gold)), \
            (list(res), STUBE_GOLD)


@pytest.mark.skipif(not os.path.isdir(CYL_DIR), reason="reference absent")
def test_flatplate_residual_forces_regression():
    """Laminar flat-plate BL (HiOCFD C1.4 a2 p=3): quads + slip wall +
    adiabatic no-slip wall + characteristic far field + subsonic outflow,
    fixed dt, RK45 — the wall-bounded viscous golden check on the deck
    family BASELINE.json's wall cases build on."""
    from hifiles_tpu.io.forces import compute_forces

    p = RunInput.from_deck(os.path.join(FP_DIR, "input_flatplate_a2_200"))
    mesh = read_gambit(FP_MESH)
    s = Solver(p, mesh)
    rhs = last_stage_residual(s, 200, p.dt)
    res = s.residual_norm(norm_type=2, r=rhs)
    for mine, gold in zip(res, FP_GOLD):
        assert abs(mine - gold) < 1e-5, (list(res), FP_GOLD)
    force = compute_forces(s)["force"]
    for mine, gold in zip(force, FP_GOLD_FORCE):
        assert abs(mine - gold) < 1e-5, (list(force), FP_GOLD_FORCE)


@pytest.mark.skipif(not os.path.isdir(CYL_DIR), reason="reference absent")
def test_flatplate_wall_model_regression():
    """Werner-Wengle wall model on the flat plate (BASELINE.json's
    wall-model configuration family) — the wall-stress law replaces the
    no-slip viscous flux on the plate (ref:src/bdy_inters.cpp:1095-1131,
    wall_model_funcs.cpp)."""
    p = RunInput.from_deck(os.path.join(FP_DIR,
                                        "input_flatplate_a2_200_wm"))
    mesh = read_gambit(FP_MESH)
    s = Solver(p, mesh)
    rhs = last_stage_residual(s, 200, p.dt)
    res = s.residual_norm(norm_type=2, r=rhs)
    for mine, gold in zip(res, FP_WM_GOLD):
        assert abs(mine - gold) < 1e-5, (list(res), FP_WM_GOLD)


@pytest.mark.skipif(not os.path.isdir(TGV_DIR), reason="reference absent")
def test_tgv_residual_regression():
    p = RunInput.from_deck(os.path.join(TGV_DIR, "input_TGV_SD_hex"))
    mesh = read_gambit(os.path.join(TGV_DIR,
                                    "Taylor-Green-Vortex-hex.neu"))
    s = Solver(p, mesh)
    rhs = last_stage_residual(s, 25, p.dt)
    res = s.residual_norm(norm_type=1, r=rhs)
    for mine, gold in zip(res, TGV_GOLD):
        assert abs(mine - gold) < 1e-5, (list(res), TGV_GOLD)
