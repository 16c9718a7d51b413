"""SA-RANS smoke tests and the reference viscous-cylinder case
(supersonic inflow + isothermal wall on quadratic tris)."""

import os

import numpy as np
import pytest

from hifiles_tpu.config import Deck, RunInput
from hifiles_tpu.config.params import (ADIABAT_WALL, BCParams, CYCLIC,
                                       SUB_OUT_SIMP, SUP_IN)
from hifiles_tpu.mesh.gambit import read_gambit
from hifiles_tpu.mesh.generate import channel_quad_mesh
from hifiles_tpu.solver.solver import Solver

CYL_MESH = ("/root/reference/testcases/navier-stokes/cylinder/"
            "cylinder_2ndorder_tri_vis.neu")

VISC_CYL_DECK = """
equation  0
viscous   1
riemann_solve_type       0
vis_riemann_solve_type   0
ic_form    1
order      1
dt_type    0
dt         1e-7
n_steps    20
adv_type   3
ldg_tau    1.0
ldg_beta   0.5
upts_type_tri      0
fpts_type_tri      0
vcjh_scheme_tri    1
c_tri              0.0
gamma         1.4
prandtl       0.72
R_gas         286.9
mu_gas        1.827E-05
fix_vis       1
Mach_free_stream  1.1
rho_free_stream   1.17723946
T_free_stream     300.
L_free_stream     1.
Mach_c_ic         1.1
T_c_ic            300.
rho_c_ic          1.17723946
bc_Sup_In_type          sup_in
bc_Sup_In_p_static      101325.
bc_Sup_In_mach          1.1
bc_Sup_In_T_static      300
bc_Isotherm_Fix_type isotherm_wall
bc_Isotherm_Fix_T_static 300.
"""


@pytest.mark.skipif(not os.path.exists(CYL_MESH), reason="reference absent")
def test_viscous_cylinder_runs():
    p = RunInput.from_deck(Deck(VISC_CYL_DECK, "visc_cyl"))
    mesh = read_gambit(CYL_MESH)
    s = Solver(p, mesh)
    s.run(20, dt=p.dt)
    u = np.asarray(s.u)
    assert np.isfinite(u).all()
    assert u[..., 0].min() > 0


def _rans_channel_input():
    p = RunInput()
    p.equation = 0
    p.viscous = 1
    p.RANS = 1
    p.order = 1
    p.ic_form = 1
    p.adv_type = 3
    p.riemann_solve_type = 0   # Rusanov (Roe/HLLC rejected for RANS)
    p.dt_type = 0
    p.dt = 1e-5
    p.n_steps = 0
    p.vcjh_scheme_quad = 1
    p.dx_cyclic = 4.0
    p.gamma, p.R_gas, p.fix_vis = 1.4, 286.9, 1
    p.Mach_free_stream, p.T_free_stream = 0.2, 300.0
    p.rho_free_stream = 1.17723946
    p.mu_gas = 1.827e-5
    p.Mach_c_ic, p.T_c_ic, p.rho_c_ic = 0.2, 300.0, 1.17723946
    p.nx_c_ic, p.ny_c_ic = 1.0, 0.0
    p.setup_params()
    return p


def test_sa_rans_channel_smoke():
    """SA transport over adiabatic walls: stable, nu_tilde stays bounded."""
    p = _rans_channel_input()
    p.bc_list = [BCParams(name="Cyc", flag=CYCLIC),
                 BCParams(name="CycX", flag=CYCLIC),
                 BCParams(name="Wall", flag=ADIABAT_WALL)]
    mesh = channel_quad_mesh(8, 4, 0.0, 4.0, 0.0, 1.0,
                             bc_x="Cyc", bc_X="Cyc", bc_y="Wall")
    # x-cyclic pairing: the channel generator puts both x boundaries in
    # group 0/1; use a single cyclic group instead
    mesh.bc_id[mesh.bc_id == 1] = 0
    mesh.bc_names = ["Cyc", "unused", "Wall"]
    s = Solver(p, mesh)
    assert s.block.wall_dist_upts is not None
    assert s.block.wall_dist_upts.max() <= 0.5 + 1e-6  # mid-channel
    s.run(30, dt=p.dt)
    u = np.asarray(s.u)
    assert np.isfinite(u).all()
    # SA field: bounded, same order as its initial value
    nu = u[..., -1]
    assert nu.max() < 100 * p.mu_tilde_c_ic
    assert nu.min() > -10 * p.mu_tilde_c_ic
