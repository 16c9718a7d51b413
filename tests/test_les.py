"""LES SGS model smoke + physics tests on the 3-D Taylor-Green vortex."""

import numpy as np
import pytest

from hifiles_tpu.config.params import RunInput
from hifiles_tpu.mesh.generate import periodic_hex_mesh
from hifiles_tpu.solver.solver import Solver


def tgv_input(les=0, sgs_model=0, filter_type=2):
    p = RunInput()
    p.equation = 0
    p.viscous = 1
    p.order = 2
    p.ic_form = 7
    p.adv_type = 3
    p.riemann_solve_type = 3
    p.dt_type = 0
    p.dt = 1e-4
    p.n_steps = 0
    p.vcjh_scheme_hexa = 1
    p.LES = les
    p.SGS_model = sgs_model
    p.C_s = 0.1
    p.filter_ratio = 2.0
    p.filter_type = filter_type
    p.dx_cyclic = p.dy_cyclic = p.dz_cyclic = 2 * np.pi
    p.gamma, p.R_gas, p.fix_vis = 1.4, 286.9, 1
    p.Mach_free_stream, p.T_free_stream = 0.1, 300.0
    p.rho_free_stream = 0.0008421095852102401
    p.mu_gas = 1.827e-5
    p.Mach_c_ic, p.T_c_ic, p.rho_c_ic = 0.1, 300.0, 0.0008421095852102401
    p.setup_params()
    return p


def kinetic_energy(s):
    u = np.asarray(s.u)
    w = s.ops.upts_weights[None, :] * s.block.detjac_upts
    ke = 0.5 * np.sum(u[..., 1:4] ** 2, axis=-1) / u[..., 0]
    return float(np.einsum("eu,eu->", w, ke))


@pytest.mark.parametrize("sgs_model", [0, 1, 2, 3, 4])
def test_sgs_models_stable_and_dissipative(sgs_model):
    p = tgv_input(les=1, sgs_model=sgs_model)
    mesh = periodic_hex_mesh(4, 4, 4)
    s = Solver(p, mesh)
    ke0 = kinetic_energy(s)
    s.run(10, dt=p.dt)
    u = np.asarray(s.u)
    assert np.isfinite(u).all(), f"model {sgs_model} produced NaN"
    ke1 = kinetic_energy(s)
    assert ke1 <= ke0 * 1.0001, (ke0, ke1)


def test_smagorinsky_more_dissipative_than_laminar():
    mesh = periodic_hex_mesh(4, 4, 4)
    kes = []
    for les in (0, 1):
        p = tgv_input(les=les, sgs_model=0)
        p.C_s = 0.325
        s = Solver(p, mesh)
        s.run(50, dt=p.dt)
        kes.append(kinetic_energy(s))
    assert kes[1] < kes[0], kes  # SGS adds dissipation
