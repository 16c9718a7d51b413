"""Wall-model tests: Werner-Wengle / log-law stress values and a channel
run with wall-modeled isothermal walls."""

import numpy as np
import jax.numpy as jnp
import pytest

from hifiles_tpu.config.params import (ADIABAT_WALL, BCParams, CYCLIC,
                                       ISOTHERM_WALL, RunInput)
from hifiles_tpu.mesh.generate import channel_quad_mesh
from hifiles_tpu.models.wall_model import wall_stress_flux
from hifiles_tpu.solver.solver import Solver


def test_werner_wengle_laminar_limit():
    """In the viscous sublayer (Re_y < 11.81^2), WW reduces to
    tau_w = mu u / y (ref:src/wall_model_funcs.cpp:63-69)."""
    n_dims = 2
    mu_inf = 1e-3
    rho, uvel, y = 1.0, 0.1, 1e-3
    u_wm = jnp.asarray([[rho, rho * uvel, 0.0, 1.0 / 0.4 + 0.5 * rho * uvel**2]])
    u_w = jnp.asarray([[rho, 0.0, 0.0, 1.0 / 0.4]])
    norm = jnp.asarray([[0.0, -1.0]])
    fn = wall_stress_flux(u_wm, u_w, jnp.asarray([y]), norm, wall_model=1,
                          gamma=1.4, prandtl=0.72, prandtl_t=0.9,
                          mu_inf=mu_inf, rt_inf=1.0, c_sth=0.0, fix_vis=1,
                          kappa=0.41, n_dims=n_dims)
    fn = np.asarray(fn)
    # Re_y = rho*u*y/mu = 100 < 139.5 -> laminar: tau = mu*u/y
    tau_exact = mu_inf * uvel / y
    assert abs(fn[0, 1] - tau_exact) / tau_exact < 1e-6
    assert fn[0, 0] == 0.0


def test_loglaw_recovers_utau():
    """Log-law model: tau_w consistent with u+ = log(y+)/kappa + 5.2."""
    kappa, C = 0.41, 5.2
    mu, rho, y = 1e-4, 1.0, 0.05
    utau_true = 0.05
    yplus = rho * y * utau_true / mu
    uplus = np.log(yplus) / kappa + C
    uvel = utau_true * uplus
    # incompressible-ish: huge internal energy so Van Driest B >> u
    e_int = 1e4
    u_wm = jnp.asarray([[rho, rho * uvel, 0.0, rho * (e_int + 0.5 * uvel**2)]])
    u_w = jnp.asarray([[rho, 0.0, 0.0, rho * e_int]])
    norm = jnp.asarray([[0.0, -1.0]])
    fn = wall_stress_flux(u_wm, u_w, jnp.asarray([y]), norm, wall_model=2,
                          gamma=1.4, prandtl=0.72, prandtl_t=0.9,
                          mu_inf=mu, rt_inf=(1.4 - 1.0) * e_int,
                          c_sth=0.0, fix_vis=1, kappa=kappa, n_dims=2)
    tau = float(np.asarray(fn)[0, 1])
    assert abs(tau - rho * utau_true**2) / (rho * utau_true**2) < 0.02, tau


def test_wall_modeled_channel_runs():
    p = RunInput()
    p.equation = 0
    p.viscous = 1
    p.LES = 1
    p.SGS_model = 0
    p.C_s = 0.1
    p.filter_ratio = 2.0
    p.wall_model = 1
    p.order = 2
    p.ic_form = 1
    p.adv_type = 3
    p.riemann_solve_type = 0
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
    p.setup_params()
    p.bc_list = [BCParams(name="Cyc", flag=CYCLIC),
                 BCParams(name="unused", flag=CYCLIC),
                 BCParams(name="Wall", flag=ISOTHERM_WALL,
                          T_static=1.0, use_wm=1)]
    mesh = channel_quad_mesh(8, 4, 0.0, 4.0, 0.0, 1.0,
                             bc_x="Cyc", bc_X="Cyc", bc_y="Wall")
    mesh.bc_id[mesh.bc_id == 1] = 0
    s = Solver(p, mesh)
    s.run(20, dt=p.dt)
    u = np.asarray(s.u)
    assert np.isfinite(u).all()
    assert u[..., 0].min() > 0
