"""Turbulent inlet tests: white-noise and synthetic-eddy-method inflow
(ref:src/bdy_inters.cpp:1140-2320, ref:src/solver.cpp:111-118)."""

import numpy as np
import pytest

from hifiles_tpu.config.params import (BCParams, CYCLIC, SUB_IN_SIMP,
                                       SUB_OUT_SIMP, RunInput)
from hifiles_tpu.mesh.generate import channel_quad_mesh
from hifiles_tpu.solver.solver import Solver


def les_channel_input(inlet_type=2, n_eddy=40, mode=0):
    p = RunInput()
    p.equation = 0
    p.viscous = 1
    p.LES = 1
    p.SGS_model = 1            # WALE
    p.C_s = 0.5
    p.filter_ratio = 2.0
    p.order = 2
    p.ic_form = 1
    p.adv_type = 3
    p.riemann_solve_type = 0
    p.dt_type = 0
    p.dt = 1e-5
    p.vcjh_scheme_quad = 1
    p.dy_cyclic = 1.0
    p.gamma, p.R_gas, p.fix_vis = 1.4, 286.9, 1
    p.Mach_free_stream, p.T_free_stream = 0.2, 300.0
    p.rho_free_stream = 1.17723946
    p.mu_gas = 1.827e-5
    p.Mach_c_ic, p.T_c_ic, p.rho_c_ic = 0.2, 300.0, 1.17723946
    p.nx_c_ic, p.ny_c_ic = 1.0, 0.0
    p.setup_params()
    # boundary groups in code units (read_boundary_params would produce
    # these from a deck; built directly here)
    inflow = BCParams(name="Inflow", flag=SUB_IN_SIMP, rho=p.rho_c_ic,
                      velocity=(p.u_c_ic, 0.0, 0.0),
                      inlet_type=inlet_type, mode=mode,
                      turb_1=(0.01 * p.u_c_ic * p.uvw_ref) ** 2 if mode == 0
                      else 0.01,
                      turb_2=10.0, n_eddy=n_eddy, vis_y=0.0)
    outflow = BCParams(name="Outflow", flag=SUB_OUT_SIMP,
                       p_static=p.p_c_ic, T_total=p.T_c_ic)
    cyc = BCParams(name="Cyclic", flag=CYCLIC)
    p.bc_list = [inflow, outflow, cyc]
    return p


def make_solver(inlet_type, **kw):
    p = les_channel_input(inlet_type=inlet_type, **kw)
    mesh = channel_quad_mesh(8, 4, 0.0, 2.0, 0.0, 1.0)
    return Solver(p, mesh)


def test_sem_inlet_runs_and_perturbs():
    """SEM inlet: stable run whose velocity field differs from the
    laminar (inlet_type=0) run — fluctuations are actually injected."""
    s_sem = make_solver(inlet_type=2)
    assert s_sem.turb_inlet is not None
    assert s_sem.turb_inlet.inlet_type == 2
    s_sem.run(50, dt=1e-5)
    u_sem = np.asarray(s_sem.u)
    assert np.isfinite(u_sem).all()

    s_lam = make_solver(inlet_type=0)
    assert s_lam.turb_inlet is None
    s_lam.run(50, dt=1e-5)
    u_lam = np.asarray(s_lam.u)
    diff = np.abs(u_sem[..., 1] - u_lam[..., 1]).max()
    assert diff > 1e-8, diff      # momentum field perturbed
    # perturbation is a small fluctuation, not a blowup
    assert diff < 0.5 * abs(s_sem.p.u_c_ic), diff


def test_white_noise_inlet_runs():
    s = make_solver(inlet_type=1)
    assert s.turb_inlet.inlet_type == 1
    s.run(30, dt=1e-5)
    assert np.isfinite(np.asarray(s.u)).all()


def test_sem_mass_flux_correction():
    """The injected fluctuation field carries zero net mass flux
    (ref:src/bdy_inters.cpp:1891-1990 correct_mass)."""
    import jax.numpy as jnp
    s = make_solver(inlet_type=2)
    ti = s.turb_inlet
    # boundary-point solution from the current state
    import jax
    disu_f = np.einsum("pu,euf->epf", s.ops.opp_0,
                       np.asarray(s.u)).reshape(-1, s.n_fields)
    u_bl = jnp.asarray(disu_f[s.block.bdy_slot], dtype=s.dtype)
    state, fluc = ti.update(ti.init_state, u_bl, 1e-5)
    fluc = np.asarray(fluc)
    assert np.isfinite(fluc).all()
    # recompute the mass flux integral over inlet points
    slots = s.block.bdy_slot[ti.in_faces]
    mask = s.block.bdy_mask[ti.in_faces]
    wq = s.ops.fpt_weights[slots % s.ops.n_fpts]
    wdA = wq * s.block.tdA_fpts[slots] * mask
    # SUB_IN_SIMP ghost density is the (constant) deck rho
    mf = float(np.sum(wdA * fluc[ti.in_faces][..., 0] * s.p.rho_c_ic))
    area = float(wdA.sum())
    assert abs(mf) / max(area, 1e-30) < 1e-12, mf


def test_sem_eddies_recycle():
    """Eddies advected out of the bounding box re-enter (positions stay
    bounded over many steps, ref:src/bdy_inters.cpp:1697-1757)."""
    import jax.numpy as jnp
    s = make_solver(inlet_type=2, n_eddy=20)
    s.run(100, dt=1e-4)
    eddy_pos = np.asarray(s._ti_state[0])
    assert np.isfinite(eddy_pos).all()
    # channel is x in [0,2], y in [0,1]; box is inlet plane +- ls
    assert np.abs(eddy_pos).max() < 5.0, eddy_pos.max()
