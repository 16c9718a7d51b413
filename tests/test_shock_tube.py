"""Sod shock tube with Persson sensor + exponential-filter shock capturing
(testcases/euler/stube parameters: s0=0.001, expf_order=4, HLLC, p=2),
validated against the exact Riemann solution."""

import numpy as np
import pytest

from hifiles_tpu.config.params import RunInput
from hifiles_tpu.mesh.generate import channel_quad_mesh
from hifiles_tpu.solver.solver import Solver

GAMMA = 1.4


def exact_sod(x, t, x0, rho_l, p_l, rho_r, p_r, gamma=GAMMA):
    """Exact solution of the Sod Riemann problem (zero initial velocity)."""
    c_l = np.sqrt(gamma * p_l / rho_l)
    c_r = np.sqrt(gamma * p_r / rho_r)

    def f(p, rho_k, p_k, c_k):
        if p > p_k:  # shock
            A = 2.0 / ((gamma + 1) * rho_k)
            B = (gamma - 1) / (gamma + 1) * p_k
            return (p - p_k) * np.sqrt(A / (p + B))
        return (2 * c_k / (gamma - 1)) * ((p / p_k) ** ((gamma - 1)
                                                        / (2 * gamma)) - 1)

    # Newton iteration for p_star
    p_star = 0.5 * (p_l + p_r)
    for _ in range(60):
        fl, fr = f(p_star, rho_l, p_l, c_l), f(p_star, rho_r, p_r, c_r)
        dfl = ((p_star / p_l) ** (-(gamma + 1) / (2 * gamma))) / (rho_l * c_l) \
            if p_star <= p_l else _df_shock(p_star, rho_l, p_l, gamma)
        dfr = ((p_star / p_r) ** (-(gamma + 1) / (2 * gamma))) / (rho_r * c_r) \
            if p_star <= p_r else _df_shock(p_star, rho_r, p_r, gamma)
        p_star -= (fl + fr) / (dfl + dfr)
    u_star = 0.5 * (f(p_star, rho_r, p_r, c_r) - f(p_star, rho_l, p_l, c_l))

    xi = (x - x0) / t
    rho = np.empty_like(xi)
    # left rarefaction (p_star < p_l for Sod)
    rho_star_l = rho_l * (p_star / p_l) ** (1 / gamma)
    c_star_l = np.sqrt(gamma * p_star / rho_star_l)
    head, tail = -c_l, u_star - c_star_l
    # right shock
    s_shock = u_star + c_r * np.sqrt((gamma + 1) / (2 * gamma) * p_star / p_r
                                     + (gamma - 1) / (2 * gamma))
    rho_star_r = rho_r * ((p_star / p_r + (gamma - 1) / (gamma + 1))
                          / ((gamma - 1) / (gamma + 1) * p_star / p_r + 1))
    for i, s in enumerate(xi):
        if s < head:
            rho[i] = rho_l
        elif s < tail:
            # inside the left fan: c = (2 c_l - (gamma-1) s) / (gamma+1)
            c = (2 / (gamma + 1)) * (c_l - (gamma - 1) / 2 * s)
            rho[i] = rho_l * (c / c_l) ** (2 / (gamma - 1))
        elif s < u_star:
            rho[i] = rho_star_l
        elif s < s_shock:
            rho[i] = rho_star_r
        else:
            rho[i] = rho_r
    return rho


def _df_shock(p, rho_k, p_k, gamma):
    A = 2.0 / ((gamma + 1) * rho_k)
    B = (gamma - 1) / (gamma + 1) * p_k
    return np.sqrt(A / (p + B)) * (1 - (p - p_k) / (2 * (p + B)))


def _sod_input():
    p = RunInput()
    p.equation = 0
    p.viscous = 0
    p.order = 2
    p.ic_form = 10
    p.x_shock_ic = 5.0
    p.adv_type = 3
    p.riemann_solve_type = 3
    p.dt_type = 0
    p.dt = 2e-6
    p.n_steps = 0
    p.vcjh_scheme_quad = 1
    p.shock_cap = 1
    p.shock_det = 0
    p.s0 = 1e-3
    p.expf_fac = 36.0
    p.expf_order = 4
    p.expf_cutoff = 0
    p.shock_det_field = 0
    p.dy_cyclic = 0.2
    # boundary groups for the channel mesh
    p.u_c_ic = p.v_c_ic = p.w_c_ic = 0.0
    p.p_c_ic = 1e4
    p.rho_c_ic = 0.125
    from hifiles_tpu.config.params import BCParams, CYCLIC, SLIP_WALL
    p.bc_list = [BCParams(name="L", flag=SLIP_WALL),
                 BCParams(name="R", flag=SLIP_WALL),
                 BCParams(name="Cyclic", flag=CYCLIC)]
    return p


def _run_sod(shock_cap, n_steps=1000):
    p = _sod_input()
    p.shock_cap = shock_cap
    mesh = channel_quad_mesh(120, 2, 0.0, 10.0, 0.0, 0.2,
                             bc_x="L", bc_X="R")
    s = Solver(p, mesh)
    s.run(n_steps, dt=p.dt)     # default t = 2 ms
    return s, n_steps * p.dt


def test_sod_shock_tube_with_capture():
    s, t = _run_sod(shock_cap=1)
    u = np.asarray(s.u)
    assert np.isfinite(u).all()

    # cell-mean density vs exact solution
    w = s.ops.upts_weights[None, :] * s.block.detjac_upts
    rho_mean = np.einsum("eu,eu->e", w, u[..., 0]) / w.sum(axis=1)
    x_mean = np.einsum("eu,eu->e", w, s.block.pos_upts[..., 0]) / w.sum(axis=1)
    rho_exact = exact_sod(x_mean, t, 5.0, 1.0, 1e5, 0.125, 1e4)
    l1 = np.abs(rho_mean - rho_exact).mean()
    # shock-capturing FR at p=2 on h=1/12: expect L1 ~ a few 1e-3
    assert l1 < 0.02, l1
    # no spurious oscillations beyond ~5% overshoot in cell means
    assert rho_mean.max() < 1.05 and rho_mean.min() > 0.11

    # nodal overshoot stays small with capture on (measured ~0.5%)
    assert u[..., 0].max() < 1.02 and u[..., 0].min() > 0.115

    # without the filter the same run degrades into Gibbs oscillations
    # and goes non-finite within t = 5 ms — the capture is load-bearing.
    # The exact blow-up step is knife-edge (ulp-level geometry changes
    # shift it, round 5), so run longer and accept either the NaN or a
    # severe density undershoot (capture keeps rho_min > 0.115) as the
    # no-capture signature.
    s0_run, _ = _run_sod(shock_cap=0, n_steps=2500)
    u0 = np.asarray(s0_run.u)
    assert (not np.isfinite(u0).all()) or u0[..., 0].min() < 0.105
