"""Advection-diffusion tests: exercise the LDG viscous/gradient path on
periodic meshes against the analytic decaying sine wave
(ref:src/funcs.cpp:1742-1794, test_case 2/3)."""

import numpy as np
import pytest

from hifiles_tpu.config.params import RunInput
from hifiles_tpu.mesh.generate import periodic_quad_mesh
from hifiles_tpu.solver.solver import Solver


def adv_diff_input(order=3, diff=0.05, beta=0.5, tau=1.0):
    p = RunInput()
    p.equation = 1
    p.viscous = 1
    p.order = order
    p.ic_form = 2
    p.test_case = 2
    p.n_steps = 0
    p.adv_type = 3
    p.riemann_solve_type = 1   # Lax-Friedrichs (required for adv-diff)
    p.dt_type = 0
    p.dt = 1e-3
    p.vcjh_scheme_quad = 1
    p.wave_speed = (1.0, 0.5, 0.0)
    p.diff_coeff = diff
    p.lambda_lf = 1.0
    p.ldg_beta = beta
    p.ldg_tau = tau
    p.dx_cyclic = 2.0
    p.dy_cyclic = 2.0
    return p


@pytest.mark.parametrize("beta,tau", [(0.5, 1.0), (0.0, 0.1)])
def test_adv_diff_sine_wave_accuracy(beta, tau):
    """Decaying advected sine wave matches the analytic solution."""
    p = adv_diff_input(order=3, diff=0.05, beta=beta, tau=tau)
    mesh = periodic_quad_mesh(8, 8, -1, 1, -1, 1)
    s = Solver(p, mesh)
    s.run(100, dt=1e-3)   # t = 0.1
    err = s.compute_error(norm_type=2)
    l2 = np.sqrt(err[0, 0])
    assert l2 < 2e-4, l2


def test_adv_diff_convergence_p2():
    errs = []
    for n in (4, 8):
        p = adv_diff_input(order=2, diff=0.02)
        mesh = periodic_quad_mesh(n, n, -1, 1, -1, 1)
        s = Solver(p, mesh)
        s.run(50 * n // 4, dt=2e-3 * 4 / n)
        errs.append(np.sqrt(s.compute_error(norm_type=2)[0, 0]))
    order = np.log2(errs[0] / errs[1])
    assert order > 2.4, (errs, order)


def test_pure_diffusion_decay():
    """No advection: rho = exp(-2 D pi^2 t) sin(pi(x+y)) decay rate."""
    p = adv_diff_input(order=3, diff=0.1)
    p.wave_speed = (0.0, 0.0, 0.0)
    mesh = periodic_quad_mesh(8, 8, -1, 1, -1, 1)
    s = Solver(p, mesh)
    u0 = np.asarray(s.u).copy()
    s.run(100, dt=1e-3)
    u1 = np.asarray(s.u)
    decay = np.exp(-2 * 0.1 * np.pi**2 * 0.1)
    ratio = np.linalg.norm(u1) / np.linalg.norm(u0)
    assert abs(ratio - decay) < 1e-4, (ratio, decay)


def test_gradient_error_convergence_tet():
    """Gradient-L2 error row (ref:src/eles.cpp:5109-5123,5185-5211) on
    tets converges at ~order p — the BASELINE.md NS-gradient-convergence
    evidence class (doc/AIAApaper summaryTable_ele1_err2: observed
    gradient orders ~= p for p=1..5 on tets)."""
    from hifiles_tpu.mesh.generate import periodic_tet_mesh

    errs_g, errs_s = [], []
    for n in (4, 8):
        p = adv_diff_input(order=2, diff=0.02)
        p.dz_cyclic = 2.0
        p.wave_speed = (1.0, 0.5, 0.25)
        mesh = periodic_tet_mesh(n, n, n, -1, 1, -1, 1, -1, 1)
        s = Solver(p, mesh)
        s.run(25 * n // 4, dt=2e-3 * 4 / n)
        err = np.sqrt(s.compute_error(norm_type=2))
        errs_s.append(err[0, 0])
        errs_g.append(err[1, 0])
    order_s = np.log2(errs_s[0] / errs_s[1])
    order_g = np.log2(errs_g[0] / errs_g[1])
    assert order_s > 2.4, (errs_s, order_s)
    assert order_g > 1.7, (errs_g, order_g)
