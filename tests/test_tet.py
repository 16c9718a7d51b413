"""Tet element tests: operator exactness, DG lift, periodic TGV run."""

import numpy as np
import pytest

from hifiles_tpu.config.params import RunInput
from hifiles_tpu.mesh.generate import periodic_tet_mesh
from hifiles_tpu.ops.operators import build_tet_ops
from hifiles_tpu.solver.solver import Solver


@pytest.mark.parametrize("order,upts_type", [(1, 0), (2, 0), (3, 0), (2, 1)])
def test_tet_opp_polynomial_exactness(order, upts_type):
    ops = build_tet_ops(order, upts_type=upts_type)
    rng = np.random.default_rng(0)
    terms = [(i, j, k) for i in range(order + 1)
             for j in range(order + 1 - i) for k in range(order + 1 - i - j)]
    coef = rng.normal(size=len(terms))

    def poly(locs):
        return sum(c * locs[:, 0] ** i * locs[:, 1] ** j * locs[:, 2] ** k
                   for c, (i, j, k) in zip(coef, terms))

    u = poly(ops.loc_upts)
    np.testing.assert_allclose(ops.opp_0 @ u, poly(ops.tloc_fpts), atol=1e-8)
    du = sum(c * i * ops.loc_upts[:, 0] ** max(i - 1, 0)
             * ops.loc_upts[:, 1] ** j * ops.loc_upts[:, 2] ** k
             for c, (i, j, k) in zip(coef, terms))
    np.testing.assert_allclose(ops.opp_2[0] @ u, du, atol=1e-8)


@pytest.mark.parametrize("order", [1, 2])
def test_tet_dg_lift_identity(order):
    ops = build_tet_ops(order)
    rng = np.random.default_rng(1)
    a = rng.normal(size=3)
    b = rng.normal(size=(3, 3))
    tdisf = np.stack([a[d] + ops.loc_upts @ b[d] for d in range(3)], axis=1)
    flux_f = np.stack([a[d] + ops.tloc_fpts @ b[d] for d in range(3)], axis=1)
    fn_common = np.sum(flux_f * ops.tnorm_fpts, axis=1)
    div_disc = sum(ops.opp_2[d] @ tdisf[:, d] for d in range(3))
    norm_tdisf = sum(ops.opp_1[d] @ tdisf[:, d] for d in range(3))
    div = div_disc + ops.opp_3 @ (fn_common - norm_tdisf)
    np.testing.assert_allclose(div, np.trace(b) * np.ones(ops.n_upts),
                               atol=1e-8)


def test_tet_freestream():
    ops = build_tet_ops(2)
    const = np.ones(ops.n_upts)
    F = np.array([1.3, -0.7, 0.4])
    tdisf_cat = np.concatenate([F[d] * const for d in range(3)])
    fn = ops.tnorm_fpts @ F
    resid = ops.opp_div_fused @ tdisf_cat + ops.opp_3 @ fn
    np.testing.assert_allclose(resid, 0.0, atol=1e-8)


def test_tet_tgv_runs():
    """Viscous TGV on a periodic tet mesh: stable, conservative, KE decays."""
    p = RunInput()
    p.equation = 0
    p.viscous = 1
    p.order = 2
    p.ic_form = 7
    p.adv_type = 3
    p.riemann_solve_type = 0
    p.dt_type = 0
    p.dt = 1e-4
    p.n_steps = 0
    p.vcjh_scheme_tet = 1
    p.upts_type_tet = 0
    p.fpts_type_tet = 0
    p.dx_cyclic = p.dy_cyclic = p.dz_cyclic = 2 * np.pi
    p.gamma, p.R_gas, p.fix_vis = 1.4, 286.9, 1
    p.Mach_free_stream, p.T_free_stream = 0.1, 300.0
    p.rho_free_stream = 0.0008421095852102401
    p.mu_gas = 1.827e-5
    p.Mach_c_ic, p.T_c_ic, p.rho_c_ic = 0.1, 300.0, 0.0008421095852102401
    p.setup_params()
    mesh = periodic_tet_mesh(3, 3, 3)
    assert mesh.n_cells == 162
    s = Solver(p, mesh)
    w = s.ops.upts_weights[None, :] * s.block.detjac_upts
    mass0 = float(np.einsum("eu,eu->", w, np.asarray(s.u)[..., 0]))
    s.run(10, dt=p.dt)
    u = np.asarray(s.u)
    assert np.isfinite(u).all()
    mass1 = float(np.einsum("eu,eu->", w, u[..., 0]))
    assert abs(mass1 - mass0) < 1e-10 * abs(mass0)
