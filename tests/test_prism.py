"""Prism element tests: operator identities + periodic TGV run."""

import numpy as np
import pytest

from hifiles_tpu.config.params import RunInput
from hifiles_tpu.mesh.generate import periodic_prism_mesh
from hifiles_tpu.ops.operators import build_pri_ops
from hifiles_tpu.solver.solver import Solver


@pytest.mark.parametrize("order", [1, 2, 3])
def test_prism_opp_exactness(order):
    ops = build_pri_ops(order)
    rng = np.random.default_rng(0)
    terms = [(i, j, k) for i in range(order + 1)
             for j in range(order + 1 - i) for k in range(order + 1)]
    coef = rng.normal(size=len(terms))

    def poly(locs):
        return sum(c * locs[:, 0] ** i * locs[:, 1] ** j * locs[:, 2] ** k
                   for c, (i, j, k) in zip(coef, terms))

    u = poly(ops.loc_upts)
    np.testing.assert_allclose(ops.opp_0 @ u, poly(ops.tloc_fpts), atol=1e-8)
    dz = sum(c * k * locs_z(ops)[:, 0] * 0 for c, (i, j, k) in zip(coef, terms)) \
        if False else None
    du = sum(c * i * ops.loc_upts[:, 0] ** max(i - 1, 0)
             * ops.loc_upts[:, 1] ** j * ops.loc_upts[:, 2] ** k
             for c, (i, j, k) in zip(coef, terms))
    np.testing.assert_allclose(ops.opp_2[0] @ u, du, atol=1e-8)
    dw = sum(c * k * ops.loc_upts[:, 0] ** i * ops.loc_upts[:, 1] ** j
             * ops.loc_upts[:, 2] ** max(k - 1, 0)
             for c, (i, j, k) in zip(coef, terms))
    np.testing.assert_allclose(ops.opp_2[2] @ u, dw, atol=1e-8)


def locs_z(ops):
    return ops.loc_upts[:, 2:]


@pytest.mark.parametrize("order", [1, 2])
def test_prism_lift_identity(order):
    ops = build_pri_ops(order)
    rng = np.random.default_rng(1)
    a = rng.normal(size=3)
    b = rng.normal(size=(3, 3))
    tdisf = np.stack([a[d] + ops.loc_upts @ b[d] for d in range(3)], axis=1)
    ff = np.stack([a[d] + ops.tloc_fpts @ b[d] for d in range(3)], axis=1)
    fnc = np.sum(ff * ops.tnorm_fpts, axis=1)
    div = (sum(ops.opp_2[d] @ tdisf[:, d] for d in range(3))
           + ops.opp_3 @ (fnc - sum(ops.opp_1[d] @ tdisf[:, d]
                                    for d in range(3))))
    np.testing.assert_allclose(div, np.trace(b) * np.ones(ops.n_upts),
                               atol=1e-8)


def test_prism_tgv_runs():
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
    p.vcjh_scheme_pri_1d = 1
    p.vcjh_scheme_tri = 1
    p.upts_type_pri_tri = 0
    p.upts_type_pri_1d = 0
    p.dx_cyclic = p.dy_cyclic = p.dz_cyclic = 2 * np.pi
    p.gamma, p.R_gas, p.fix_vis = 1.4, 286.9, 1
    p.Mach_free_stream, p.T_free_stream = 0.1, 300.0
    p.rho_free_stream = 0.0008421095852102401
    p.mu_gas = 1.827e-5
    p.Mach_c_ic, p.T_c_ic, p.rho_c_ic = 0.1, 300.0, 0.0008421095852102401
    p.setup_params()
    mesh = periodic_prism_mesh(3, 3, 3)
    assert mesh.n_cells == 54
    s = Solver(p, mesh)
    w = s.ops.upts_weights[None, :] * s.block.detjac_upts
    mass0 = float(np.einsum("eu,eu->", w, np.asarray(s.u)[..., 0]))
    s.run(10, dt=p.dt)
    u = np.asarray(s.u)
    assert np.isfinite(u).all()
    mass1 = float(np.einsum("eu,eu->", w, u[..., 0]))
    assert abs(mass1 - mass0) < 1e-10 * abs(mass0)

@pytest.mark.parametrize("order", [1, 2, 3])
def test_prism_over_int_projection_identity(order):
    """interp to over-int cubature then L2-project back = identity on the
    prism polynomial space (ref:src/eles_pris.cpp:938-969)."""
    from hifiles_tpu.ops.stabilization import build_over_int_ops
    ops = build_pri_ops(order)
    _, opp_over, over_filter = build_over_int_ops(ops, order + 2)
    np.testing.assert_allclose(over_filter @ opp_over, np.eye(ops.n_upts),
                               atol=1e-10)


def test_prism_tgv_over_int():
    """Prism TGV with polynomial de-aliasing: conservative and close to
    the nodal-flux run on a smooth field."""
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
    p.vcjh_scheme_pri_1d = 1
    p.vcjh_scheme_tri = 1
    p.upts_type_pri_tri = 0
    p.upts_type_pri_1d = 0
    p.dx_cyclic = p.dy_cyclic = p.dz_cyclic = 2 * np.pi
    p.gamma, p.R_gas, p.fix_vis = 1.4, 286.9, 1
    p.Mach_free_stream, p.T_free_stream = 0.1, 300.0
    p.rho_free_stream = 0.0008421095852102401
    p.mu_gas = 1.827e-5
    p.Mach_c_ic, p.T_c_ic, p.rho_c_ic = 0.1, 300.0, 0.0008421095852102401
    p.over_int, p.over_int_order = 1, 4
    p.setup_params()
    mesh = periodic_prism_mesh(3, 3, 3)
    s = Solver(p, mesh)
    w = s.ops.upts_weights[None, :] * s.block.detjac_upts
    mass0 = float(np.einsum("eu,eu->", w, np.asarray(s.u)[..., 0]))
    s.run(10, dt=p.dt)
    u = np.asarray(s.u)
    assert np.isfinite(u).all()
    mass1 = float(np.einsum("eu,eu->", w, u[..., 0]))
    assert abs(mass1 - mass0) < 1e-10 * abs(mass0)
    p2 = RunInput()
    for k, v in vars(p).items():
        setattr(p2, k, v)
    p2.over_int = 0
    s2 = Solver(p2, mesh)
    s2.run(10, dt=p.dt)
    rel = np.abs(u - np.asarray(s2.u)) / np.abs(np.asarray(s2.u)).max()
    # the projected flux differs from the nodal flux by the aliasing
    # error only — small on this smooth field, but nonzero
    assert 0 < rel.max() < 5e-4, rel.max()
