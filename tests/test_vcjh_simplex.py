"""Simplex VCJH correction (c != 0) for tris and tets
(ref:src/funcs.cpp:717-886 compute_filt_matrix_tri,
ref:src/eles_tets.cpp:1305-1500 compute_filt_matrix_tet)."""

import numpy as np
import pytest

from hifiles_tpu.config.params import RunInput
from hifiles_tpu.mesh.generate import periodic_mixed_mesh_2d, periodic_tet_mesh
from hifiles_tpu.ops.operators import (build_tet_ops, build_tri_ops,
                                       vcjh_filter_tri)
from hifiles_tpu.solver.solver import Solver


def test_dg_filter_is_identity():
    ops_dg = build_tri_ops(3, vcjh_scheme=1)
    ops_c0 = build_tri_ops(3, vcjh_scheme=0, c_tri=0.0)
    np.testing.assert_allclose(ops_dg.opp_3, ops_c0.opp_3, atol=1e-14)


@pytest.mark.parametrize("scheme", [2, 3, 4])
def test_tri_vcjh_scheme_lift_differs_but_conserves(scheme):
    """SD-like/HU-like/C+ filters change the lift but keep conservation:
    the correction's volume integral must equal the face quadrature of the
    correction function (divergence theorem => sum_u w_u opp_3[u, f] is the
    same for every c)."""
    ops_dg = build_tri_ops(3, vcjh_scheme=1)
    ops = build_tri_ops(3, vcjh_scheme=scheme)
    assert np.abs(ops.opp_3 - ops_dg.opp_3).max() > 1e-8
    # conservation: int over element of lift(f) depends only on the face
    # data, not on c: w^T Filt = w^T since the filter preserves the mean
    w = ops.upts_weights
    col_dg = w @ ops_dg.opp_3
    col = w @ ops.opp_3
    np.testing.assert_allclose(col, col_dg, rtol=1e-10, atol=1e-12)


def test_tet_vcjh_runs_stable():
    p = RunInput()
    p.equation = 0
    p.viscous = 0
    p.order = 2
    p.ic_form = 1
    p.rho_c_ic, p.u_c_ic, p.v_c_ic, p.w_c_ic = 1.0, 0.2, 0.1, 0.05
    p.p_c_ic = 17.857
    p.gamma = 1.4
    p.adv_type = 3
    p.riemann_solve_type = 0
    p.dt_type = 0
    p.dt = 1e-3
    p.dx_cyclic = p.dy_cyclic = p.dz_cyclic = 2 * np.pi
    p.vcjh_scheme_tet = 2       # SD-like
    mesh = periodic_tet_mesh(2, 2, 2)
    s = Solver(p, mesh)
    u0 = np.asarray(s.u).copy()
    s.run(20, dt=1e-3)
    # uniform flow is exactly preserved by any conservative correction
    np.testing.assert_allclose(np.asarray(s.u), u0, atol=1e-10)


def test_tri_vcjh_vortex_accuracy():
    """Isentropic vortex on the mixed tri+quad mesh with the SD-like tri
    scheme: error stays at the DG error scale."""
    from hifiles_tpu.solver.multiblock import MixedSolver

    def run(scheme):
        p = RunInput()
        p.equation = 0
        p.viscous = 0
        p.order = 3
        p.ic_form = 0
        p.test_case = 1
        p.adv_type = 3
        p.riemann_solve_type = 0
        p.dt_type = 0
        p.dt = 5e-4
        p.mach_free_stream = 0.3
        p.dx_cyclic = 20.0
        p.dy_cyclic = 20.0
        p.vcjh_scheme_tri = scheme
        s = MixedSolver(p, periodic_mixed_mesh_2d(8, 8, -10, 10, -10, 10))
        s.run(100, dt=5e-4)
        return np.sqrt(s.compute_error(2)[0, 0])

    e_dg = run(1)
    e_sd = run(2)
    assert np.isfinite(e_sd)
    assert e_sd < 2.0 * e_dg, (e_sd, e_dg)
