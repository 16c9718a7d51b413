"""Foundation tests: quadrature rules, bases, correction functions, operators.

Where the reference ships binary node tables (data/JacobiG{Q,L}.bin), we check
our computed rules against them when the reference tree is present; the tests
also stand alone via analytic identities.
"""

import os

import numpy as np
import pytest

from hifiles_tpu import HEX, QUAD
from hifiles_tpu.ops import basis, correction, quadrature
from hifiles_tpu.ops.operators import build_tensor_ops

REF_DATA = "/root/reference/data"


def _read_ref_rule(fname, order):
    # table layout: rules for order 0..15 stored consecutively; rule for
    # order p starts at double offset (1+p)*p and holds p+1 locs then p+1
    # weights (ref:src/cubature_1d.cpp:69-82)
    a = np.fromfile(fname, dtype=np.float64)
    skip = (1 + order) * order
    n = order + 1
    return a[skip:skip + n], a[skip + n:skip + 2 * n]


@pytest.mark.parametrize("order", range(8))
def test_gauss_matches_reference_table(order):
    if not os.path.exists(f"{REF_DATA}/JacobiGQ.bin"):
        pytest.skip("reference data not available")
    x_ref, w_ref = _read_ref_rule(f"{REF_DATA}/JacobiGQ.bin", order)
    x, w = quadrature.line_rule(quadrature.GAUSS, order)
    np.testing.assert_allclose(x, x_ref, atol=1e-14)
    np.testing.assert_allclose(w, w_ref, atol=1e-14)


@pytest.mark.parametrize("order", range(1, 8))
def test_lobatto_matches_reference_table(order):
    if not os.path.exists(f"{REF_DATA}/JacobiGL.bin"):
        pytest.skip("reference data not available")
    x_ref, w_ref = _read_ref_rule(f"{REF_DATA}/JacobiGL.bin", order)
    x, w = quadrature.line_rule(quadrature.GAUSS_LOBATTO, order)
    np.testing.assert_allclose(x, x_ref, atol=1e-12)
    np.testing.assert_allclose(w, w_ref, atol=1e-12)


@pytest.mark.parametrize("n", [1, 2, 3, 5, 8])
def test_gauss_integrates_polynomials(n):
    x, w = quadrature.gauss_legendre(n)
    for k in range(2 * n):  # exact up to degree 2n-1
        exact = (1 - (-1) ** (k + 1)) / (k + 1)
        assert abs(np.sum(w * x**k) - exact) < 1e-13


def test_lagrange_cardinal_property():
    nodes, _ = quadrature.gauss_legendre(5)
    L = basis.lagrange_matrix(nodes, nodes)
    np.testing.assert_allclose(L, np.eye(5), atol=1e-13)


def test_dlagrange_differentiates_polynomials():
    nodes, _ = quadrature.gauss_legendre(5)
    pts = np.linspace(-1, 1, 7)
    D = basis.dlagrange_matrix(pts, nodes)
    for k in range(5):
        vals = nodes**k
        dvals = D @ vals
        np.testing.assert_allclose(dvals, k * pts ** max(k - 1, 0), atol=1e-11)


def test_dlegendre_endpoints():
    for n in range(1, 6):
        assert abs(basis.dlegendre(np.array([1.0]), n)[0] - 0.5 * n * (n + 1)) < 1e-13
        assert abs(basis.dlegendre(np.array([-1.0]), n)[0]
                   - (-1.0) ** (n - 1) * 0.5 * n * (n + 1)) < 1e-13


def test_eta_values():
    assert correction.compute_eta(correction.VCJH_DG, 3) == 0.0
    assert abs(correction.compute_eta(correction.VCJH_SD, 3) - 0.75) < 1e-15
    assert abs(correction.compute_eta(correction.VCJH_HU, 3) - 4.0 / 3.0) < 1e-15


@pytest.mark.parametrize("order", [1, 2, 3, 4])
def test_vcjh_correction_endpoint_values(order):
    # g_L(-1) = 1, g_L(1) = 0: integral of g' recovers the jump.
    # Verify via quadrature of the derivative.
    x, w = quadrature.gauss_legendre(order + 2)
    dgl = correction.dvcjh_1d(x, 0, order, 0.0)
    assert abs(np.sum(w * dgl) - (-1.0)) < 1e-12   # g_L(1)-g_L(-1) = -1
    dgr = correction.dvcjh_1d(x, 1, order, 0.0)
    assert abs(np.sum(w * dgr) - 1.0) < 1e-12


@pytest.mark.parametrize("ele_type,order", [(QUAD, 2), (QUAD, 3), (HEX, 2), (HEX, 3)])
def test_opp0_polynomial_exactness(ele_type, order):
    ops = build_tensor_ops(ele_type, order)
    # interpolation of any poly of per-axis degree <= order is exact at fpts
    rng = np.random.default_rng(0)
    coeffs = rng.normal(size=(order + 1,) * ops.n_dims)

    def poly(locs):
        vals = np.zeros(locs.shape[0])
        for idx in np.ndindex(*coeffs.shape):
            term = coeffs[idx]
            for ax in range(ops.n_dims):
                term = term * locs[:, ax] ** idx[ax]
            vals += term
        return vals

    u = poly(ops.loc_upts)
    np.testing.assert_allclose(ops.opp_0 @ u, poly(ops.tloc_fpts), atol=1e-10)


@pytest.mark.parametrize("ele_type,order", [(QUAD, 3), (HEX, 2)])
def test_opp2_derivative_exactness(ele_type, order):
    ops = build_tensor_ops(ele_type, order)
    locs = ops.loc_upts
    # d/dx of x^order * y -> order*x^(order-1) * y
    u = locs[:, 0] ** order * locs[:, 1]
    dx = ops.opp_2[0] @ u
    np.testing.assert_allclose(dx, order * locs[:, 0] ** (order - 1) * locs[:, 1],
                               atol=1e-10)
    dy = ops.opp_2[1] @ u
    np.testing.assert_allclose(dy, locs[:, 0] ** order, atol=1e-10)


@pytest.mark.parametrize("ele_type,order", [(QUAD, 1), (QUAD, 3), (HEX, 1), (HEX, 3)])
def test_lift_divergence_free_for_constant_flux(ele_type, order):
    """Free-stream preservation at the operator level.

    For a constant transformed flux F, the discontinuous divergence is 0 and
    the normal flux at fpts is F.tnorm; a *consistent* common flux equal to
    the discontinuous one gives zero correction: opp_3 @ (fn - fn) = 0.
    Stronger check: opp_2 divergence of constant == 0, and the fused operator
    kills constants too.
    """
    ops = build_tensor_ops(ele_type, order)
    const = np.ones(ops.n_upts)
    for d in range(ops.n_dims):
        np.testing.assert_allclose(ops.opp_2[d] @ const, 0.0, atol=1e-11)
    # fused: opp_div_fused @ [F_x*1; F_y*1; ...] + opp_3 @ (F . tnorm) == 0
    F = np.array([1.3, -0.7, 2.1])[:ops.n_dims]
    tdisf_cat = np.concatenate([F[d] * const for d in range(ops.n_dims)])
    fn = ops.tnorm_fpts @ F
    resid = ops.opp_div_fused @ tdisf_cat + ops.opp_3 @ fn
    np.testing.assert_allclose(resid, 0.0, atol=1e-10)


@pytest.mark.parametrize("ele_type,order", [(QUAD, 2), (HEX, 2)])
def test_lift_consistency_dg(ele_type, order):
    """DG lift identity: for any polynomial flux, corrected divergence equals
    the exact divergence when the common flux equals the trace of the flux
    (single-element exactness)."""
    ops = build_tensor_ops(ele_type, order, vcjh_scheme=1)
    rng = np.random.default_rng(1)
    # flux linear in coordinates: F_d = a_d + sum_m b_dm x_m, div F = sum b_dd
    a = rng.normal(size=ops.n_dims)
    b = rng.normal(size=(ops.n_dims, ops.n_dims))
    tdisf = np.stack([a[d] + ops.loc_upts @ b[d] for d in range(ops.n_dims)],
                     axis=1)  # (U, d)
    flux_at_fpts = np.stack([a[d] + ops.tloc_fpts @ b[d]
                             for d in range(ops.n_dims)], axis=1)  # (Pf, d)
    fn_common = np.sum(flux_at_fpts * ops.tnorm_fpts, axis=1)
    div_disc = sum(ops.opp_2[d] @ tdisf[:, d] for d in range(ops.n_dims))
    norm_tdisf = sum(ops.opp_1[d] @ tdisf[:, d] for d in range(ops.n_dims))
    div_corr = div_disc + ops.opp_3 @ (fn_common - norm_tdisf)
    np.testing.assert_allclose(div_corr, np.trace(b) * np.ones(ops.n_upts),
                               atol=1e-10)


def test_vandermonde_inverse():
    ops = build_tensor_ops(QUAD, 3)
    np.testing.assert_allclose(ops.vandermonde @ ops.inv_vandermonde,
                               np.eye(ops.n_upts), atol=1e-10)
