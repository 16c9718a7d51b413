"""Triangle operator tests: Dubiner orthonormality, polynomial exactness,
DG lift consistency."""

import numpy as np
import pytest

from hifiles_tpu.ops.operators import build_tri_ops
from hifiles_tpu.ops.simplex import (dubiner_2d, grad_dubiner_2d,
                                     tri_interior_cubature)


def test_dubiner_orthonormal():
    locs, w = tri_interior_cubature(7)
    V = dubiner_2d(locs, 3)
    M = np.einsum("q,qm,qn->mn", w, V, V)
    np.testing.assert_allclose(M, np.eye(V.shape[1]), atol=1e-10)


def test_grad_dubiner_finite_difference():
    rng = np.random.default_rng(0)
    pts = np.array([[-0.3, -0.2], [0.1, -0.6], [-0.8, 0.3]])
    g = grad_dubiner_2d(pts, 4)
    eps = 1e-6
    for d in range(2):
        dp = pts.copy()
        dp[:, d] += eps
        dm = pts.copy()
        dm[:, d] -= eps
        fd = (dubiner_2d(dp, 4) - dubiner_2d(dm, 4)) / (2 * eps)
        np.testing.assert_allclose(g[..., d], fd, atol=1e-7)


@pytest.mark.parametrize("order", [1, 2, 3, 4])
def test_tri_opp0_polynomial_exactness(order):
    ops = build_tri_ops(order)
    rng = np.random.default_rng(1)
    # random poly of total degree <= order
    terms = [(i, j) for i in range(order + 1) for j in range(order + 1 - i)]
    coef = rng.normal(size=len(terms))

    def poly(locs):
        return sum(c * locs[:, 0] ** i * locs[:, 1] ** j
                   for c, (i, j) in zip(coef, terms))

    u = poly(ops.loc_upts)
    np.testing.assert_allclose(ops.opp_0 @ u, poly(ops.tloc_fpts), atol=1e-9)
    # derivative exactness
    du = sum(c * i * ops.loc_upts[:, 0] ** max(i - 1, 0) * ops.loc_upts[:, 1] ** j
             for c, (i, j) in zip(coef, terms))
    np.testing.assert_allclose(ops.opp_2[0] @ u, du, atol=1e-9)


@pytest.mark.parametrize("order", [1, 2, 3])
def test_tri_dg_lift_identity(order):
    """Same single-element exactness check as the quad/hex test: for a
    linear flux with the common flux equal to the trace, the corrected
    divergence is exact."""
    ops = build_tri_ops(order)
    rng = np.random.default_rng(2)
    a = rng.normal(size=2)
    b = rng.normal(size=(2, 2))
    tdisf = np.stack([a[d] + ops.loc_upts @ b[d] for d in range(2)], axis=1)
    flux_f = np.stack([a[d] + ops.tloc_fpts @ b[d] for d in range(2)], axis=1)
    fn_common = np.sum(flux_f * ops.tnorm_fpts, axis=1)
    div_disc = sum(ops.opp_2[d] @ tdisf[:, d] for d in range(2))
    norm_tdisf = sum(ops.opp_1[d] @ tdisf[:, d] for d in range(2))
    div = div_disc + ops.opp_3 @ (fn_common - norm_tdisf)
    np.testing.assert_allclose(div, np.trace(b) * np.ones(ops.n_upts),
                               atol=1e-9)


def test_tri_freestream():
    ops = build_tri_ops(3)
    const = np.ones(ops.n_upts)
    F = np.array([1.3, -0.7])
    tdisf_cat = np.concatenate([F[d] * const for d in range(2)])
    fn = ops.tnorm_fpts @ F
    resid = ops.opp_div_fused @ tdisf_cat + ops.opp_3 @ fn
    np.testing.assert_allclose(resid, 0.0, atol=1e-9)
