"""Heterogeneous shape-point counts in one block: linear + quadratic
cells of the same type are upcast to the block's richest layout exactly
(the reference keeps n_spts per cell, ref:src/eles.cpp calc_pos)."""

import dataclasses

import numpy as np
import pytest

from hifiles_tpu import HEX, PRISM, QUAD, TET, TRI
from hifiles_tpu.config.params import RunInput
from hifiles_tpu.mesh.generate import periodic_quad_mesh
from hifiles_tpu.mesh.shape import shape_basis, shape_ref_locs
from hifiles_tpu.solver.solver import Solver


@pytest.mark.parametrize("ctype,n_spts", [
    (QUAD, 4), (QUAD, 9), (QUAD, 8), (QUAD, 16),
    (HEX, 8), (HEX, 27), (TRI, 3), (TRI, 6),
    (TET, 4), (TET, 10), (PRISM, 6),
])
def test_shape_ref_locs_identity(ctype, n_spts):
    """The shape basis evaluated at its own nodes is the identity."""
    locs = shape_ref_locs(ctype, n_spts)
    np.testing.assert_allclose(shape_basis(ctype, locs, n_spts),
                               np.eye(n_spts), atol=1e-12)


def _upcast_every_other_cell(mesh):
    """Re-declare half the (straight) quad cells as 9-node with exact
    bilinear midpoints; the geometry map is unchanged."""
    E = mesh.n_cells
    width = max(9, mesh.c2v.shape[1])
    c2v = np.full((E, width), -1, dtype=mesh.c2v.dtype)
    c2v[:, :mesh.c2v.shape[1]] = mesh.c2v
    c2n = mesh.c2n_v.copy()
    xv = list(mesh.xv)
    for e in range(0, E, 2):
        sw, se, nw, ne = mesh.xv[mesh.c2v[e, :4]]  # tensor order
        base = len(xv)
        xv.extend([0.5 * (sw + se), 0.5 * (sw + nw),
                   0.25 * (sw + se + nw + ne), 0.5 * (se + ne),
                   0.5 * (nw + ne)])
        c2v[e, :9] = [mesh.c2v[e, 0], base, mesh.c2v[e, 1],
                      base + 1, base + 2, base + 3,
                      mesh.c2v[e, 2], base + 4, mesh.c2v[e, 3]]
        c2v[e, 9:] = -1
        c2n[e] = 9
    return dataclasses.replace(mesh, xv=np.asarray(xv), c2v=c2v, c2n_v=c2n)


def test_hetero_block_matches_homogeneous():
    from tests.test_euler_core import vortex_input
    p = vortex_input(order=3)
    mesh = periodic_quad_mesh(4, 4, -5, 5, -5, 5)
    mesh2 = _upcast_every_other_cell(mesh)
    assert set(np.unique(mesh2.c2n_v)) == {4, 9}
    s1 = Solver(p, mesh)
    s2 = Solver(p, mesh2)
    s1.run(20, dt=1e-3)
    s2.run(20, dt=1e-3)
    u1, u2 = np.asarray(s1.u), np.asarray(s2.u)
    assert np.isfinite(u2).all()
    np.testing.assert_allclose(u2, u1, atol=1e-11)


def test_hetero_vtu_writes(tmp_path):
    from hifiles_tpu.io.vtu import write_vtu
    from tests.test_euler_core import vortex_input
    p = vortex_input(order=2)
    p.diagnostic_fields = ["u", "v", "pressure"]
    mesh2 = _upcast_every_other_cell(periodic_quad_mesh(4, 4, -5, 5, -5, 5))
    s = Solver(p, mesh2)
    out = write_vtu(s, str(tmp_path), 0)
    assert out.endswith((".vtu", ".pvtu"))
