"""Quadratic serendipity cells: 20-node hexes and 15-node prisms
(round-5 closure of mesh/shape.py's NotImplementedError;
ref:src/eles_hexas.cpp:1215-1292, ref:src/eles_pris.cpp:1114-1181).

Curved wall-resolved meshes (SD7003-class) carry these cell types; the
tests build genuinely curved meshes (mid-edge nodes displaced off the
chords) and check basis algebra, transform construction, and free-stream
preservation through the full solver.
"""

import numpy as np
import pytest

from hifiles_tpu import HEX, PRISM
from hifiles_tpu.config.params import RunInput
from hifiles_tpu.mesh.core import MAX_V_PER_C
from hifiles_tpu.mesh.generate import periodic_hex_mesh, periodic_prism_mesh
from hifiles_tpu.mesh.shape import (shape_basis, shape_dbasis,
                                    shape_ref_locs)
from hifiles_tpu.solver.solver import Solver

# edge endpoints in the quadratic layout's corner numbering
HEX20_EDGES = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 4), (1, 5), (2, 6),
               (3, 7), (4, 5), (5, 6), (6, 7), (7, 4)]
# tensor 8-node slot of each serendipity corner (CCW bottom ring, top ring)
HEX20_CORNER_FROM_TENSOR = [0, 1, 3, 2, 4, 5, 7, 6]
PRI15_EDGES = [(0, 1), (1, 2), (0, 2), (0, 3), (1, 4), (2, 5), (3, 4),
               (4, 5), (3, 5)]


# ----------------------------------------------------------------------
# basis algebra

@pytest.mark.parametrize("ct,n_spts", [(HEX, 20), (PRISM, 15)])
def test_quadratic_basis_cardinal_and_unity(ct, n_spts):
    ref = shape_ref_locs(ct, n_spts)
    B = shape_basis(ct, ref, n_spts)
    np.testing.assert_allclose(B, np.eye(n_spts), atol=1e-13)
    rng = np.random.default_rng(0)
    locs = rng.uniform(-0.9, 0.0, size=(40, 3))
    np.testing.assert_allclose(shape_basis(ct, locs, n_spts).sum(axis=1),
                               1.0, atol=1e-13)


@pytest.mark.parametrize("ct,n_spts", [(HEX, 20), (PRISM, 15)])
def test_quadratic_dbasis_fd(ct, n_spts):
    rng = np.random.default_rng(1)
    locs = rng.uniform(-0.8, -0.1, size=(10, 3))
    D = shape_dbasis(ct, locs, n_spts)
    h = 1e-6
    for ax in range(3):
        lp = locs.copy()
        lp[:, ax] += h
        lm = locs.copy()
        lm[:, ax] -= h
        fd = (shape_basis(ct, lp, n_spts)
              - shape_basis(ct, lm, n_spts)) / (2 * h)
        np.testing.assert_allclose(D[:, :, ax], fd, atol=1e-8)


@pytest.mark.parametrize("ct,n_spts", [(HEX, 20), (PRISM, 15)])
def test_quadratic_basis_reproduces_quadratic_map(ct, n_spts):
    """Placing the nodes on the image of a polynomial map inside the
    element's serendipity space must reproduce that map exactly at
    arbitrary points.  Hex-20 contains every quadratic monomial; the
    15-node prism space is P1(tri) + P2(tri) x {z, z^2} (no z-independent
    quadratic tri terms — it has no mid-z nodes on the tri edges)."""
    ref = shape_ref_locs(ct, n_spts)

    if ct == HEX:
        def f(q):
            x, y, z = q[:, 0], q[:, 1], q[:, 2]
            return np.stack([x + 0.1 * x * y + 0.05 * z * z,
                             y - 0.07 * x * z + 0.03 * x * x,
                             z + 0.08 * y * z + 0.02 * y * y], axis=1)
    else:
        def f(q):
            x, y, z = q[:, 0], q[:, 1], q[:, 2]
            return np.stack([x + 0.1 * x * y * z + 0.05 * z * z,
                             y - 0.07 * x * z + 0.03 * x * x * z,
                             z + 0.08 * y * z + 0.02 * y * y * z * z],
                            axis=1)

    spts = f(ref)
    rng = np.random.default_rng(2)
    locs = rng.uniform(-0.9, -0.05, size=(25, 3))
    pos = shape_basis(ct, locs, n_spts) @ spts
    np.testing.assert_allclose(pos, f(locs), atol=1e-12)


# ----------------------------------------------------------------------
# curved meshes through the full solver

def _insert_midedge(mesh, corner_from_old, edges, n_new):
    """Upgrade every cell to the quadratic layout: corners re-slotted per
    ``corner_from_old``, one shared vertex inserted per undirected edge."""
    C = mesh.n_cells
    xv = [x for x in mesh.xv]
    mid_of = {}
    c2v = -np.ones((C, MAX_V_PER_C), dtype=np.int64)
    n_c = len(corner_from_old)
    for c in range(C):
        corners = [int(mesh.c2v[c, s]) for s in corner_from_old]
        c2v[c, :n_c] = corners
        for e, (a, b) in enumerate(edges):
            key = frozenset((corners[a], corners[b]))
            m = mid_of.get(key)
            if m is None:
                m = len(xv)
                xv.append(0.5 * (mesh.xv[corners[a]]
                                 + mesh.xv[corners[b]]))
                mid_of[key] = m
            c2v[c, n_c + e] = m
    mesh.xv = np.asarray(xv)
    mesh.c2v = c2v
    mesh.c2n_v = np.full(C, n_new, dtype=np.int64)
    return mesh


def _curve(mesh, L, amp=0.08):
    """Smooth displacement, periodic over box length L so cyclic faces
    stay matched; mid-edge nodes leave the chords -> genuine curvature."""
    x = mesh.xv
    w = 2 * np.pi / L
    d = np.stack([np.sin(w * x[:, 0]) * np.cos(w * x[:, 1]),
                  np.sin(w * x[:, 1]) * np.cos(w * x[:, 2]),
                  np.sin(w * x[:, 2]) * np.cos(w * x[:, 0])], axis=1)
    mesh.xv = x + amp * d
    return mesh


def curved_hex20_mesh(n):
    # library builder (also used by the reference-binary golden case)
    from hifiles_tpu.mesh.generate import periodic_curved_hex20_mesh
    return periodic_curved_hex20_mesh(n, n, n)


def curved_prism15_mesh(n):
    mesh = periodic_prism_mesh(n, n, n, -1, 1, -1, 1, -1, 1)
    _insert_midedge(mesh, list(range(6)), PRI15_EDGES, 15)
    return _curve(mesh, 2.0, amp=0.03)


def _freestream_input(order, vcjh_attr):
    p = RunInput()
    p.equation = 0
    p.viscous = 0
    p.order = order
    p.ic_form = 1
    p.test_case = 0
    p.adv_type = 3
    p.riemann_solve_type = 0
    p.dt_type = 0
    p.dt = 1e-4
    setattr(p, vcjh_attr, 1)
    p.u_c_ic, p.v_c_ic, p.w_c_ic = 1.3, -0.6, 0.4
    p.rho_c_ic, p.p_c_ic = 1.1, 2.0
    p.dx_cyclic = p.dy_cyclic = p.dz_cyclic = 2 * np.pi
    return p


def test_freestream_curved_hex20():
    p = _freestream_input(3, "vcjh_scheme_hexa")
    s = Solver(p, curved_hex20_mesh(3))
    r = np.asarray(s.residual_fn(s.u))
    assert np.abs(r).max() < 1e-10, np.abs(r).max()
    s.run(3, dt=p.dt)
    assert np.abs(np.asarray(s.u)[..., 0] - 1.1).max() < 1e-10


def test_freestream_curved_prism15():
    p = _freestream_input(3, "vcjh_scheme_pri_1d")
    p.dx_cyclic = p.dy_cyclic = p.dz_cyclic = 2.0
    s = Solver(p, curved_prism15_mesh(3))
    r = np.asarray(s.residual_fn(s.u))
    assert np.abs(r).max() < 1e-10, np.abs(r).max()


def test_curved_hex20_vs_linear_refinement():
    """The curved-hex transform must be consistent: total volume from the
    quadratic Jacobian equals the analytic periodic-box volume (the
    displacement field is divergence-controlled only through the metric
    integral; a wrong dbasis shows up as O(amp) volume error)."""
    s = Solver(_freestream_input(3, "vcjh_scheme_hexa"),
               curved_hex20_mesh(3))
    w = s.ops.w_vol_cubpts[None, :] * s.block.detjac_vol_cubpts
    vol = float(w.sum())
    assert abs(vol - (2 * np.pi) ** 3) / (2 * np.pi) ** 3 < 1e-3, vol


def test_gmsh_hex20_roundtrip(tmp_path):
    """Gmsh type-17 cells read into the serendipity layout: write a
    2-cell curved mesh in gmsh ordering, read it back, and check the
    shape map hits the node positions."""
    from hifiles_tpu.mesh.gmsh import read_gmsh

    mesh = curved_hex20_mesh(2)
    # the reader's slot map: our c2v slot for each gmsh position
    ours_from_gmsh = [0, 1, 2, 3, 4, 5, 6, 7,
                      8, 11, 12, 9, 13, 10, 14, 15, 16, 19, 17, 18]
    lines = ["$MeshFormat", "2.2 0 8", "$EndMeshFormat",
             "$PhysicalNames", "2", '2 1 "Cyclic"', '3 2 "FLUID"',
             "$EndPhysicalNames", "$Nodes", str(mesh.n_verts)]
    for i, q in enumerate(mesh.xv, 1):
        lines.append(f"{i} {float(q[0])!r} {float(q[1])!r} {float(q[2])!r}")
    lines += ["$EndNodes", "$Elements", str(mesh.n_cells)]
    for c in range(mesh.n_cells):
        v = [int(mesh.c2v[c, ours_from_gmsh[g]]) + 1 for g in range(20)]
        lines.append(f"{c + 1} 17 2 2 1 " + " ".join(map(str, v)))
    lines.append("$EndElements")
    (tmp_path / "curved.msh").write_text("\n".join(lines) + "\n")
    m2 = read_gmsh(str(tmp_path / "curved.msh"))
    assert (m2.c2n_v == 20).all()
    np.testing.assert_array_equal(m2.c2v[:, :20], mesh.c2v[:, :20])
