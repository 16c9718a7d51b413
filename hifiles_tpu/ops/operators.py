"""Per-element-type FR operator factory.

Builds, in float64 numpy, every small dense operator matrix the solver
applies as batched tensor contractions:

  opp_0 (Pf, U): solution at upts -> solution at fpts (ref:src/eles.cpp:3074)
  opp_1 (d, Pf, U): transformed flux -> *normal* transformed flux at fpts
       = opp_0 scaled by tnorm (ref:src/eles.cpp:3143)
  opp_2 (d, U, U): nodal derivative matrices (ref:src/eles.cpp:3228)
  opp_3 (U, Pf): the VCJH lift — divergence of the correction functions
       (ref:src/eles.cpp:3321, per-type fill_opp_3)
  opp_4 == opp_2 (ref:src/eles.cpp:3371)
  opp_5 (d, U, Pf) = opp_3 * tnorm[d] (ref:src/eles.cpp:3451-3476)
  opp_6 == opp_0 (ref:src/eles.cpp:3537-3555)
  opp_volume_cubpts, opp_p, opp_r: interpolations to cubature/plot/restart pts

TPU-first fused forms (exact linear-algebra identities, so physics parity is
preserved up to f64 rounding):

  opp_div  (U, U*d)  = concat_d opp_2[d]        — one volume GEMM
  opp_corr (U, Pf)   = opp_3                    — one surface GEMM
  opp_div_fused = opp_div - opp_3 @ opp_1_cat   — folds the discontinuous
       -normal-flux subtraction of calculate_corrected_divergence
       (ref:src/eles.cpp:1738-1817) into the volume operator, removing an
       entire (Pf, U) GEMM and the fpts round-trip of the discontinuous flux.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .. import HEX, QUAD, TRI
from .basis import (dlagrange_matrix, lagrange_matrix, tensor_legendre_norms,
                    vandermonde_tensor)
from .correction import dcorrection_1d
from .quadrature import GAUSS, line_rule, tensor_rule


@dataclasses.dataclass(frozen=True)
class ElementOps:
    """All reference-domain operators for one (element type, order) pair.

    Everything is numpy float64; the solver casts to its compute dtype and
    closes over these as constants under jit.
    """

    ele_type: int
    order: int
    n_dims: int
    n_upts: int
    n_fpts: int                 # total flux points per element
    n_faces: int
    n_fpts_per_face: np.ndarray  # (n_faces,)
    loc_upts: np.ndarray        # (U, d)
    tloc_fpts: np.ndarray       # (Pf, d)
    tnorm_fpts: np.ndarray      # (Pf, d) reference-domain outward normals
    fpt_face: np.ndarray        # (Pf,) which local face each fpt lies on
    opp_0: np.ndarray           # (Pf, U)
    opp_1: np.ndarray           # (d, Pf, U)
    opp_2: np.ndarray           # (d, U, U)
    opp_3: np.ndarray           # (U, Pf)
    # volume cubature (for error norms & integral diagnostics)
    loc_vol_cubpts: np.ndarray  # (C, d)
    w_vol_cubpts: np.ndarray    # (C,)
    opp_vol_cubpts: np.ndarray  # (C, U)
    # modal machinery (shock capture, filters, over-integration)
    vandermonde: np.ndarray     # (U, U) hierarchical tensor-Legendre
    inv_vandermonde: np.ndarray
    modal_norms: np.ndarray     # (U,) Persson norms
    # fused fast-path operators
    opp_div_fused: np.ndarray   # (U, U*d)
    upts_weights: np.ndarray    # (U,) quadrature weights at solution points
    # per-flux-point quadrature weight on its face (for surface integrals,
    # ref:src/eles.cpp:5704 compute_wall_forces at inters_cubpts)
    fpt_weights: np.ndarray | None = None

    @property
    def opp_1_cat(self) -> np.ndarray:
        """(Pf, U*d) concatenation of opp_1 over the dim axis."""
        return np.concatenate([self.opp_1[d] for d in range(self.n_dims)], axis=1)

    @property
    def opp_2_cat(self) -> np.ndarray:
        """(U, U*d) concatenation of opp_2 over the dim axis."""
        return np.concatenate([self.opp_2[d] for d in range(self.n_dims)], axis=1)

    def interp_to(self, locs: np.ndarray) -> np.ndarray:
        """Nodal interpolation matrix from upts to arbitrary points ``locs``.

        Covers opp_p / opp_probe / opp_r / opp_inters_cubpts
        (ref:src/eles.cpp:3600-3710)."""
        if self.ele_type == TRI:
            from .simplex import dubiner_2d
            return dubiner_2d(locs, self.order) @ self.inv_vandermonde
        return _nodal_interp_tensor(locs, self._loc_1d(), self.n_dims)

    def _loc_1d(self) -> np.ndarray:
        n = self.order + 1
        return self.loc_upts[:n, 0]


def _nodal_interp_tensor(locs: np.ndarray, loc_1d: np.ndarray, n_dims: int) -> np.ndarray:
    """Tensor-product Lagrange interpolation matrix (pts, U).

    Mode ordering matches eval_nodal_basis: x-fastest
    (ref:src/eles_quads.cpp:962-974, ref:src/eles_hexas.cpp analog).
    """
    locs = np.atleast_2d(np.asarray(locs, dtype=np.float64))
    Ls = [lagrange_matrix(locs[:, ax], loc_1d) for ax in range(n_dims)]
    n = loc_1d.size
    npts = locs.shape[0]
    out = np.empty((npts, n**n_dims))
    if n_dims == 2:
        for i in range(n):
            for j in range(n):
                out[:, j + n * i] = Ls[0][:, j] * Ls[1][:, i]
    elif n_dims == 3:
        for i in range(n):
            for j in range(n):
                for k in range(n):
                    out[:, k + n * j + n * n * i] = (
                        Ls[0][:, k] * Ls[1][:, j] * Ls[2][:, i])
    else:
        raise ValueError(n_dims)
    return out


def _nodal_deriv_tensor(locs: np.ndarray, loc_1d: np.ndarray, n_dims: int,
                        axis: int) -> np.ndarray:
    """d/d(axis) of the tensor nodal basis at ``locs`` (pts, U)."""
    locs = np.atleast_2d(np.asarray(locs, dtype=np.float64))
    mats = []
    for ax in range(n_dims):
        if ax == axis:
            mats.append(dlagrange_matrix(locs[:, ax], loc_1d))
        else:
            mats.append(lagrange_matrix(locs[:, ax], loc_1d))
    n = loc_1d.size
    npts = locs.shape[0]
    out = np.empty((npts, n**n_dims))
    if n_dims == 2:
        for i in range(n):
            for j in range(n):
                out[:, j + n * i] = mats[0][:, j] * mats[1][:, i]
    elif n_dims == 3:
        for i in range(n):
            for j in range(n):
                for k in range(n):
                    out[:, k + n * j + n * n * i] = (
                        mats[0][:, k] * mats[1][:, j] * mats[2][:, i])
    else:
        raise ValueError(n_dims)
    return out


def _quad_fpts(loc_1d: np.ndarray, order: int):
    """Quad flux-point locations/normals (ref:src/eles_quads.cpp:209-247,389-425).

    Face order: 0 bottom (+x traverse), 1 right (+y), 2 top (-x), 3 left (-y);
    all CCW around the element, outward reference normals.
    """
    n = order + 1
    pts, nrm, face = [], [], []
    for i in range(4):
        for j in range(n):
            if i == 0:
                pts.append((loc_1d[j], -1.0)); nrm.append((0.0, -1.0))
            elif i == 1:
                pts.append((1.0, loc_1d[j])); nrm.append((1.0, 0.0))
            elif i == 2:
                pts.append((loc_1d[order - j], 1.0)); nrm.append((0.0, 1.0))
            else:
                pts.append((-1.0, loc_1d[order - j])); nrm.append((-1.0, 0.0))
            face.append(i)
    return (np.array(pts), np.array(nrm), np.array(face, dtype=np.int64))


def _hex_fpts(loc_1d: np.ndarray, order: int):
    """Hex flux-point locations/normals (ref:src/eles_hexas.cpp:224-282,
    set_tnorm_fpts analog).  fpt = k + n*j + n*n*face."""
    n = order + 1
    pts, nrm, face = [], [], []
    normals = [(0, 0, -1), (0, -1, 0), (1, 0, 0), (0, 1, 0), (-1, 0, 0), (0, 0, 1)]
    for i in range(6):
        for j in range(n):
            for k in range(n):
                if i == 0:
                    p = (loc_1d[order - k], loc_1d[j], -1.0)
                elif i == 1:
                    p = (loc_1d[k], -1.0, loc_1d[j])
                elif i == 2:
                    p = (1.0, loc_1d[k], loc_1d[j])
                elif i == 3:
                    p = (loc_1d[order - k], 1.0, loc_1d[j])
                elif i == 4:
                    p = (-1.0, loc_1d[order - k], loc_1d[j])
                else:
                    p = (loc_1d[k], loc_1d[j], 1.0)
                pts.append(p)
                nrm.append(normals[i])
                face.append(i)
    return (np.array(pts, dtype=np.float64), np.array(nrm, dtype=np.float64),
            np.array(face, dtype=np.int64))


def _fill_opp3_quad(loc_upts, loc_1d, order, scheme, eta):
    """ref:src/eles_quads.cpp:1192-1268 (eval_div_vcjh_basis)."""
    n = order + 1
    U = loc_upts.shape[0]
    opp3 = np.empty((U, 4 * n))
    lx = lagrange_matrix(loc_upts[:, 0], loc_1d)   # (U, n)
    ly = lagrange_matrix(loc_upts[:, 1], loc_1d)
    gl_x = dcorrection_1d(loc_upts[:, 0], 0, order, scheme, eta)
    gr_x = dcorrection_1d(loc_upts[:, 0], 1, order, scheme, eta)
    gl_y = dcorrection_1d(loc_upts[:, 1], 0, order, scheme, eta)
    gr_y = dcorrection_1d(loc_upts[:, 1], 1, order, scheme, eta)
    for idx in range(4 * n):
        i, j = idx // n, idx % n
        if i == 0:
            opp3[:, idx] = -lx[:, j] * gl_y
        elif i == 1:
            opp3[:, idx] = ly[:, j] * gr_x
        elif i == 2:
            opp3[:, idx] = lx[:, order - j] * gr_y
        else:
            opp3[:, idx] = -ly[:, order - j] * gl_x
    return opp3


def _fill_opp3_hex(loc_upts, loc_1d, order, scheme, eta):
    """ref:src/eles_hexas.cpp:1444-1533 (eval_div_vcjh_basis)."""
    n = order + 1
    U = loc_upts.shape[0]
    opp3 = np.empty((U, 6 * n * n))
    L = [lagrange_matrix(loc_upts[:, ax], loc_1d) for ax in range(3)]
    gl = [dcorrection_1d(loc_upts[:, ax], 0, order, scheme, eta) for ax in range(3)]
    gr = [dcorrection_1d(loc_upts[:, ax], 1, order, scheme, eta) for ax in range(3)]
    nn = n * n
    for idx in range(6 * nn):
        i = idx // nn
        j = (idx - nn * i) // n
        k = idx - nn * i - n * j
        if i == 0:
            opp3[:, idx] = -L[0][:, order - k] * L[1][:, j] * gl[2]
        elif i == 1:
            opp3[:, idx] = -L[0][:, k] * L[2][:, j] * gl[1]
        elif i == 2:
            opp3[:, idx] = L[1][:, k] * L[2][:, j] * gr[0]
        elif i == 3:
            opp3[:, idx] = L[0][:, order - k] * L[2][:, j] * gr[1]
        elif i == 4:
            opp3[:, idx] = -L[1][:, order - k] * L[2][:, j] * gl[0]
        else:
            opp3[:, idx] = L[0][:, k] * L[1][:, j] * gr[2]
    return opp3


def build_tensor_ops(ele_type: int, order: int, upts_rule: int = GAUSS,
                     vcjh_scheme: int = 1, eta: float = 0.0) -> ElementOps:
    """Build the full operator set for QUAD (2-D) or HEX (3-D) elements."""
    if ele_type == QUAD:
        n_dims = 2
    elif ele_type == HEX:
        n_dims = 3
    else:
        raise ValueError("build_tensor_ops handles QUAD and HEX only")

    loc_1d, w_1d = line_rule(upts_rule, order)
    loc_upts, w_upts = tensor_rule(upts_rule, order, n_dims)
    n = order + 1
    U = n**n_dims

    if ele_type == QUAD:
        tloc_fpts, tnorm_fpts, fpt_face = _quad_fpts(loc_1d, order)
        n_faces = 4
        opp_3 = _fill_opp3_quad(loc_upts, loc_1d, order, vcjh_scheme, eta)
    else:
        tloc_fpts, tnorm_fpts, fpt_face = _hex_fpts(loc_1d, order)
        n_faces = 6
        opp_3 = _fill_opp3_hex(loc_upts, loc_1d, order, vcjh_scheme, eta)

    Pf = tloc_fpts.shape[0]
    opp_0 = _nodal_interp_tensor(tloc_fpts, loc_1d, n_dims)
    opp_1 = np.stack([opp_0 * tnorm_fpts[:, d:d + 1] for d in range(n_dims)])
    opp_2 = np.stack([_nodal_deriv_tensor(loc_upts, loc_1d, n_dims, d)
                      for d in range(n_dims)])

    # volume cubature at rule order = solution order (Gauss)
    # (ref:src/eles_quads.cpp:317-330)
    loc_cub, w_cub = tensor_rule(GAUSS, order, n_dims)
    opp_cub = _nodal_interp_tensor(loc_cub, loc_1d, n_dims)

    V = vandermonde_tensor(loc_upts, order)
    Vinv = np.linalg.inv(V)
    norms = tensor_legendre_norms(order, n_dims)

    opp_2_cat = np.concatenate([opp_2[d] for d in range(n_dims)], axis=1)
    opp_1_cat = np.concatenate([opp_1[d] for d in range(n_dims)], axis=1)
    opp_div_fused = opp_2_cat - opp_3 @ opp_1_cat

    # per-fpt face-quadrature weights (1-D rule per edge / tensor per face)
    if n_dims == 2:
        fpt_w = np.tile(w_1d, n_faces)
    else:
        w2 = np.outer(w_1d, w_1d).ravel()
        fpt_w = np.tile(w2, n_faces)

    return ElementOps(
        ele_type=ele_type, order=order, n_dims=n_dims, n_upts=U, n_fpts=Pf,
        fpt_weights=fpt_w,
        n_faces=n_faces,
        n_fpts_per_face=np.full(n_faces, Pf // n_faces, dtype=np.int64),
        loc_upts=loc_upts, tloc_fpts=tloc_fpts, tnorm_fpts=tnorm_fpts,
        fpt_face=fpt_face, opp_0=opp_0, opp_1=opp_1, opp_2=opp_2, opp_3=opp_3,
        loc_vol_cubpts=loc_cub, w_vol_cubpts=w_cub, opp_vol_cubpts=opp_cub,
        vandermonde=V, inv_vandermonde=Vinv, modal_norms=norms,
        opp_div_fused=opp_div_fused, upts_weights=w_upts)


def build_tri_ops(order: int, upts_type: int = 0, fpts_type: int = 0,
                  vcjh_scheme: int = 1, c_tri: float = 0.0) -> ElementOps:
    """Operator set for TRI elements (ref:src/eles_tris.cpp:45-136).

    Solution points: alpha-optimized (upts_type 1) or interior cubature
    points (upts_type 0, which also carry weights); nodal basis defined via
    the orthonormal Dubiner modal basis and its Vandermonde (Hesthaven eq.
    3.3, ref:src/eles_tris.cpp:703-720).  Correction: DG lift (VCJH c!=0
    filter matrix not yet implemented)."""
    from .simplex import (dubiner_2d, grad_dubiner_2d, tri_alpha_points,
                          tri_dg_lift, tri_fpts, tri_interior_cubature,
                          tri_modes)

    if vcjh_scheme != 1 and c_tri != 0.0:
        raise NotImplementedError("tri VCJH filter (c_tri != 0); use DG")

    U = (order + 1) * (order + 2) // 2
    if upts_type == 0:
        loc_upts, w_upts = tri_interior_cubature(order)
    else:
        loc_upts = tri_alpha_points(order)
        w_upts = np.zeros(U)

    loc_1d_fpts, w_1d_fpts = line_rule(fpts_type, order)
    tloc_fpts, tnorm_fpts, fpt_face = tri_fpts(loc_1d_fpts, order)
    Pf = tloc_fpts.shape[0]

    V = dubiner_2d(loc_upts, order)
    Vinv = np.linalg.inv(V)
    # nodal basis value at x: phi(x) @ Vinv (columns = nodal functions)
    opp_0 = dubiner_2d(tloc_fpts, order) @ Vinv
    opp_1 = np.stack([opp_0 * tnorm_fpts[:, d:d + 1] for d in range(2)])
    gV = grad_dubiner_2d(loc_upts, order)             # (U, U, 2)
    opp_2 = np.stack([gV[..., d] @ Vinv for d in range(2)])
    opp_3 = tri_dg_lift(loc_upts, loc_1d_fpts, order)

    loc_cub, w_cub = tri_interior_cubature(min(order, 7))
    opp_cub = dubiner_2d(loc_cub, order) @ Vinv

    modes = np.array(tri_modes(order))
    norms = np.ones(U)  # Dubiner basis is orthonormal

    opp_2_cat = np.concatenate([opp_2[d] for d in range(2)], axis=1)
    opp_1_cat = np.concatenate([opp_1[d] for d in range(2)], axis=1)
    opp_div_fused = opp_2_cat - opp_3 @ opp_1_cat

    # face-quadrature weights including the reference-edge measure: the
    # hypotenuse has reference length 2*sqrt(2) over parameter range 2
    fpt_w = np.concatenate([w_1d_fpts, w_1d_fpts * np.sqrt(2.0), w_1d_fpts])

    return ElementOps(
        ele_type=TRI, order=order, n_dims=2, n_upts=U, n_fpts=Pf, n_faces=3,
        fpt_weights=fpt_w,
        n_fpts_per_face=np.full(3, order + 1, dtype=np.int64),
        loc_upts=loc_upts, tloc_fpts=tloc_fpts, tnorm_fpts=tnorm_fpts,
        fpt_face=fpt_face, opp_0=opp_0, opp_1=opp_1, opp_2=opp_2, opp_3=opp_3,
        loc_vol_cubpts=loc_cub, w_vol_cubpts=w_cub, opp_vol_cubpts=opp_cub,
        vandermonde=V, inv_vandermonde=Vinv, modal_norms=norms,
        opp_div_fused=opp_div_fused, upts_weights=w_upts)
