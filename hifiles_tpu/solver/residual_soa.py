"""Structure-of-arrays FR residual: state (U, F, E) with ELEMENTS minor.

Why: the TPU tiles the last two axes of every array onto (8 sublanes, 128
lanes).  The (E, U, F) layout keeps F=5 minor, so every persistent tensor is
padded 5->128 on lanes (25x HBM footprint), and XLA's layout assignment
inserts ~0.5 ms relayout copies around every face-row reshape — measured
48% of the residual wall time on TPU v5e (see BENCH notes).  Here every
volume tensor is (U|K, F, E): minor axis E (thousands of elements = full
lane tiles), every operator application is ONE large-N GEMM
  dot_general(opp (K, U), x (U, F, E), contract U)  ->  (K, F, E)
— the TPU-native analog of the reference's column-major
dgemm(n_upts, n_fields*n_eles) (ref:src/eles.cpp:1360-1772) — and all
physics runs on (.., E)-minor field planes at full VPU lane utilization.

Face exchange: faces are grouped by their static (left fpt-row, right
fpt-row) patterns — a handful of groups on any conforming mesh (3 for a
periodic hex box, <=9 for 2-D tris).  Per group, the face state is read
with a static 125-row gather from the 2-D (Pf*F, E) view followed by a
minor-axis element gather — the two gather forms this TPU executes at
full speed — and the common flux returns to element storage through one
minor-axis gather per local face (the inverse table replaces the
reference's point-by-point scatters, ref:src/int_inters.cpp:217-220).

Covers the single-type, uniform-face, fused path (Euler/NS + adv-diff,
viscous or not, all Riemann solvers, boundaries via the AoS bc bridge),
including the feature physics: LES SGS models (eddy + similarity),
over-integration de-aliasing, SA-RANS (source + diffusion), and wall
models (input state gathered from the SoA volume solution).  Shock capture
runs as an SoA post-stage (ops/stabilization.py make_shock_capture_soa).
Only non-fused parity runs and RANS+HLLC fall back to residual.py.

Layout notes (measured on TPU v5e, TGV p=4 16^3 bench):
  * (E, U, F) face path ............ 5.96e7 DOF*stage/s (relayout copies)
  * this file, (U, F, E) ........... 2.31e8
  * (F, U, E) + field-batched GEMMs  2.05e8 — the 5->8 sublane pad of the
    (F, E) minor pair costs less than splitting each operator GEMM into
    F batched N=E GEMMs; one large-N=F*E GEMM wins.  Kept (U, F, E).
The sharded path (parallel/soa_sharding.py) runs this same layout inside
shard_map: halo faces extend the face groups (r-side filled from the
ppermute recv buffer), and the element-side viscous normal flux means
only the F qn planes cross the ICI instead of d*F gradient planes.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import riemann
from .elements import ElementBlock
from .kernels import adjT_apply
from .residual import BlockArrays, ResidualConfig


# ----------------------------------------------------------------------
# host-side tables
# ----------------------------------------------------------------------

def _segments(idx, min_avg_run=32):
    """Decompose an index sequence into consecutive-ascending runs; each
    run is a free lane slice, and a few slices + concat beat one lane
    gather.  None (keep the general gather) when runs are too short."""
    idx = np.asarray(idx)
    if idx.size == 0:
        return None
    cuts = np.where(np.diff(idx) != 1)[0] + 1
    if cuts.size + 1 > max(8, idx.size // min_avg_run):
        return None
    st = np.concatenate([[0], cuts])
    en = np.concatenate([cuts, [idx.size]])
    return [(int(idx[a]), int(idx[a]) + int(b - a))
            for a, b in zip(st, en)]


def _sliced(arr2, idx_j, segs, axis1=True):
    """arr2[:, idx] via run slices when segs is available."""
    if segs is not None:
        if len(segs) == 1:
            return arr2[:, segs[0][0]:segs[0][1]]
        return jnp.concatenate([arr2[:, a:b] for a, b in segs], axis=1)
    return arr2[:, idx_j]


class SoaTables:
    """Static gather tables for the SoA face stage."""

    def __init__(self, block: ElementBlock, n_fields: int):
        ops = block.ops
        Pf = ops.n_fpts
        nfp = int(ops.n_fpts_per_face[0])
        nf = ops.n_faces
        E = block.n_eles
        F = n_fields
        self.ok = False
        if block.int_slot_l.size == 0:
            return
        Fi = block.int_slot_l.shape[0]
        Fb = block.bdy_slot.shape[0] if block.bdy_slot.size else 0

        slot_l = block.int_slot_l            # (Fi, nfp) slot = e*Pf + fpt
        slot_r = block.int_slot_r
        # orient pairings by local face id: L = the side with the SMALLER
        # lf.  Periodic wrap faces otherwise flip orientation for the
        # wrap-layer minority, making every lf mixed-side and disabling
        # the direct scatter path below.  L/R is arbitrary physics-wise
        # (Riemann/LDG common fluxes are antisymmetric under
        # (l<->r, n->-n) and all face geometry is slot-derived), so pick
        # the orientation that makes each lf single-side.  Ties
        # (lf_l == lf_r, e.g. simplex pairings) keep the original side.
        lf_a = (slot_l % Pf)[:, 0] // nfp
        lf_b = (slot_r % Pf)[:, 0] // nfp
        swap = lf_a > lf_b
        if swap.any():
            slot_l, slot_r = slot_l.copy(), slot_r.copy()
            for i in np.where(swap)[0]:
                o = np.argsort(slot_r[i] % Pf)
                slot_l[i], slot_r[i] = slot_r[i][o], slot_l[i][o]
        ele_l = slot_l[:, 0] // Pf
        ele_r = slot_r[:, 0] // Pf
        fpt_l = slot_l % Pf                  # (Fi, nfp)
        fpt_r = slot_r % Pf

        # the inverse tables assume l-side rows are in the element's local
        # ascending fpt order (face-contiguous slots); verify
        base_l = (fpt_l[:, 0] // nfp)[:, None] * nfp + np.arange(nfp)
        if not np.array_equal(fpt_l, base_l):
            return

        # group faces by the static (l-row, r-row) fpt patterns
        keys = {}
        order = []
        for i in range(Fi):
            k = (tuple(fpt_l[i]), tuple(fpt_r[i]))
            if k not in keys:
                keys[k] = len(keys)
                order.append([])
            order[keys[k]].append(i)
        if len(keys) > 64:                   # pathological mesh: fall back
            return

        def rows_of(fpts):
            """(nfp,) fpt ids -> (nfp*F,) row ids into the (Pf*F, E) view."""
            return (np.asarray(fpts)[:, None] * F
                    + np.arange(F)[None, :]).reshape(-1)

        d = ops.n_dims

        def rows_fm_of(fpts):
            """Field-major rows: gather result IS the F stacked planes
            (row i*nfp+k = plane i, face point k) — no interleave gather."""
            return (np.asarray(fpts)[None, :] * F
                    + np.arange(F)[:, None]).reshape(-1)


        ref_vol = {1: 4.0, 4: 8.0, 0: 2.0, 2: 4.0 / 3.0,
                   3: 4.0}[ops.ele_type]
        _delta_slot = ((block.detjac_fpts * ref_vol) ** (1.0 / ops.n_dims)
                       / (ops.order + 1))
        _wdist_slot = (block.wall_dist_fpts
                       if getattr(block, "wall_dist_fpts", None) is not None
                       else np.full_like(_delta_slot, 1e10))
        self.delta_slot = _delta_slot
        self.wdist_slot = _wdist_slot

        self.groups = []
        pool_pos_l = np.empty(Fi, dtype=np.int64)   # face -> pool column
        pool_pos_r = np.empty(Fi, dtype=np.int64)
        col = 0
        for k, gi in zip(keys, order):
            gi = np.asarray(gi)
            # sort the group's faces by the l element id: the l-side
            # element gather becomes the identity (or long consecutive
            # runs), and structured partners keep long runs on the r side
            gi = gi[np.argsort(ele_l[gi], kind="stable")]
            Ng = gi.size
            fl, fr = np.asarray(k[0]), np.asarray(k[1])
            # the pool's r-side copy must be in the R element's local
            # ascending fpt order: row k of that copy is the l-ordered row
            # j whose r-fpt fr[j] is the k-th smallest
            r_order = np.argsort(fr)
            g = {
                "idx_l": ele_l[gi], "idx_r": ele_r[gi],
                "rows_l": rows_of(fl), "rows_r": rows_of(fr),
                "rows_fm_l": rows_fm_of(fl), "rows_fm_r": rows_fm_of(fr),
                "rows_r_local": (r_order[:, None] * F
                                 + np.arange(F)[None, :]).reshape(-1),
                "faces": gi,
            }
            # per-group geometry (np, converted to jnp by BlockArraysSoa)
            sl = slot_l[gi]                  # (Ng, nfp) global slots
            sr = slot_r[gi]
            g["norm"] = np.transpose(block.norm_fpts[sl], (1, 2, 0))
            g["jginv_l"] = np.transpose(block.jginv_fpts[sl], (1, 2, 3, 0))
            g["jginv_r"] = np.transpose(block.jginv_fpts[sr], (1, 2, 3, 0))
            g["inv_det_l"] = np.transpose(
                1.0 / block.detjac_fpts[sl], (1, 0))
            g["inv_det_r"] = np.transpose(
                1.0 / block.detjac_fpts[sr], (1, 0))
            # LES cutoff length + wall distance at the face slots
            # (ref:src/eles.cpp:2480-2481); harmless constants otherwise
            g["delta_l"] = _delta_slot[sl].T
            g["delta_r"] = _delta_slot[sr].T
            g["wdist_l"] = _wdist_slot[sl].T
            g["wdist_r"] = _wdist_slot[sr].T
            pool_pos_l[gi] = col + np.arange(Ng)
            pool_pos_r[gi] = Fi + col + np.arange(Ng)
            col += Ng
            self.groups.append(g)

        # boundary block: one pool section after the 2*Fi interior columns
        self.Fb = Fb
        if Fb:
            bslot = block.bdy_slot           # (Fb, nfp)
            self.ele_b = bslot[:, 0] // Pf
            fpt_b = bslot % Pf
            self.rows_b = np.stack([rows_of(fpt_b[i]) for i in range(Fb)])
            # rows into the dim-concatenated (Pf*d*F, E) face-gradient view
            self.rows_b3 = np.stack([np.stack(
                [(fpt_b[i][:, None] * (d * F) + m * F
                  + np.arange(F)[None, :]).reshape(-1) for i in range(Fb)])
                for m in range(d)])
            # boundary faces share a pool layout only if their fpt rows are
            # identical per face; gather per-face rows instead (2-D fancy
            # gather over (Fb, nfp*F) is fine on the small boundary set)
            pool_pos_b = 2 * Fi + np.arange(Fb)
            self.bdy_lf = fpt_b[:, 0] // nfp
            # per-lf READ groups: a face's fpt rows are contiguous in Pf,
            # so the boundary read is a free [lf*nfp, lf*nfp+nfp) slice of
            # the (Pf, K, E) GEMM output + one minor element gather.  The
            # per-face 2-axis fancy gather it replaces lowers to a serial
            # ~10 ns/element TPU gather (936 us for 92k elements, profiled
            # on the mixed3d wall-model channel).
            self.bdy_groups = []
            cat_order = []
            contig = np.array_equal(
                fpt_b, self.bdy_lf[:, None] * nfp + np.arange(nfp))
            if contig:
                for lf in np.unique(self.bdy_lf):
                    idx = np.where(self.bdy_lf == lf)[0]
                    idx = idx[np.argsort(self.ele_b[idx], kind="stable")]
                    cat_order.append(idx)
                    self.bdy_groups.append(
                        dict(f0=int(lf) * nfp, ele=self.ele_b[idx]))
                catf = np.concatenate(cat_order)
                if np.array_equal(catf, np.arange(Fb)):
                    self.bdy_perm = None
                else:
                    pos = np.empty(Fb, dtype=np.int64)
                    pos[catf] = np.arange(Fb)
                    self.bdy_perm = pos
            else:                       # non-contiguous rows: keep the
                self.bdy_groups = None  # general per-face gather
        else:
            self.ele_b = np.empty(0, dtype=np.int64)
            self.rows_b = np.empty((0, nfp * F), dtype=np.int64)
            self.rows_b3 = np.empty((d, 0, nfp * F), dtype=np.int64)
            pool_pos_b = np.empty(0, dtype=np.int64)
            self.bdy_lf = np.empty(0, dtype=np.int64)

        # inverse tables: for each local face lf, which pool column feeds
        # element e (every (e, lf) is covered exactly once on a conforming
        # mesh — cyclic faces are interior)
        lf_l = fpt_l[:, 0] // nfp
        lf_r = fpt_r[:, 0] // nfp
        sel = -np.ones((nf, E), dtype=np.int64)
        sel[lf_l, ele_l] = pool_pos_l
        sel[lf_r, ele_r] = pool_pos_r
        if Fb:
            sel[self.bdy_lf, self.ele_b] = pool_pos_b
        if (sel < 0).any():
            return                           # coverage hole: fall back
        self.sel = sel                       # (nf, E)

        # direct per-local-face mapping: when every element's face lf comes
        # from ONE (group, side), the inverse "pool gather" collapses to a
        # column slice (+ permutation when the elements aren't in group
        # order).  On a periodic box every lf is direct and three of six
        # permutations are the identity — the general pool path then reads
        # 3x the bytes for nothing.  None when any lf is mixed/boundary.
        offs = np.concatenate(
            [[0], np.cumsum([len(o) for o in order])]).astype(np.int64)
        self.group_offs = offs
        lf_direct = []
        ar = np.arange(E)
        for lf in range(nf):
            cols = sel[lf]
            if Fb and (cols >= 2 * Fi).any():
                lf_direct = None
                break
            side = 0 if (cols < Fi).all() else \
                (1 if (cols >= Fi).all() else None)
            if side is None:
                lf_direct = None
                break
            c = cols - side * Fi
            g = int(np.searchsorted(offs, c[0], side="right") - 1)
            if not ((c >= offs[g]) & (c < offs[g + 1])).all():
                lf_direct = None
                break
            perm = c - offs[g]
            lf_direct.append((side, g,
                              None if np.array_equal(perm, ar) else perm))
        self.lf_direct = lf_direct
        # identity short-circuit flags for the group tables
        for g, gdict in enumerate(self.groups):
            gdict["idx_l_id"] = np.array_equal(gdict["idx_l"], ar[:gdict["idx_l"].size]) \
                and gdict["idx_l"].size == E
            gdict["idx_r_id"] = np.array_equal(gdict["idx_r"], ar[:gdict["idx_r"].size]) \
                and gdict["idx_r"].size == E
            nfF = gdict["rows_r_local"].size
            gdict["r_local_id"] = np.array_equal(gdict["rows_r_local"],
                                                 np.arange(nfF))
        self.Fi, self.nfp, self.nf, self.Pf = Fi, nfp, nf, Pf
        self.ok = True


class BlockArraysSoa:
    """Device-side constants in SoA layouts."""

    def __init__(self, block: ElementBlock, B: BlockArrays, T: SoaTables,
                 dtype):
        f = lambda a: jnp.asarray(a, dtype=dtype)
        i32 = lambda a: jnp.asarray(a, dtype=jnp.int32)

        def fgeo(a):
            """Geometry plane with the minor (element/face-column) axis
            compressed to 1 when every column is identical — affine
            uniform meshes (the TGV box) then broadcast instead of
            carrying E copies.  Cuts the 32^3 p=4 jitted chunk's constant
            payload ~700 MB -> ~1 MB (the axon remote-compile tunnel
            rejects oversized modules with HTTP 413) and shrinks every
            uniform-mesh compile.  rtol 1e-12: columns differ only by
            coordinate-subtraction ulps on a uniform lattice."""
            import os as _os
            a = np.asarray(a)
            if (a.ndim and a.shape[-1] > 1
                    and not _os.environ.get("HIFILES_NO_GEO_COMPRESS")):
                ref = a[..., :1]
                scale = np.abs(ref).max()
                if scale > 0 and np.all(np.abs(a - ref) <= 1e-12 * scale):
                    return f(np.ascontiguousarray(ref))
            return f(a)
        d = B.n_dims
        E, Pf = B.n_eles, B.n_fpts
        self.opp_0 = B.opp_0
        self.opp_2_stack = B.opp_2_stack
        self.opp_5_stack = B.opp_5_stack
        self.opp_div_all = B.opp_div_all
        # NOTE (measured, TPU v5e TGV p=4): merging the GEMMs that share an
        # input into one launch ([opp_0; opp_2*] @ u, [opp_5*] @ delta) is
        # 5% SLOWER (2.56e8 vs 2.71e8 DOF*stage/s back-to-back) — XLA fuses
        # each separate GEMM's epilogue into its consumer, which the merged
        # launch forces to materialize.  Keep per-consumer GEMMs.
        # By the same token the divergence runs SPLIT on the plain path:
        # one GEMM per transformed-flux dim plane + one for the face
        # correction, so the (d*U+Pf, F, E) rhs_cat concat (a DUS chain +
        # an extra 13 MB round trip) never materializes and each
        # elementwise tdisf plane fuses upstream (4.21e8 vs 4.17e8).
        # With over-integration ON the tdisf planes are GEMM outputs
        # (over_filter projection) that must materialize anyway, and the
        # single fused divergence GEMM measures FASTER there (2.85e8 vs
        # 2.64e8) — keep rhs_cat + opp_div_all on the over-int path.
        U = B.n_upts
        ops = block.ops
        self.opp_div_parts = [f(ops.opp_div_fused[:, l * U:(l + 1) * U])
                              for l in range(d)]
        self.opp_div_cat = f(ops.opp_div_fused)        # (U, d*U)
        self.opp_corr = f(ops.opp_3)
        # face-row (lf, fpt) views of the lift operators: the face stage
        # produces FIELD-major rows (nf, F, nfp, E); the lift GEMMs
        # contract (lf, fpt) directly via multi-dim dot_general — no
        # fpt-major deinterleave of the face rows anywhere
        nf_, nfp_ = T.nf, T.nfp
        self.opp_corr4 = self.opp_corr.reshape(U, nf_, nfp_)
        self.opp_5q = [jnp.reshape(B.opp_5_stack[m], (U, nf_, nfp_))
                       for m in range(d)]
        # jginv planes at upts: jg[l][m] (U, 1, E)
        self.jg_u = [[fgeo(block.jginv_upts[:, :, l, m].T)[:, None, :]
                      for m in range(d)] for l in range(d)]
        self.inv_det_u = fgeo(1.0 / block.detjac_upts.T)[:, None, :]
        # per-group gather tables + column slice into the concatenated
        # all-interior-faces arrays (l-section / pool order)
        self.groups = []
        off = 0
        nFq = T.groups[0]["rows_fm_l"].size // T.nfp if T.groups else 1
        fmaj = lambda v: (v % nFq) * T.Pf + v // nFq
        for g in T.groups:
            ng = g["idx_l"].size
            self.groups.append({
                "idx_l": i32(g["idx_l"]), "idx_r": i32(g["idx_r"]),
                "rows_l": i32(g["rows_l"]), "rows_r": i32(g["rows_r"]),
                "rows_fm_l": i32(g["rows_fm_l"]),
                "rows_fm_r": i32(g["rows_fm_r"]),
                # same rows into a FIELD-major (F*Pf, E) source (a plain
                # plane concat, no interleave copy on the producer side)
                "rows_fq_l": i32(fmaj(g["rows_fm_l"])),
                "rows_fq_r": i32(fmaj(g["rows_fm_r"])),
                "rows_r_local": i32(g["rows_r_local"]),
                # field-major r-local permutation of (F*nfp, .) rows
                "rows_rq_local": i32(
                    (np.arange(nFq)[:, None] * T.nfp
                     + (g["rows_r_local"].reshape(T.nfp, nFq)[:, 0] // nFq)
                     [None, :]).reshape(-1)),
                "idx_l_id": g["idx_l_id"], "idx_r_id": g["idx_r_id"],
                "idx_l_segs": _segments(g["idx_l"]),
                "idx_r_segs": _segments(g["idx_r"]),
                "r_local_id": g["r_local_id"],
                "sl": slice(off, off + ng),
            })
            off += ng
        # direct per-lf inverse mapping (see SoaTables)
        self.lf_direct = None
        if T.lf_direct is not None:
            self.lf_direct = [(side, g,
                               None if perm is None else i32(perm),
                               None if perm is None else _segments(perm))
                              for side, g, perm in T.lf_direct]
        # concatenated face geometry (one plane set across all groups, in
        # group order = pool l-section order)
        cat = lambda key: np.concatenate([g[key] for g in T.groups], -1)
        norm_all = cat("norm")                      # (nfp, d, Fi)
        jgl = cat("jginv_l")                        # (nfp, d, d, Fi)
        jgr = cat("jginv_r")
        self.norm = [fgeo(norm_all[:, m]) for m in range(d)]
        self.jginv_l = [[fgeo(jgl[:, m, l]) for l in range(d)]
                        for m in range(d)]
        self.jginv_r = [[fgeo(jgr[:, m, l]) for l in range(d)]
                        for m in range(d)]
        self.inv_det_l = fgeo(cat("inv_det_l"))
        self.inv_det_r = fgeo(cat("inv_det_r"))
        self.delta_l = fgeo(cat("delta_l"))         # (nfp, Fi)
        self.delta_r = fgeo(cat("delta_r"))
        self.wdist_l = fgeo(cat("wdist_l"))
        self.wdist_r = fgeo(cat("wdist_r"))
        # LES cutoff length + wall distance planes at upts
        ops = block.ops
        ref_vol = {1: 4.0, 4: 8.0, 0: 2.0, 2: 4.0 / 3.0,
                   3: 4.0}[ops.ele_type]
        self.delta_u = fgeo(((block.detjac_upts * ref_vol)
                          ** (1.0 / d) / (ops.order + 1)).T)      # (U, E)
        self.wdist_u = (fgeo(block.wall_dist_upts.T)
                        if getattr(block, "wall_dist_upts", None) is not None
                        else jnp.full_like(self.delta_u, 1e10))
        # element-side fpt geometry planes (Pf, E): metric, outward normal,
        # LES cutoff + wall distance — the interior viscous face stage
        # evaluates the viscous NORMAL flux on the element side and gathers
        # one scalar plane per field instead of d gradient planes per side
        jgf = block.jginv_fpts.reshape(E, Pf, d, d)
        self.jg_f = [[fgeo(jgf[:, :, m, l].T) for l in range(d)]
                     for m in range(d)]
        self.inv_det_f = fgeo(1.0 / block.detjac_fpts.reshape(E, Pf).T)
        nrmf = block.norm_fpts.reshape(E, Pf, d)
        self.norm_f = [fgeo(nrmf[:, :, m].T) for m in range(d)]
        self.delta_f = fgeo(T.delta_slot.reshape(E, Pf).T)
        self.wdist_f = fgeo(T.wdist_slot.reshape(E, Pf).T)
        # over-integration (de-aliasing) operators in SoA layouts
        if block.jginv_over is not None:
            self.opp_over = f(block.opp_over)                     # (C2, U)
            self.over_filter = f(block.over_filter)               # (U, C2)
            self.jg_o = [[f(block.jginv_over[:, :, l, m].T)[:, None, :]
                          for m in range(d)] for l in range(d)]
        self.sel = i32(T.sel)
        # per-lf run decomposition of the inverse tables: on wall-bounded
        # meshes lf_direct is None and the (nf x E) pool gathers run here;
        # consecutive runs turn them into slices (loosened threshold — a
        # few dozen runs still beat one lane gather)
        self.sel_segs = [_segments(T.sel[lf], min_avg_run=32)
                         for lf in range(T.nf)]
        if T.Fb:
            self.ele_b = i32(T.ele_b)
            self.rows_b = i32(T.rows_b)
            # same boundary rows into the FIELD-major (F*Pf, E) d2 view
            self.rows_b_fq = i32((T.rows_b % nFq) * T.Pf
                                 + T.rows_b // nFq)
            self.rows_b3 = i32(T.rows_b3)
            self.norm_bdy = B.norm_bdy          # AoS (Fb, nfp, d)
            self.jginv_bdy = getattr(B, "jginv_bdy", None)
            self.inv_detjac_bdy = getattr(B, "inv_detjac_bdy", None)
            # per-lf boundary read groups (slice + minor element gather)
            self.bdy_groups = None
            if T.bdy_groups is not None:
                self.bdy_groups = [
                    dict(f0=g["f0"], ele=i32(g["ele"]),
                         segs=_segments(g["ele"]))
                    for g in T.bdy_groups]
                self.bdy_perm = (None if T.bdy_perm is None
                                 else i32(T.bdy_perm))


# ----------------------------------------------------------------------
# plane-based physics (fields as a list of (..., E) planes)
# ----------------------------------------------------------------------

def _prims_p(u, norm, d, gamma):
    """u: list of F planes; norm: list of d planes."""
    rho = u[0]
    inv_rho = 1.0 / rho
    vel = [u[1 + m] * inv_rho for m in range(d)]
    vn = sum(vel[m] * norm[m] for m in range(d))
    vsq = sum(v * v for v in vel)
    p = (gamma - 1.0) * (u[d + 1] - 0.5 * rho * vsq)
    return rho, vel, vn, vsq, p


def _normal_flux_p(u, norm, d, gamma):
    rho, vel, vn, vsq, p = _prims_p(u, norm, d, gamma)
    mn = rho * vn
    out = ([mn] + [u[1 + m] * vn + p * norm[m] for m in range(d)]
           + [(u[d + 1] + p) * vn])
    # SA working variable advects passively (ref:src/flux.cpp:55-59)
    for k in range(d + 2, len(u)):
        out.append(u[k] * vn)
    return out


def rusanov_p(u_l, u_r, norm, gamma, d):
    """ref:src/inters.cpp:277-324 on planes."""
    fn_l = _normal_flux_p(u_l, norm, d, gamma)
    fn_r = _normal_flux_p(u_r, norm, d, gamma)
    rho_l, _, vn_l, _, p_l = _prims_p(u_l, norm, d, gamma)
    rho_r, _, vn_r, _, p_r = _prims_p(u_r, norm, d, gamma)
    eig = (jnp.sqrt(gamma * (p_l + p_r) / (rho_l + rho_r))
           + 0.5 * jnp.abs(vn_l + vn_r))
    return [0.5 * ((fl + fr) - eig * (ur - ul))
            for fl, fr, ul, ur in zip(fn_l, fn_r, u_l, u_r)]


def hllc_p(u_l, u_r, norm, gamma, d):
    """HLLC with Roe-average wavespeeds (ref:src/inters.cpp:439-532)."""
    fn_l = _normal_flux_p(u_l, norm, d, gamma)
    fn_r = _normal_flux_p(u_r, norm, d, gamma)
    rho_l, _, vn_l, _, p_l = _prims_p(u_l, norm, d, gamma)
    rho_r, _, vn_r, _, p_r = _prims_p(u_r, norm, d, gamma)
    E_l, E_r = u_l[d + 1], u_r[d + 1]
    h_l = (E_l + p_l) / rho_l
    h_r = (E_r + p_r) / rho_r
    sq_rho = jnp.sqrt(rho_r / rho_l)
    rrho = 1.0 / (sq_rho + 1.0)
    vn_m = rrho * (vn_l + sq_rho * vn_r)
    h_m = rrho * (h_l + sq_rho * h_r)
    a_m = jnp.sqrt((gamma - 1.0) * (h_m - 0.5 * vn_m * vn_m))
    S_R = vn_m + a_m
    S_L = vn_m - a_m
    S_star = ((p_r - p_l + rho_l * vn_l * (S_L - vn_l)
               - rho_r * vn_r * (S_R - vn_r))
              / (rho_l * (S_L - vn_l) - rho_r * (S_R - vn_r)))

    def star(S, u, fn, rho, vn, p):
        rcp = 1.0 / (S - S_star)
        pre = p + rho * (S - vn) * (S_star - vn)
        out = [S_star * (S * u[0] - fn[0]) * rcp]
        for m in range(d):
            out.append((S_star * (S * u[1 + m] - fn[1 + m])
                        + S * pre * norm[m]) * rcp)
        out.append((S_star * (S * u[d + 1] - fn[d + 1])
                    + S * pre * S_star) * rcp)
        return out

    f_sl = star(S_L, u_l, fn_l, rho_l, vn_l, p_l)
    f_sr = star(S_R, u_r, fn_r, rho_r, vn_r, p_r)
    cl, cs, cr = S_L >= 0, S_star >= 0, S_R >= 0
    return [jnp.where(cl, a, jnp.where(cs, b, jnp.where(cr, c, e)))
            for a, b, c, e in zip(fn_l, f_sl, f_sr, fn_r)]


def roem_p(u_l, u_r, norm, gamma, d):
    """RoeM scheme (ref:src/inters.cpp:327-437) on planes."""
    F = len(u_l)
    fn_l = _normal_flux_p(u_l, norm, d, gamma)
    fn_r = _normal_flux_p(u_r, norm, d, gamma)
    rho_l, v_l, vn_l, _, p_l = _prims_p(u_l, norm, d, gamma)
    rho_r, v_r, vn_r, _, p_r = _prims_p(u_r, norm, d, gamma)
    E_l, E_r = u_l[d + 1], u_r[d + 1]
    h_l = (E_l + p_l) / rho_l
    h_r = (E_r + p_r) / rho_r
    drho, dp, dh, dvn = rho_r - rho_l, p_r - p_l, h_r - h_l, vn_r - vn_l
    sq_rho = jnp.sqrt(rho_r / rho_l)
    rrho = 1.0 / (1.0 + sq_rho)
    ratr = sq_rho * rrho
    ra = sq_rho * rho_l
    ha = h_l * rrho + h_r * ratr
    va = [v_l[m] * rrho + v_r[m] * ratr for m in range(d)]
    qq = sum(v * v for v in va)
    va_n = sum(va[m] * norm[m] for m in range(d))
    aa = jnp.sqrt((gamma - 1.0) * (ha - 0.5 * qq))
    rcp_aa = 1.0 / aa
    abs_ma = jnp.abs(va_n * rcp_aa)
    b1 = jnp.maximum(0.0, jnp.maximum(va_n + aa, vn_r + aa))
    b2 = jnp.minimum(0.0, jnp.minimum(va_n - aa, vn_l - aa))
    b1b2 = b1 * b2
    rcp_b1_b2 = 1.0 / (b1 - b2)
    b1, b2, b1b2 = b1 * rcp_b1_b2, b2 * rcp_b1_b2, b1b2 * rcp_b1_b2
    h = 1.0 - jnp.minimum(p_l / p_r, p_r / p_l)
    f_ = jnp.where(abs_ma != 0.0, abs_ma**h, 1.0)
    g_ = f_ / (1.0 + abs_ma)
    du = [ur - ul for ul, ur in zip(u_l, u_r)]
    du[d + 1] = rho_r * h_r - rho_l * h_l
    bdq0 = drho - f_ * dp * rcp_aa * rcp_aa
    bdq = [bdq0]
    for m in range(d):
        bdq.append(bdq0 * va[m] + ra * ((v_r[m] - v_l[m]) - norm[m] * dvn))
    bdq.append(bdq0 * ha + ra * dh)
    while len(bdq) < F:
        bdq.append(jnp.zeros_like(bdq0))
    return [b1 * fl - b2 * fr + b1b2 * (duk - g_ * bq)
            for fl, fr, duk, bq in zip(fn_l, fn_r, du, bdq)]


def lf_p(u_l, u_r, norm, wave_speed, lam):
    """Scalar advection LF flux (ref:src/inters.cpp:535-557) on planes."""
    u_av = 0.5 * (u_l[0] + u_r[0])
    u_diff = u_l[0] - u_r[0]
    ns = sum(wave_speed[m] * norm[m] for m in range(len(norm)))
    return [ns * u_av + 0.5 * lam * jnp.abs(ns) * u_diff]


def ldg_sign_p(norm, tol=1e-10):
    """Plane version of riemann.ldg_beta_switch."""
    n0 = norm[0]
    n01 = n0 + norm[1]
    n02 = n0 + norm[2] if len(norm) == 3 else jnp.ones_like(n0)
    one = jnp.ones_like(n0)       # keep the input dtype (no weak-f64)
    return jnp.where(
        n0 < -tol, -one,
        jnp.where(n0 > tol, one,
                  jnp.where(n01 < -tol, -one,
                            jnp.where(n01 > tol, one,
                                      jnp.where(n02 < -tol, -one, one)))))


def visc_flux_p(u, gr, d, *, gamma, prandtl, mu_inf, rt_inf, c_sth, fix_vis,
                rans=False, prandtl_t=0.9, c_v1=7.1, omega=2.0 / 3.0):
    """Viscous flux planes: u F-list, gr [d][F]-list -> [d][F]-list
    (same algebra as models/viscous.py, ref:src/flux.cpp:127-325; SA
    diffusion ref:src/flux.cpp:225-241)."""
    rho = u[0]
    inv_rho = 1.0 / rho
    v = [u[1 + m] * inv_rho for m in range(d)]
    q2 = sum(vi * vi for vi in v)
    inte = u[d + 1] * inv_rho - 0.5 * q2
    if fix_vis:
        mu = mu_inf
    else:
        rt_ratio = (gamma - 1.0) * inte / rt_inf
        mu = mu_inf * rt_ratio**1.5 * (1.0 + c_sth) / (rt_ratio + c_sth)
    if rans:
        nu_tilde_c = u[d + 2]
        chi = nu_tilde_c / mu
        f_v1 = chi**3 / (chi**3 + c_v1**3)
        mu_t = jnp.where(nu_tilde_c >= 0.0, nu_tilde_c * f_v1, 0.0)
        mu_tot = mu + mu_t
        kth = (mu / prandtl + mu_t / prandtl_t) * gamma
    else:
        mu_tot = mu
        kth = mu * gamma / prandtl
    dv = [[(gr[l][1 + i] - v[i] * gr[l][0]) * inv_rho for l in range(d)]
          for i in range(d)]
    dint = [(gr[l][d + 1] - (0.5 * q2 + inte) * gr[l][0]) * inv_rho
            - sum(v[i] * dv[i][l] for i in range(d)) for l in range(d)]
    div = sum(dv[i][i] for i in range(d))
    tau = [[mu_tot * (dv[i][l] + dv[l][i]) for l in range(d)]
           for i in range(d)]
    for i in range(d):
        tau[i][i] = tau[i][i] - 2.0 / 3.0 * mu_tot * div
    out = []
    for mm in range(d):
        rows = [jnp.zeros_like(rho)]
        for i in range(d):
            rows.append(-tau[i][mm])
        rows.append(-(sum(v[i] * tau[i][mm] for i in range(d))
                      + kth * dint[mm]))
        out.append(rows)
    if rans:
        nu_tilde = nu_tilde_c * inv_rho
        psi = jnp.where(chi <= 10.0,
                        0.05 * jax.nn.softplus(20.0 * chi), chi)
        coef = (1.0 / omega) * mu * (1.0 + psi)
        for mm in range(d):
            dnu = (gr[mm][d + 2] - gr[mm][0] * nu_tilde) * inv_rho
            out[mm].append(-coef * dnu)
    return out


def sgs_flux_p(u, gr, delta, wdist, d, *, sgs_model, C_s, gamma, prandtl_t,
               kappa):
    """Eddy-viscosity SGS flux planes (models/sgs.py sgs_flux on planes,
    ref:src/eles.cpp:2470-2612).  ``delta`` already includes the
    filter-ratio factor.  Returns [d][F]-list added to the viscous flux."""
    F = len(u)
    rho = u[0]
    inv_rho = 1.0 / rho
    v = [u[1 + m] * inv_rho for m in range(d)]
    q2 = sum(vi * vi for vi in v)
    inte = u[d + 1] * inv_rho - 0.5 * q2
    dv = [[(gr[l][1 + i] - v[i] * gr[l][0]) * inv_rho for l in range(d)]
          for i in range(d)]
    dke = [0.5 * q2 * gr[l][0]
           + rho * sum(v[i] * dv[i][l] for i in range(d)) for l in range(d)]
    de = [(gr[l][d + 1] - dke[l] - gr[l][0] * inte) * inv_rho
          for l in range(d)]
    S = [[0.5 * (dv[i][l] + dv[l][i]) for l in range(d)] for i in range(d)]

    if sgs_model == 0:
        # Smagorinsky with wall limiting (ref:src/eles.cpp:2470-2546)
        Smod = jnp.sqrt(2.0 * sum(S[i][l] * S[i][l]
                                  for i in range(d) for l in range(d)))
        lim = jnp.minimum(wdist * wdist * kappa**2, C_s**2 * delta * delta)
        mu_t = rho * lim * Smod
    else:
        # WALE (ref:src/eles.cpp:2548-2592)
        eps = 1e-12
        g2 = [[sum(dv[i][k] * dv[k][l] for k in range(d)) for l in range(d)]
              for i in range(d)]
        trace3 = sum(g2[i][i] for i in range(d)) / 3.0
        Sq = [[0.5 * (g2[i][l] + g2[l][i]) - (trace3 if i == l else 0.0)
               for l in range(d)] for i in range(d)]
        num = sum(Sq[i][l] * Sq[i][l] for i in range(d) for l in range(d))
        den = sum(S[i][l] * S[i][l] for i in range(d) for l in range(d))
        den = den**2.5 + num**1.25
        mu_t = rho * C_s**2 * delta * delta * num**1.5 / (den + eps)

    trS3 = sum(S[i][i] for i in range(d)) / 3.0
    mom = [[-2.0 * mu_t * (S[i][l] - (trS3 if i == l else 0.0))
            for l in range(d)] for i in range(d)]
    coef = gamma * mu_t / prandtl_t
    out = []
    zero = jnp.zeros_like(rho)
    for mm in range(d):
        rows = [zero]
        for i in range(d):
            rows.append(mom[i][mm])
        rows.append(-coef * de[mm]
                    + sum(v[k] * mom[k][mm] for k in range(d)))
        while len(rows) < F:
            rows.append(zero)
        out.append(rows)
    return out


def similarity_terms_p(u, dg_filter, d):
    """Leonard tensors on planes (models/sgs.py similarity_terms,
    ref:src/eles.cpp:2091-2218).  ``dg_filter(x)`` applies the LES modal
    filter along the solution-point axis of an (U, K, E) stack.
    Returns (Lu [n_pairs], Le [d]) plane lists."""
    F = len(u)
    rho = u[0]
    mom = [u[1 + i] for i in range(d)]
    inte_r = u[d + 1] - 0.5 * sum(m * m for m in mom) / rho
    rsq = rho * rho
    pairs = ([(0, 0), (1, 1), (0, 1)] if d == 2
             else [(0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2)])
    uu = [mom[a] * mom[b] / rsq for a, b in pairs]
    ue = [mom[a] * inte_r / rsq for a in range(d)]
    # one filter GEMM over [u | uu | ue]
    stack = jnp.stack(u + uu + ue, axis=1)            # (U, F+P+d, E)
    filt = dg_filter(stack)
    uf = [filt[:, k] for k in range(F)]
    Lu = [filt[:, F + k] for k in range(len(pairs))]
    Le = [filt[:, F + len(pairs) + k] for k in range(d)]
    rho_f = uf[0]
    mom_f = [uf[1 + i] for i in range(d)]
    inte_rf = uf[d + 1] - 0.5 * sum(m * m for m in mom_f) / rho_f
    rsq_f = rho_f * rho_f
    Lu = [Lu[k] - mom_f[a] * mom_f[b] / rsq_f
          for k, (a, b) in enumerate(pairs)]
    diag = sum(Lu[:d]) / 3.0
    Lu = [(Lu[k] - diag if k < d else Lu[k]) for k in range(len(pairs))]
    Le = [(Le[a] - mom_f[a] * inte_rf) / rsq_f for a in range(d)]
    return Lu, Le


def similarity_flux_p(u, Lu, Le, gamma, d):
    """Similarity SGS flux planes (ref:src/eles.cpp:2615-2644)."""
    F = len(u)
    rho = u[0]
    idx = [[0, 2], [2, 1]] if d == 2 else [[0, 3, 4], [3, 1, 5], [4, 5, 2]]
    out = []
    zero = jnp.zeros_like(rho)
    for mm in range(d):
        rows = [zero]
        for i in range(d):
            rows.append(rho * Lu[idx[i][mm]])
        rows.append(gamma * rho * Le[mm])
        while len(rows) < F:
            rows.append(zero)
        out.append(rows)
    return out


def sa_source_p(u, gr, wdist, d, *, gamma, mu_inf, rt_inf, c_sth, fix_vis,
                kappa, c_v1, c_v2, c_v3, c_b1, c_b2, c_w2, c_w3, omega):
    """SA source on planes (models/sa.py, ref:src/source.cpp:33-105)."""
    rho = u[0]
    inv_rho = 1.0 / rho
    v = [u[1 + m] * inv_rho for m in range(d)]
    nu_tilde_c = u[d + 2]
    nu_tilde = nu_tilde_c * inv_rho
    inte = u[d + 1] * inv_rho - 0.5 * sum(vi * vi for vi in v)
    if fix_vis:
        mu = mu_inf
    else:
        rt_ratio = (gamma - 1.0) * inte / rt_inf
        mu = mu_inf * rt_ratio**1.5 * (1.0 + c_sth) / (rt_ratio + c_sth)
    dv = [[(gr[l][1 + i] - v[i] * gr[l][0]) * inv_rho for l in range(d)]
          for i in range(d)]
    dnu = [(gr[l][d + 2] - gr[l][0] * nu_tilde) * inv_rho for l in range(d)]
    if d == 2:
        S = jnp.abs(dv[1][0] - dv[0][1])
    else:
        wx = dv[2][1] - dv[1][2]
        wy = dv[0][2] - dv[2][0]
        wz = dv[1][0] - dv[0][1]
        S = jnp.sqrt(wx * wx + wy * wy + wz * wz)
    chi = nu_tilde_c / mu
    psi = jnp.where(chi <= 10.0, 0.05 * jax.nn.softplus(20.0 * chi), chi)
    f_v1 = chi**3 / (chi**3 + c_v1**3)
    f_v2 = 1.0 - psi / (1.0 + psi * f_v1)
    kd2 = kappa**2 * wdist * wdist
    mp_r = mu * psi * inv_rho
    S_bar = mp_r * mp_r * f_v2 / kd2
    S_tilde = jnp.where(
        S_bar >= -c_v2 * S, S + S_bar,
        S + S * (c_v2**2 * S + c_v3 * S_bar)
        / ((c_v3 - 2.0 * c_v2) * S - S_bar))
    prod = c_b1 * S_tilde * mu * psi
    diff = (1.0 / omega) * c_b2 * rho * sum(dn * dn for dn in dnu)
    c_w1 = c_b1 / kappa**2 + (1.0 / omega) * (1.0 + c_b2)
    r = jnp.minimum(mp_r / (S_tilde * kd2), 10.0)
    g = r + c_w2 * (r**6 - r)
    f_w = g * ((1.0 + c_w3**6) / (g**6 + c_w3**6)) ** (1.0 / 6.0)
    dest = -c_w1 * rho * f_w * (mp_r / wdist) ** 2
    return prod + diff + dest


# ----------------------------------------------------------------------
# the residual
# ----------------------------------------------------------------------

def make_residual_soa(block: ElementBlock, cfg: ResidualConfig, dtype,
                      bc_fns=None):
    """Build residual_soa(u) with u (U, F, E) -> rhs (U, F, E), or None when
    this configuration isn't supported."""
    B = BlockArrays(block, dtype)
    if not B.uniform or not cfg.fused:
        return None
    d = B.n_dims
    nF = cfg.n_fields
    if cfg.equation == 0 and nF != (d + 3 if cfg.rans else d + 2):
        return None
    if cfg.rans and cfg.riemann_solve_type == riemann.HLLC:
        return None          # HLLC star states carry no SA field (slot path)
    if cfg.over_int and block.jginv_over is None:
        return None
    T = SoaTables(block, nF)
    if not T.ok:
        return None
    S = BlockArraysSoa(block, B, T, dtype)
    E, U, Pf = B.n_eles, B.n_upts, B.n_fpts
    Fi, nfp, nf = T.Fi, T.nfp, T.nf
    Fb = T.Fb
    has_bdy = Fb > 0
    prec = jax.lax.Precision[cfg.precision.upper()]
    gamma, Pr = cfg.gamma, cfg.prandtl
    visc_kw = dict(gamma=gamma, prandtl=Pr, mu_inf=cfg.mu_inf,
                   rt_inf=cfg.rt_inf, c_sth=cfg.c_sth, fix_vis=cfg.fix_vis,
                   rans=cfg.rans, prandtl_t=cfg.prandtl_t, c_v1=cfg.c_v1,
                   omega=cfg.omega)
    # LES model dispatch (ref:src/eles.cpp:2437-2461): eddy-viscosity part
    # for Smagorinsky/WALE/WALE-similarity, Leonard part for (WALE-)
    # similarity; SVV (model 3) filters the state per step in solver.py
    use_eddy = cfg.les and cfg.sgs_model in (0, 1, 2) and cfg.viscous
    use_similarity = cfg.les and cfg.sgs_model in (2, 4) and cfg.viscous
    sgs_kw = dict(sgs_model=cfg.sgs_model, C_s=cfg.C_s, gamma=gamma,
                  prandtl_t=cfg.prandtl_t, kappa=cfg.kappa)
    if use_similarity:
        from ..ops.les_filter import build_les_filter
        les_filter = jnp.asarray(
            build_les_filter(block.ops, cfg.filter_type, cfg.filter_ratio),
            dtype=dtype)
    has_wm = getattr(bc_fns, "wm_tables", None) is not None
    # tdA in face-row order (nf, 1, nfp, E): value depends on (lf, fpt);
    # broadcasts over the field axis, and over E too on affine uniform
    # meshes (column-compressed like BlockArraysSoa.fgeo)
    _tdA = block.tdA_fpts.reshape(E, nf, nfp).transpose(1, 2, 0)[:, None]
    _ref = _tdA[..., :1]
    if np.all(np.abs(_tdA - _ref) <= 1e-12 * np.abs(_ref).max()):
        _tdA = np.ascontiguousarray(_ref)
    tdA_q = jnp.asarray(_tdA, dtype=dtype)

    def dg(A, x):
        """(K, U') @ (U', F, E) -> (K, F, E)."""
        return jax.lax.dot_general(A, x, (((1,), (0,)), ((), ())),
                                   precision=prec,
                                   preferred_element_type=dtype)

    def dgq(A4, x4):
        """(U, nf, nfp) @ (nf, F, nfp, E) -> (U, F, E): lift GEMM over
        field-major face rows, contracting (lf, fpt) directly."""
        return jax.lax.dot_general(A4, x4, (((1, 2), (0, 2)), ((), ())),
                                   precision=prec,
                                   preferred_element_type=dtype)

    if use_eddy:
        # SGS cutoff = filter_ratio * Deardorff delta (ref:src/eles.cpp:2480)
        filter_delta_u = cfg.filter_ratio * S.delta_u
    if use_similarity:
        dg_filter = lambda x: dg(les_filter, x)
    if has_wm:
        wm_ele_j = jnp.asarray(bc_fns.wm_tables[0], jnp.int32)
        wm_upt_j = jnp.asarray(bc_fns.wm_tables[1], jnp.int32)
        wm_dist_j = jnp.asarray(bc_fns.wm_tables[2], dtype)

    def planes(x):
        """(C, F, E) -> list of F planes (C, E) (squeezed slices)."""
        return [x[:, i] for i in range(nF)]

    # Row disciplines.  Reshape/stack through (nfp, 1, N) intermediates
    # makes XLA tile the whole fused face physics T(1,128) (1/8 sublane
    # occupancy); 125-row gathers on 2-D arrays keep (8,128) tiles.
    # READ side: d2 is a free fpt-major reshape of the opp_0 GEMM output
    # and is gathered with FIELD-major row tables (rows_fm_*), so the
    # gather result's row blocks are the planes directly.  WRITE side:
    # everything scattered back to elements (LDG delta, common normal
    # flux) stays FIELD-major — plane concats are block copies, and the
    # lift GEMMs contract the (lf, fpt) face rows directly (dgq) — so no
    # fpt-major deinterleave exists anywhere.
    def gather_fm(src2, which, tab="rows_fm_"):
        """Per group: field-major static row gather + minor element
        gather, concatenated along faces -> F planes (nfp, Fi).  The
        element gather is skipped when the group's elements are already
        in order (true for half the groups on a structured box).
        tab="rows_fq_" reads a FIELD-major (F*Pf, E) source instead."""
        def one(g):
            rows = src2[g[tab + which]]
            return rows if g["idx_" + which + "_id"] \
                else _sliced(rows, g["idx_" + which],
                             g["idx_" + which + "_segs"])
        cat = jnp.concatenate([one(g) for g in S.groups], axis=1)
        return [cat[i * nfp:(i + 1) * nfp] for i in range(nF)]

    def common_inv_flux_p(u_l, u_r, norm):
        if cfg.equation == 0:
            if cfg.riemann_solve_type == riemann.RUSANOV:
                return rusanov_p(u_l, u_r, norm, gamma, d)
            if cfg.riemann_solve_type == riemann.HLLC:
                return hllc_p(u_l, u_r, norm, gamma, d)
            if cfg.riemann_solve_type == riemann.ROEM:
                return roem_p(u_l, u_r, norm, gamma, d)
            raise ValueError(
                f"riemann_solve_type {cfg.riemann_solve_type}")
        ws = [float(cfg.wave_speed[m]) for m in range(d)]
        return lf_p(u_l, u_r, norm, ws, cfg.lambda_lf)

    def inv_flux_planes(u):
        """Volume inviscid flux planes fl[m] = [F] of (C, E) for any
        (C, F, E) input (upts or over-int cubature points)."""
        if cfg.equation == 1:
            return [[u[:, 0] * cfg.wave_speed[m]] for m in range(d)]
        up = planes(u)
        rho = up[0]
        inv_rho = 1.0 / rho
        v = [up[1 + m] * inv_rho for m in range(d)]
        q2 = sum(vi * vi for vi in v)
        p = (gamma - 1.0) * (up[d + 1] - 0.5 * rho * q2)
        hp = up[d + 1] + p
        out = []
        for mm in range(d):
            rows = [up[1 + mm]]
            for i in range(d):
                r = up[1 + i] * v[mm]
                if i == mm:
                    r = r + p
                rows.append(r)
            rows.append(hp * v[mm])
            for k in range(d + 2, nF):    # SA advection
                rows.append(up[k] * v[mm])
            out.append(rows)
        return out

    def bdy_bridge(fn_aos):
        """(Fb, nfp, F) AoS -> (F*nfp, Fb) FIELD-major rows."""
        return jnp.transpose(fn_aos, (2, 1, 0)).reshape(nF * nfp, Fb)

    def bdy_read3(src3):
        """(Pf, K, E) -> (Fb, nfp, K): per-lf free Pf-slices + minor
        element gathers + one small transpose.  Replaces the per-face
        2-axis fancy gather, which lowers to a ~10 ns/element serial TPU
        gather (u_bl + gradient reads were 68% of the mixed3d stage)."""
        parts = []
        for g in S.bdy_groups:
            sub = src3[g["f0"]:g["f0"] + nfp]
            if g["segs"] is not None:
                if len(g["segs"]) == 1:
                    a, b = g["segs"][0]
                    sub = sub[:, :, a:b]
                else:
                    sub = jnp.concatenate(
                        [sub[:, :, a:b] for a, b in g["segs"]], axis=2)
            else:
                sub = sub[:, :, g["ele"]]
            parts.append(jnp.transpose(sub, (2, 0, 1)))
        out = (jnp.concatenate(parts, axis=0) if len(parts) > 1
               else parts[0])
        return out if S.bdy_perm is None else out[S.bdy_perm]

    def r_copies(rows):
        """Pool r-section: per group, static column slice + static
        field-major row gather into the R element's local fpt order
        (identity for rotation-free pairings, e.g. periodic boxes)."""
        return [rows[:, g["sl"]] if g["r_local_id"]
                else rows[:, g["sl"]][g["rows_rq_local"]] for g in S.groups]

    def scatter_faces(rows_l, rcop, neg_r):
        """Element-face rows (nf*nfp*F, E): the inverse of the face gather.
        Direct path (S.lf_direct): each local face lf is a column slice of
        its (group, side) block, permuted into element order when needed —
        no concatenated pool, no (nf x E) gathers on it
        (ref:src/int_inters.cpp:217-220 writes point-by-point; this is the
        batched inverse).  rcop = r_copies(rows_l); neg_r flips the r-side
        sign (normal fluxes; the LDG common solution keeps +)."""
        blocks = []
        for side, g, perm, segs in S.lf_direct:
            src = rows_l[:, S.groups[g]["sl"]] if side == 0 else \
                (-rcop[g] if neg_r else rcop[g])
            blocks.append(src if perm is None
                          else _sliced(src, perm, segs))
        return jnp.concatenate(blocks, axis=0)

    def residual_soa(u, fluc=None, ramp=None):
        # 1. extrapolate to flux points: one GEMM (ref:src/eles.cpp:1360)
        disu_f = dg(S.opp_0, u)                       # (Pf, F, E)
        # FIELD-major 2-D view: XLA lays the GEMM output out F-major
        # ({2,0,1}), so this transpose+reshape is a free bitcast where the
        # old fpt-major reshape forced a 36 us/stage transpose copy
        d2 = jnp.transpose(disu_f, (1, 0, 2)).reshape(nF * Pf, E)

        # 2. all interior faces at once (concatenated in group order)
        u_l = gather_fm(d2, "l", tab="rows_fq_")      # F planes (nfp, Fi)
        u_r = gather_fm(d2, "r", tab="rows_fq_")
        if has_bdy:
            if S.bdy_groups is not None:
                u_bl = bdy_read3(disu_f)              # (Fb, nfp, F)
            else:  # non-contiguous fpt rows: per-face fancy gather
                u_bl = d2[S.rows_b_fq, S.ele_b[:, None]].reshape(
                    Fb, nfp, nF)

        # 3. viscous gradient path
        if cfg.viscous:
            tg = [dg(S.opp_2_stack[m], u) for m in range(d)]  # (U,F,E)
            sgn = ldg_sign_p(S.norm)
            bcoef = cfg.ldg_beta * sgn
            u_c = [0.5 * (a + b) - bcoef * (a - b)
                   for a, b in zip(u_l, u_r)]
            # per-side delta (common - own) BEFORE the scatter: the rows
            # stay field-major (a free plane concat) and the fpt-major
            # d2 is never re-read
            rows_dl = jnp.concatenate(
                [c - a for c, a in zip(u_c, u_l)], axis=0)  # (F*nfp, Fi)
            rows_dr = jnp.concatenate(
                [c - b for c, b in zip(u_c, u_r)], axis=0)
            if S.lf_direct is not None:
                delta_rows = scatter_faces(rows_dl, r_copies(rows_dr),
                                           neg_r=False)
            else:
                parts = [rows_dl] + r_copies(rows_dr)
                if has_bdy:
                    u_c_b = bc_fns.ldg_solution(u_bl, S.norm_bdy,
                                                fluc=fluc, ramp=ramp)
                    parts.append(bdy_bridge(u_c_b - u_bl))
                pool_uc = jnp.concatenate(parts, axis=1)
                delta_rows = jnp.concatenate(
                    [_sliced(pool_uc, S.sel[lf], S.sel_segs[lf])
                     for lf in range(nf)], axis=0)
            delta = delta_rows.reshape(nf, nF, nfp, E)
            tg = [tg[m] + dgq(S.opp_5q[m], delta) for m in range(d)]
            # physical gradient planes at upts: (1/det) JGinv^T . tg
            gr = [sum(S.jg_u[m][l] * tg[m] for m in range(d)) * S.inv_det_u
                  for l in range(d)]
            # transformed gradient at the faces: ONE extrapolation GEMM
            # over the dim-concatenated planes (one relayout copy instead
            # of d); the interior face stage consumes it element-side
            tg_cat = jnp.concatenate(tg, axis=1)           # (U, d*F, E)
            tgf3 = dg(S.opp_0, tg_cat)                     # (Pf, d*F, E)

        # 4. volume transformed flux (ref:src/eles.cpp:1415-1545).
        # Viscous (+SGS) flux planes at upts first; the inviscid part is
        # evaluated either at upts or, with de-aliasing on, at the richer
        # over-integration cubature and L2-projected back.
        fv = None
        simf = None
        grp = None
        if cfg.viscous:
            if cfg.equation == 1:
                fv = [[-cfg.diff_coeff * gr[m][:, 0]] for m in range(d)]
            else:
                grp = [[gr[l][:, i] for i in range(nF)] for l in range(d)]
                up = planes(u)
                fv = visc_flux_p(up, grp, d, **visc_kw)
                if use_eddy:
                    fvs = sgs_flux_p(up, grp, filter_delta_u, S.wdist_u, d,
                                     **sgs_kw)
                    fv = [[a + b for a, b in zip(fv[m], fvs[m])]
                          for m in range(d)]
                if use_similarity:
                    Lu, Le = similarity_terms_p(up, dg_filter, d)
                    simf = similarity_flux_p(up, Lu, Le, gamma, d)

        def stackj(pl):
            return (jnp.stack(pl, axis=1) if len(pl) > 1
                    else pl[0][:, None, :])

        if cfg.over_int:
            u_over = dg(S.opp_over, u)                 # (C2, F, E)
            flj_o = [stackj(r) for r in inv_flux_planes(u_over)]
            fvj = ([stackj(fv[m]) for m in range(d)]
                   if fv is not None else None)
            parts = []
            for l in range(d):
                t = dg(S.over_filter,
                       sum(S.jg_o[l][m] * flj_o[m] for m in range(d)))
                if fvj is not None:
                    t = t + sum(S.jg_u[l][m] * fvj[m] for m in range(d))
                parts.append(t)
            tdisf = parts                              # d x (U, F, E)
        else:
            fl = inv_flux_planes(u)
            if fv is not None:
                fl = [[a + b for a, b in zip(fl[m], fv[m])]
                      for m in range(d)]
            if simf is not None:
                # similarity flux enters the volume term directly
                # (ref:src/eles.cpp:2395-2461, slot-path parity)
                fl = [[a + b for a, b in zip(fl[m], simf[m])]
                      for m in range(d)]
            flj = [stackj(fl[m]) for m in range(d)]
            tdisf = [sum(S.jg_u[l][m] * flj[m] for m in range(d))
                     for l in range(d)]                # d x (U, F, E)

        # 5. common interface flux, all interior faces at once
        fn = common_inv_flux_p(u_l, u_r, S.norm)
        if cfg.viscous:
            # viscous NORMAL flux evaluated on the ELEMENT side (one
            # scalar plane per field at every fpt, fused into the
            # extrapolation epilogue), then gathered per side — 3x less
            # face-gather traffic than exchanging d gradient planes per
            # side, and the per-side physical-gradient metric work halves
            # (each element fpt is touched once, not once per face side).
            # The r-side enters with a sign flip: n_r = -n_l at a shared
            # face (ref:src/inters.cpp:561-611 evaluates fv per side with
            # the owner's state/gradient, exactly as here).
            tgf_pl = [[tgf3[:, m * nF + i] for i in range(nF)]
                      for m in range(d)]
            g_f = [[sum(S.jg_f[m][l] * tgf_pl[m][i]
                        for m in range(d)) * S.inv_det_f
                    for i in range(nF)] for l in range(d)]
            u_f = planes(disu_f)
            if cfg.equation == 1:
                fv_e = [[-cfg.diff_coeff * g_f[m][0]] for m in range(d)]
            else:
                fv_e = visc_flux_p(u_f, g_f, d, **visc_kw)
                if use_eddy:
                    ee = sgs_flux_p(u_f, g_f,
                                    cfg.filter_ratio * S.delta_f,
                                    S.wdist_f, d, **sgs_kw)
                    fv_e = [[a + b for a, b in zip(fv_e[m], ee[m])]
                            for m in range(d)]
                if use_similarity:
                    # extrapolate the upts similarity flux for all dims
                    # in ONE GEMM (ref:src/eles.cpp:2817)
                    sf_cat = jnp.concatenate(
                        [stackj(simf[m]) for m in range(d)], axis=1)
                    sff3 = dg(S.opp_0, sf_cat)            # (Pf, d*F, E)
                    fv_e = [[a + sff3[:, m * nF + i]
                             for i, a in enumerate(fv_e[m])]
                            for m in range(d)]
            qn = [sum(fv_e[m][i] * S.norm_f[m] for m in range(d))
                  for i in range(nF)]
            # field-major rows: a block concat of the qn planes (no
            # interleave copy); gathered with the rows_fq_* tables
            q2 = jnp.concatenate(qn, axis=0)          # (F*Pf, E)
            qn_l = gather_fm(q2, "l", tab="rows_fq_")
            qn_r = gather_fm(q2, "r", tab="rows_fq_")
            # LDG common viscous flux (ref:src/inters.cpp:561-611)
            bl = 0.5 + cfg.ldg_beta * sgn
            br = 0.5 - cfg.ldg_beta * sgn
            for i in range(nF):
                fn[i] = (fn[i] + bl * qn_l[i] - br * qn_r[i]
                         - cfg.ldg_tau * (u_r[i] - u_l[i]))
        rows_fn = jnp.concatenate(fn, axis=0)         # (F*nfp, Fi)
        if S.lf_direct is not None:
            ntc = (scatter_faces(rows_fn, r_copies(rows_fn), neg_r=True)
                   .reshape(nf, nF, nfp, E) * tdA_q)
            return _finish(u, ntc, tdisf,
                           grp if cfg.rans else None)
        fn_parts = [rows_fn] + [-rc for rc in r_copies(rows_fn)]
        if has_bdy:
            fn_b = bc_fns.inv_common_flux(u_bl, S.norm_bdy, fluc=fluc,
                                          ramp=ramp)
            if cfg.viscous:
                if S.bdy_groups is not None:
                    tgb = jnp.transpose(
                        bdy_read3(tgf3).reshape(Fb, nfp, d, nF),
                        (0, 1, 3, 2))                 # (Fb, nfp, F, d)
                else:
                    t2b = tgf3.reshape(Pf * d * nF, E)
                    tb = [t2b[S.rows_b3[m], S.ele_b[:, None]]
                          .reshape(Fb, nfp, nF) for m in range(d)]
                    tgb = jnp.stack(tb, axis=-1)      # (Fb, nfp, F, d)
                g_b = adjT_apply(S.jginv_bdy, tgb, S.inv_detjac_bdy)
                wm_kw = {}
                if has_wm:
                    # wall-model input state gathered from the SoA volume
                    # solution (ref:src/eles.cpp:4873-4903).  E-axis lane
                    # gather + take_along_axis on the small spt axis: the
                    # scattered u[upt, :, ele] form pushes XLA toward an
                    # F-minor (lane-padded) carry layout
                    sub = u[:, :, wm_ele_j]                    # (U, F, n)
                    wm_val = jnp.take_along_axis(
                        sub, wm_upt_j[None, None, :], axis=0)[0]
                    wm_kw = dict(wm_state=wm_val.T, wm_dist=wm_dist_j)
                fn_b = fn_b + bc_fns.visc_common_flux(
                    u_bl, g_b, S.norm_bdy, None, fluc=fluc, ramp=ramp,
                    **wm_kw)
            fn_parts.append(bdy_bridge(fn_b))
        pool_fn = jnp.concatenate(fn_parts, axis=1)

        # 6. inverse gather + tdA scaling (ref:src/int_inters.cpp:217-220)
        ntc = (jnp.concatenate(
            [_sliced(pool_fn, S.sel[lf], S.sel_segs[lf])
             for lf in range(nf)], axis=0)
            .reshape(nf, nF, nfp, E) * tdA_q)
        return _finish(u, ntc, tdisf, grp if cfg.rans else None)

    def _finish(u, ntc, tdisf, grp):
        # 7. divergence GEMMs (ref:src/eles.cpp:1654-1772); ntc arrives
        # as field-major face rows (nf, F, nfp, E) and is lifted by the
        # multi-dim contraction; tdisf runs split on the plain path,
        # fused on over-int — see the layout note in BlockArraysSoa
        div = dgq(S.opp_corr4, ntc)                      # (U, F, E)
        if cfg.over_int:
            div = div + dg(S.opp_div_cat,
                           jnp.concatenate(tdisf, axis=0))
        else:
            for l in range(d):
                div = div + dg(S.opp_div_parts[l], tdisf[l])
        rhs = -div * S.inv_det_u
        if cfg.rans:
            # SA source (ref:src/eles.cpp:2650, ref:src/source.cpp:33-105)
            src = sa_source_p(
                planes(u), grp, S.wdist_u, d, gamma=gamma,
                mu_inf=cfg.mu_inf, rt_inf=cfg.rt_inf, c_sth=cfg.c_sth,
                fix_vis=cfg.fix_vis, kappa=cfg.kappa, c_v1=cfg.c_v1,
                c_v2=cfg.c_v2, c_v3=cfg.c_v3, c_b1=cfg.c_b1, c_b2=cfg.c_b2,
                c_w2=cfg.c_w2, c_w3=cfg.c_w3, omega=cfg.omega)
            rhs = rhs.at[:, d + 2, :].add(src)
        return rhs

    return residual_soa
