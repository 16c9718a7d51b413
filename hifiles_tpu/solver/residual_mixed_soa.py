"""SoA fast path for mixed-type meshes: per-type (U_t, F, E_t) blocks
sharing per-face-shape pools.

The slot path (multiblock.make_mixed_residual_fn) relayouts through a
global (S, F) flat space: every persistent tensor is elements-major with
F=4..6 minor, which pads 5 -> 128 TPU lanes and costs ~20x vs the
single-type SoA rate (measured 2.2e7 vs 4.5e8 DOF*stage/s, round 3).
Here every type keeps the elements-minor layout of residual_soa.py —
volume stages are per-type large-N GEMMs, and the face exchange
generalizes the face-group machinery across types:

  * interior faces are grouped by (nfp, ct_l, l fpt-row, ct_r, r fpt-row):
    the l rows are gathered from ct_l's (Pf_l*F, E_l) view and the r rows
    from ct_r's — two of the same fast static-row + minor-element gathers,
    just on different sources (the sharded-halo r-side precedent,
    parallel/soa_sharding.py)
  * faces pool by FACE SHAPE (fpt count): one pool per shape, exactly the
    reference's three inters shapes (ref:src/geometry.cpp:566-706); in 2-D
    every face is a segment -> one pool
  * the common flux returns to each type through per-type inverse tables
    sel[ct] (nf_t, E_t) indexing the pools; face rows assemble into a
    field-major (F, Pf_t, E_t) stack, so prisms' mixed tri/quad faces
    concatenate naturally in fpt order and the lift is one dot_general
    contraction over Pf_t (ref:src/int_inters.cpp:67-121 wires the same
    coupling through per-point pointers)
  * viscous faces use the element-side qn discipline: each type exposes
    its F normal-flux planes q2[ct] (F*Pf_t, E_t); cross-type gathers read
    the partner type's q2 (solver/residual_soa.py step 5)

Covers Euler/NS + adv-diff, all Riemann solvers, LES SGS (eddy +
similarity), over-integration, SA-RANS and wall models; shock capture and
SVV run as per-type SoA post/pre stages in MixedSolver.  Falls back to
the slot path (returns None) for RANS+HLLC, pathological meshes (>64 face
groups) or coverage holes.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import riemann
from .elements import MixedMeshTables
from .kernels import adjT_apply
from .residual import ResidualConfig
from .residual_soa import (_segments, hllc_p, ldg_sign_p, lf_p, roem_p,
                           rusanov_p, sa_source_p, sgs_flux_p,
                           similarity_flux_p, similarity_terms_p,
                           visc_flux_p)

_REF_VOL = {0: 2.0, 1: 4.0, 2: 4.0 / 3.0, 3: 4.0, 4: 8.0}


class MixedSoaTables:
    """Host-side gather tables for the mixed SoA face stage."""

    def __init__(self, mt: MixedMeshTables, n_fields: int):
        self.ok = False
        cts = mt.cts
        F = n_fields
        blocks = mt.blocks
        Pf = {ct: blocks[ct].ops.n_fpts for ct in cts}
        E = {ct: blocks[ct].n_eles for ct in cts}
        seg = {}
        off = 0
        for ct in cts:
            seg[ct] = (off, off + E[ct] * Pf[ct])
            off += E[ct] * Pf[ct]
        self.cts, self.F = cts, F

        # face-shape bookkeeping per type: local face -> (fpt offset, nfp)
        fpt_off = {ct: np.concatenate(
            [[0], np.cumsum(blocks[ct].ops.n_fpts_per_face)]) for ct in cts}
        nfp_of = {ct: np.asarray(blocks[ct].ops.n_fpts_per_face,
                                 dtype=np.int64) for ct in cts}

        def decode(s0):
            for ct in cts:
                lo, hi = seg[ct]
                if lo <= s0 < hi:
                    return ct, int((s0 - lo) // Pf[ct]), int(
                        (s0 - lo) % Pf[ct])
            raise AssertionError(s0)

        Fi = mt.int_slot_l.shape[0]
        if Fi == 0:
            return

        # LES cutoff / wall distance per global slot (BlockArrays recipe)
        d = blocks[cts[0]].ops.n_dims
        delta_g, wdist_g = [], []
        for ct in cts:
            b = blocks[ct]
            rv = _REF_VOL[b.ops.ele_type]
            delta_g.append((b.detjac_fpts * rv) ** (1.0 / d)
                           / (b.ops.order + 1))
            wdist_g.append(b.wall_dist_fpts
                           if b.wall_dist_fpts is not None
                           else np.full(b.detjac_fpts.shape[0], 1e10))
        delta_g = np.concatenate(delta_g)
        wdist_g = np.concatenate(wdist_g)

        # ---------------- interior faces: decode + group ----------------
        keys, order = {}, []
        face_info = []
        for i in range(Fi):
            msk = mt.int_mask[i] > 0
            sl = mt.int_slot_l[i][msk]
            sr = mt.int_slot_r[i][msk]
            ct_l, e_l, f0 = decode(sl[0])
            ct_r, e_r, _ = decode(sr[0])
            fl = sl - seg[ct_l][0] - e_l * Pf[ct_l]
            fr = sr - seg[ct_r][0] - e_r * Pf[ct_r]
            # l rows must be contiguous ascending (face-contiguous slots,
            # true by construction of build_mixed_blocks.slots)
            lf_l = int(np.searchsorted(fpt_off[ct_l], fl[0],
                                       side="right")) - 1
            nfp = int(nfp_of[ct_l][lf_l])
            if not np.array_equal(fl, fpt_off[ct_l][lf_l] + np.arange(nfp)):
                return
            lf_r = int(np.searchsorted(fpt_off[ct_r], fr.min(),
                                       side="right")) - 1
            k = (nfp, ct_l, tuple(fl), ct_r, tuple(fr))
            if k not in keys:
                keys[k] = len(keys)
                order.append([])
            order[keys[k]].append(i)
            face_info.append((ct_l, e_l, lf_l, ct_r, e_r, lf_r, sl, sr))
        if len(keys) > 64:
            return

        # ---------------- pools keyed by nfp (face shape) ----------------
        pools = {}

        def pool_of(nfp):
            return pools.setdefault(nfp, dict(groups=[], Fi=0, bfaces=[]))

        # per-type inverse tables
        sel = {ct: -np.ones((blocks[ct].ops.n_faces, E[ct]), dtype=np.int64)
               for ct in cts}

        for k, gi in zip(keys, order):
            nfp, ct_l, fl_t, ct_r, fr_t = k
            gi = np.asarray(gi)
            # sort the group's faces by the l element id: with the
            # signature ordering of mixed_type_selections the group's
            # element gathers then become contiguous slices
            gi = gi[np.argsort([face_info[i][1] for i in gi],
                               kind="stable")]
            Ng = gi.size
            fl = np.asarray(fl_t)
            fr = np.asarray(fr_t)
            r_order = np.argsort(fr)
            P = pool_of(nfp)
            col0 = P["Fi"]
            g = dict(
                ct_l=ct_l, ct_r=ct_r,
                idx_l=np.array([face_info[i][1] for i in gi]),
                idx_r=np.array([face_info[i][4] for i in gi]),
                # field-major entry rows reading the fpt-major d2 views
                rows_fm_l=(fl[None, :] * F
                           + np.arange(F)[:, None]).reshape(-1),
                rows_fm_r=(fr[None, :] * F
                           + np.arange(F)[:, None]).reshape(-1),
                # same rows reading the field-major q2 (F*Pf, E) sources
                rows_fq_l=(np.arange(F)[:, None] * Pf[ct_l]
                           + fl[None, :]).reshape(-1),
                rows_fq_r=(np.arange(F)[:, None] * Pf[ct_r]
                           + fr[None, :]).reshape(-1),
                # field-major r-local perm: pool r-copies must be in the
                # R element's ascending fpt order
                rows_rq_local=(np.arange(F)[:, None] * nfp
                               + r_order[None, :]).reshape(-1),
                sl=slice(col0, col0 + Ng))
            sls = np.stack([face_info[i][6] for i in gi])    # (Ng, nfp)
            g["norm"] = np.transpose(mt.norm_fpts[sls], (1, 2, 0))
            g["delta_l"] = delta_g[sls].T
            g["wdist_l"] = wdist_g[sls].T
            srs = np.stack([face_info[i][7] for i in gi])
            g["delta_r"] = delta_g[srs].T
            g["wdist_r"] = wdist_g[srs].T
            for j, i in enumerate(gi):
                ct_l_, e_l, lf_l, ct_r_, e_r, lf_r = face_info[i][:6]
                sel[ct_l_][lf_l, e_l] = _enc(nfp, col0 + j, 0)
                sel[ct_r_][lf_r, e_r] = _enc(nfp, col0 + j, 1)
            P["Fi"] += Ng
            P["groups"].append(g)

        # ---------------- boundary faces ---------------------------------
        Fb = mt.bdy_bcid.size
        self.Fb = Fb
        nfp_max = mt.bdy_slot.shape[1] if Fb else 1
        bdy_ct = np.zeros(Fb, dtype=np.int64)
        bdy_ele = np.zeros(Fb, dtype=np.int64)
        bdy_lf = np.zeros(Fb, dtype=np.int64)
        for i in range(Fb):
            msk = mt.bdy_mask[i] > 0
            sl = mt.bdy_slot[i][msk]
            ct_b, e_b, _ = decode(sl[0])
            fb = sl - seg[ct_b][0] - e_b * Pf[ct_b]
            lf_b = int(np.searchsorted(fpt_off[ct_b], fb[0],
                                       side="right")) - 1
            nfp = int(nfp_of[ct_b][lf_b])
            if not np.array_equal(fb, fpt_off[ct_b][lf_b] + np.arange(nfp)):
                return
            bdy_ct[i] = ct_b
            bdy_ele[i] = e_b
            bdy_lf[i] = lf_b
            P = pool_of(nfp)
            sel[ct_b][lf_b, e_b] = _enc(nfp, len(P["bfaces"]), 2)
            P["bfaces"].append(i)
        self.bdy_ct, self.bdy_ele = bdy_ct, bdy_ele
        self.nfp_max = nfp_max
        # per-(ct, lf) boundary READ groups: a face's fpt rows are
        # contiguous in Pf (asserted above), so the read side is a free
        # Pf-slice of the (Pf, K, E) GEMM output + one minor element
        # gather.  The per-face 2-axis fancy gather it replaces lowers to
        # a ~10 ns/element serial TPU gather (u_bl + gradient reads were
        # 68% of the mixed3d wall-model-channel stage time, profiled).
        self.bdy_read_groups = []
        cat_order = []
        for ct in cts:
            for lf in range(blocks[ct].ops.n_faces):
                idx = np.where((bdy_ct == ct) & (bdy_lf == lf))[0]
                if not idx.size:
                    continue
                idx = idx[np.argsort(bdy_ele[idx], kind="stable")]
                cat_order.append(idx)
                self.bdy_read_groups.append(dict(
                    ct=ct, f0=int(fpt_off[ct][lf]),
                    nfp=int(nfp_of[ct][lf]), ele=bdy_ele[idx]))
        if Fb:
            catf = np.concatenate(cat_order)
            if np.array_equal(catf, np.arange(Fb)):
                self.bdy_perm = None
            else:
                pos = np.empty(Fb, dtype=np.int64)
                pos[catf] = np.arange(Fb)
                self.bdy_perm = pos

        shapes = sorted(pools.keys())
        self.shapes = shapes
        # resolve encoded sel entries into flat pool columns
        # pool column space: [l-section (Fi) | r-section (Fi) | bdy (Fb_sh)]
        Fi_by_nfp = np.zeros(max(shapes) + 1, dtype=np.int64)
        for sh in shapes:
            Fi_by_nfp[sh] = pools[sh]["Fi"]
        for ct in cts:
            s = sel[ct]
            if (s < 0).any():
                return                         # coverage hole: fall back
            nfp_e, col, side = _dec(s)
            Fi_sh = Fi_by_nfp[nfp_e]
            sel[ct] = np.where(side == 0, col,
                               np.where(side == 1, Fi_sh + col,
                                        2 * Fi_sh + col))
        self.sel = sel
        # shape (pool) index of each (ct, lf)
        self.lf_shape = {
            ct: np.array([shapes.index(int(nfp_of[ct][lf]))
                          for lf in range(blocks[ct].ops.n_faces)])
            for ct in cts}
        self.pools = [pools[sh] for sh in shapes]
        self.ok = True


def _enc(nfp, col, side):
    """Pack (face fpt count, column, side 0=l/1=r/2=bdy) into one int."""
    return (col * 256 + nfp) * 4 + side


def _dec(v):
    side = v % 4
    rest = v // 4
    return rest % 256, rest // 256, side


def make_mixed_residual_soa(mt: MixedMeshTables, cfg: ResidualConfig, dtype,
                            bc_fns=None, wm_tables=None):
    """Build residual(u_tuple) over per-type (U_t, F, E_t) blocks, or None
    when this configuration falls back to the slot path."""
    nF = cfg.n_fields
    cts = mt.cts
    d = mt.blocks[cts[0]].ops.n_dims
    if cfg.equation == 0 and nF != (d + 3 if cfg.rans else d + 2):
        return None
    if cfg.rans and cfg.riemann_solve_type == riemann.HLLC:
        return None
    if cfg.over_int and any(mt.blocks[ct].jginv_over is None for ct in cts):
        return None
    T = MixedSoaTables(mt, nF)
    if not T.ok:
        return None

    prec = jax.lax.Precision[cfg.precision.upper()]
    gamma, Pr = cfg.gamma, cfg.prandtl
    f = lambda a: jnp.asarray(a, dtype=dtype)
    i32 = lambda a: jnp.asarray(a, dtype=jnp.int32)
    visc_kw = dict(gamma=gamma, prandtl=Pr, mu_inf=cfg.mu_inf,
                   rt_inf=cfg.rt_inf, c_sth=cfg.c_sth, fix_vis=cfg.fix_vis,
                   rans=cfg.rans, prandtl_t=cfg.prandtl_t, c_v1=cfg.c_v1,
                   omega=cfg.omega)
    use_eddy = cfg.les and cfg.sgs_model in (0, 1, 2) and cfg.viscous
    use_similarity = cfg.les and cfg.sgs_model in (2, 4) and cfg.viscous
    sgs_kw = dict(sgs_model=cfg.sgs_model, C_s=cfg.C_s, gamma=gamma,
                  prandtl_t=cfg.prandtl_t, kappa=cfg.kappa)
    has_bdy = T.Fb > 0
    Fb, nfp_max = T.Fb, T.nfp_max

    # -------- per-type device constants ------------------------------
    class _TA:
        def __init__(self, ct):
            b = mt.blocks[ct]
            ops = b.ops
            E, U, Pf = b.n_eles, ops.n_upts, ops.n_fpts
            self.E, self.U, self.Pf, self.nf = E, U, Pf, ops.n_faces
            self.opp_0 = f(ops.opp_0)
            self.opp_2 = [f(ops.opp_2[m]) for m in range(d)]
            self.opp_3 = f(ops.opp_3)                         # (U, Pf)
            self.opp_5 = [f(ops.opp_3 * ops.tnorm_fpts[None, :, m])
                          for m in range(d)]
            self.opp_div_parts = [f(ops.opp_div_fused[:, l * U:(l + 1) * U])
                                  for l in range(d)]
            self.opp_div_cat = f(ops.opp_div_fused)
            self.jg_u = [[f(b.jginv_upts[:, :, l, m].T)[:, None, :]
                          for m in range(d)] for l in range(d)]
            self.inv_det_u = f(1.0 / b.detjac_upts.T)[:, None, :]
            rv = _REF_VOL[ops.ele_type]
            self.delta_u = f(((b.detjac_upts * rv) ** (1.0 / d)
                              / (ops.order + 1)).T)
            self.wdist_u = (f(b.wall_dist_upts.T)
                            if b.wall_dist_upts is not None
                            else jnp.full_like(self.delta_u, 1e10))
            jgf = b.jginv_fpts.reshape(E, Pf, d, d)
            self.jg_f = [[f(jgf[:, :, m, l].T) for l in range(d)]
                         for m in range(d)]
            self.inv_det_f = f(1.0 / b.detjac_fpts.reshape(E, Pf).T)
            nrm = b.norm_fpts.reshape(E, Pf, d)
            self.norm_f = [f(nrm[:, :, m].T) for m in range(d)]
            self.delta_f = f(((b.detjac_fpts * rv) ** (1.0 / d)
                              / (ops.order + 1)).reshape(E, Pf).T)
            self.wdist_f = (f(b.wall_dist_fpts.reshape(E, Pf).T)
                            if b.wall_dist_fpts is not None
                            else jnp.full_like(self.delta_f, 1e10))
            self.tdA3 = f(b.tdA_fpts.reshape(E, Pf).T)[None]  # (1, Pf, E)
            if cfg.over_int:
                self.opp_over = f(b.opp_over)
                self.over_filter = f(b.over_filter)
                self.jg_o = [[f(b.jginv_over[:, :, l, m].T)[:, None, :]
                              for m in range(d)] for l in range(d)]
            if use_similarity:
                from ..ops.les_filter import build_les_filter
                self.les_filter = f(build_les_filter(
                    ops, cfg.filter_type, cfg.filter_ratio))
            # per-type inverse tables: the shape (pool) of each local face
            # is static; sel columns index that pool
            self.sel = i32(T.sel[ct])
            # per-lf consecutive-run decomposition of the pool columns:
            # few runs -> slices + concat beat one lane gather (the group
            # face sort by l element keeps runs long)
            self.sel_segs = []
            for lf in range(T.sel[ct].shape[0]):
                row = T.sel[ct][lf]
                cuts = np.where(np.diff(row) != 1)[0] + 1
                # size-scaled cap (mean run >= 128 lanes): short fragmented
                # rows ride the pool's shared permutation, but long rows
                # with a few dozen long runs (tet lf1: 19 runs / 24576,
                # prism quad ends: 17-27 runs / 8192 on the wm channel)
                # are pure slices — moving them OUT of the perm shrank the
                # tri-pool permutation 114688 -> 81920 columns and the
                # quad-pool one 3x (round-5 profile, PERF.md)
                cap = int(os.environ.get("HIFILES_INV_RUN_CAP", "0")) or \
                    max(16, row.size // 128)
                if cuts.size + 1 > cap or row.size == 0:
                    self.sel_segs.append(None)
                    continue
                st = np.concatenate([[0], cuts])
                en = np.concatenate([cuts, [row.size]])
                self.sel_segs.append(
                    [(int(row[a]), int(row[a]) + int(b - a))
                     for a, b in zip(st, en)])
            self.lf_shape = T.lf_shape[ct]
            self.nfp_lf = np.asarray(ops.n_fpts_per_face, dtype=np.int64)

    TA = {ct: _TA(ct) for ct in cts}

    # -------- pool-level device tables --------------------------------
    pools = []
    for sh_i, sh in enumerate(T.shapes):
        P = T.pools[sh_i]
        groups = []

        def _rng(idx):
            # decompose the element gather into consecutive runs: each
            # run is a free slice, and a handful of slices + concat beats
            # one lane gather (mixed_type_selections orders elements to
            # maximize run length).  None -> keep the general gather.
            idx = np.asarray(idx)
            if not idx.size:
                return None
            cuts = np.where(np.diff(idx) != 1)[0] + 1
            if cuts.size + 1 > max(8, idx.size // 32):
                return None
            starts = np.concatenate([[0], cuts])
            ends = np.concatenate([cuts, [idx.size]])
            return [(int(idx[a]), int(idx[a]) + int(b - a))
                    for a, b in zip(starts, ends)]

        for g in P["groups"]:
            groups.append(dict(
                ct_l=g["ct_l"], ct_r=g["ct_r"],
                idx_l=i32(g["idx_l"]), idx_r=i32(g["idx_r"]),
                idx_l_rng=_rng(g["idx_l"]), idx_r_rng=_rng(g["idx_r"]),
                rows_fm_l=i32(g["rows_fm_l"]), rows_fm_r=i32(g["rows_fm_r"]),
                rows_fq_l=i32(g["rows_fq_l"]), rows_fq_r=i32(g["rows_fq_r"]),
                # dedupe keys: groups sharing (ct, fpt rows) — e.g. the
                # same l local face paired against different r faces —
                # reuse ONE full-width row gather (measured 157 MB/stage
                # of duplicate row-gather traffic on the prism/tet wm
                # channel before deduplication)
                k_fm_l=g["rows_fm_l"].tobytes(),
                k_fm_r=g["rows_fm_r"].tobytes(),
                k_fq_l=g["rows_fq_l"].tobytes(),
                k_fq_r=g["rows_fq_r"].tobytes(),
                rows_rq_local=i32(g["rows_rq_local"]), sl=g["sl"]))
        cat = lambda key: np.concatenate(
            [g[key] for g in P["groups"]], -1) if P["groups"] else None
        norm_all = cat("norm")
        pools.append(dict(
            nfp=sh, groups=groups, Fi=P["Fi"],
            bfaces=np.asarray(P["bfaces"], dtype=np.int64),
            norm=[f(norm_all[:, m]) for m in range(d)] if P["groups"]
            else [],
            delta_l=f(cat("delta_l")) if P["groups"] else None,
            delta_r=f(cat("delta_r")) if P["groups"] else None,
            wdist_l=f(cat("wdist_l")) if P["groups"] else None,
            wdist_r=f(cat("wdist_r")) if P["groups"] else None))

    if has_bdy:
        # per-(ct, lf) boundary read groups (slice + minor element gather)
        bdy_read_groups = [dict(ct=g["ct"], f0=g["f0"], nfp=g["nfp"],
                                ele=i32(g["ele"]), segs=_segments(g["ele"]))
                           for g in T.bdy_read_groups]
        bdy_perm_j = None if T.bdy_perm is None else i32(T.bdy_perm)
        norm_bdy = f(mt.norm_fpts[mt.bdy_slot])
        jginv_bdy = f(mt.jginv_fpts[mt.bdy_slot])
        inv_detjac_bdy = f(1.0 / mt.detjac_fpts[mt.bdy_slot])

    has_wm = wm_tables is not None
    if has_wm:
        wm_per_ct, wm_dist_np = wm_tables
        wm_idx = {ct: tuple(i32(x) for x in wm_per_ct[ct]) for ct in cts}
        wm_dist_j = f(wm_dist_np)

    def dg(A, x):
        return jax.lax.dot_general(A, x, (((1,), (0,)), ((), ())),
                                   precision=prec,
                                   preferred_element_type=dtype)

    def dgp(A, x3):
        """(U, Pf) @ (F, Pf, E) -> (U, F, E): lift over field-major face
        rows, contracting Pf (the mixed-shape analog of residual_soa's
        dgq; prisms' tri+quad face segments concatenate along Pf)."""
        return jax.lax.dot_general(A, x3, (((1,), (1,)), ((), ())),
                                   precision=prec,
                                   preferred_element_type=dtype)

    def gather_fm(srcs, pool, which, tab="rows_fm_"):
        """Pool read side: per group, static row gather from the owning
        type's 2-D view + minor element gather -> F planes (nfp, Fi_sh).
        Row gathers are deduplicated across groups sharing (ct, rows)."""
        nfp = pool["nfp"]
        parts = []
        cache = {}
        for g in pool["groups"]:
            ct = g["ct_l"] if which == "l" else g["ct_r"]
            key = (ct, g["k_" + tab[5:7] + "_" + which])
            rows = cache.get(key)
            if rows is None:
                rows = srcs[ct][g[tab + which]]
                cache[key] = rows
            r = g["idx_" + which + "_rng"]
            if r is None:
                parts.append(rows[:, g["idx_" + which]])
            elif len(r) == 1:
                parts.append(rows[:, r[0][0]:r[0][1]])
            else:
                parts.extend(rows[:, a:b] for a, b in r)
        cat = jnp.concatenate(parts, axis=1)
        return [cat[i * nfp:(i + 1) * nfp] for i in range(nF)]

    def r_copies(pool, rows):
        return [rows[:, g["sl"]][g["rows_rq_local"]]
                for g in pool["groups"]]

    def bdy_bridge(fn_aos, pool):
        """Global (Fb, nfp_max, F) AoS -> this pool's (F*nfp, Fb_sh)
        field-major boundary columns."""
        nfp = pool["nfp"]
        faces = pool["bfaces"]
        sel_f = fn_aos[i32(faces)][:, :nfp]
        return jnp.transpose(sel_f, (2, 1, 0)).reshape(nF * nfp,
                                                       faces.size)

    def bdy_read3(srcs, K):
        """Per-type (Pf_t, K, E_t) -> global (Fb, nfp_max, K): per-(ct,lf)
        free Pf-slices + minor element gathers + small transposes; padded
        fpt entries (tri faces in a tri+quad pool) replicate the face's
        fpt 0 — don't-care values, the write side reads only [:nfp]."""
        parts = []
        for g in bdy_read_groups:
            sub = srcs[g["ct"]][g["f0"]:g["f0"] + g["nfp"]]
            if g["segs"] is not None:
                if len(g["segs"]) == 1:
                    a, b = g["segs"][0]
                    sub = sub[:, :, a:b]
                else:
                    sub = jnp.concatenate(
                        [sub[:, :, a:b] for a, b in g["segs"]], axis=2)
            else:
                sub = sub[:, :, g["ele"]]
            a3 = jnp.transpose(sub, (2, 0, 1))        # (Ng, nfp, K)
            if g["nfp"] < nfp_max:
                a3 = jnp.concatenate(
                    [a3, jnp.broadcast_to(
                        a3[:, :1], (a3.shape[0], nfp_max - g["nfp"], K))],
                    axis=1)
            parts.append(a3)
        out = (jnp.concatenate(parts, axis=0) if len(parts) > 1
               else parts[0])
        return out if bdy_perm_j is None else out[bdy_perm_j]

    # Inverse-gather plan: the union of every type's sel rows is an exact
    # PERMUTATION of each pool's columns (every face-side instance appears
    # in exactly one pool column).  Local faces whose sel row decomposes
    # into few consecutive runs read the pool through free slices; the
    # fragmented rest (typically r-side-heavy faces, measured 2k-16k runs
    # on the prism/tet wm channel) merge into ONE lane permutation per
    # pool instead of one full gather per local face.
    asm_plan = []
    for sh_i in range(len(T.shapes)):
        perm_parts, items, off = [], [], 0
        for ct in cts:
            ta = TA[ct]
            for lf in range(ta.nf):
                if int(ta.lf_shape[lf]) != sh_i:
                    continue
                segs = ta.sel_segs[lf]
                if segs is not None:
                    items.append((ct, lf, "slices", segs))
                else:
                    items.append((ct, lf, "perm", off))
                    perm_parts.append(np.asarray(T.sel[ct][lf]))
                    off += ta.E
        asm_plan.append(dict(
            perm=(i32(np.concatenate(perm_parts)) if perm_parts else None),
            items=items))

    def assemble_all(pool_rows):
        """Pool columns -> per-type (F, Pf_t, E_t) rows in ascending fpt
        order (the batched inverse of the reference's point-by-point
        writes, ref:src/int_inters.cpp:217-220).  Each lf block
        (F*nfp, E) splits its major axis for free; one concat along the
        fpt axis per type assembles the mixed tri/quad face rows."""
        blks = {ct: [None] * TA[ct].nf for ct in cts}
        for sh_i, plan in enumerate(asm_plan):
            pr = pool_rows[sh_i]
            if not plan["items"]:
                continue
            # a pool with planned face blocks must have produced rows:
            # a None here would surface later as a confusing concatenate/
            # None-multiply failure (or a silently None single-type block)
            assert pr is not None, (
                f"assemble_all: pool {sh_i} produced no rows but its "
                f"plan carries {len(plan['items'])} face blocks")
            rem = (pr[:, plan["perm"]] if plan["perm"] is not None
                   else None)
            nfp = T.shapes[sh_i]
            for ct, lf, kind, arg in plan["items"]:
                E = TA[ct].E
                if kind == "perm":
                    blk = rem[:, arg:arg + E]
                elif len(arg) == 1:
                    blk = pr[:, arg[0][0]:arg[0][1]]
                else:
                    blk = jnp.concatenate(
                        [pr[:, a:b] for a, b in arg], axis=1)
                blks[ct][lf] = blk.reshape(nF, nfp, E)
        return {ct: (jnp.concatenate(blks[ct], axis=1)
                     if len(blks[ct]) > 1 else blks[ct][0])
                for ct in cts}                          # (F, Pf, E)

    def common_inv_flux_p(u_l, u_r, norm):
        if cfg.equation == 0:
            if cfg.riemann_solve_type == riemann.RUSANOV:
                return rusanov_p(u_l, u_r, norm, gamma, d)
            if cfg.riemann_solve_type == riemann.HLLC:
                return hllc_p(u_l, u_r, norm, gamma, d)
            if cfg.riemann_solve_type == riemann.ROEM:
                return roem_p(u_l, u_r, norm, gamma, d)
            raise ValueError(cfg.riemann_solve_type)
        ws = [float(cfg.wave_speed[m]) for m in range(d)]
        return lf_p(u_l, u_r, norm, ws, cfg.lambda_lf)

    def inv_flux_planes(u, up=None):
        if cfg.equation == 1:
            return [[u[:, 0] * cfg.wave_speed[m]] for m in range(d)]
        up = [u[:, i] for i in range(nF)] if up is None else up
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
            for k in range(d + 2, nF):
                rows.append(up[k] * v[mm])
            out.append(rows)
        return out

    def stackj(pl):
        return (jnp.stack(pl, axis=1) if len(pl) > 1
                else pl[0][:, None, :])

    def residual(u_tuple, fluc=None, ramp=None):
        us = dict(zip(cts, u_tuple))
        disu_f = {ct: dg(TA[ct].opp_0, us[ct]) for ct in cts}
        # FIELD-major 2-D views: free bitcasts under the GEMMs' natural
        # F-major layout (fpt-major reshapes forced a transpose copy per
        # type per stage; measured +3% on the single-type path)
        d2 = {ct: jnp.transpose(disu_f[ct], (1, 0, 2))
              .reshape(nF * TA[ct].Pf, TA[ct].E) for ct in cts}

        # face read side per pool
        u_l = [gather_fm(d2, p, "l", tab="rows_fq_") if p["groups"]
               else None for p in pools]
        u_r = [gather_fm(d2, p, "r", tab="rows_fq_") if p["groups"]
               else None for p in pools]
        if has_bdy:
            u_bl = bdy_read3(disu_f, nF)               # (Fb, nfp_max, F)

        # ---- viscous gradient path --------------------------------------
        if cfg.viscous:
            tg = {ct: [dg(TA[ct].opp_2[m], us[ct]) for m in range(d)]
                  for ct in cts}
            sgn = [ldg_sign_p(p["norm"]) if p["groups"] else None
                   for p in pools]
            pool_uc = []
            for pi, p in enumerate(pools):
                if not p["groups"] and not len(p["bfaces"]):
                    pool_uc.append(None)
                    continue
                parts = []
                if p["groups"]:
                    bcoef = cfg.ldg_beta * sgn[pi]
                    u_c = [0.5 * (a + b) - bcoef * (a - b)
                           for a, b in zip(u_l[pi], u_r[pi])]
                    rows_dl = jnp.concatenate(
                        [c - a for c, a in zip(u_c, u_l[pi])], axis=0)
                    rows_dr = jnp.concatenate(
                        [c - b for c, b in zip(u_c, u_r[pi])], axis=0)
                    parts = [rows_dl] + r_copies(p, rows_dr)
                if has_bdy and len(p["bfaces"]):
                    u_c_b = bc_fns.ldg_solution(u_bl, norm_bdy, fluc=fluc,
                                                ramp=ramp)
                    parts.append(bdy_bridge(u_c_b - u_bl, p))
                pool_uc.append(jnp.concatenate(parts, axis=1))
            delta3_all = assemble_all(pool_uc)          # (F, Pf, E)
            for ct in cts:
                ta = TA[ct]
                tg[ct] = [tg[ct][m] + dgp(ta.opp_5[m], delta3_all[ct])
                          for m in range(d)]
            gr = {}
            tgf3 = {}
            for ct in cts:
                ta = TA[ct]
                gr[ct] = [sum(ta.jg_u[m][l] * tg[ct][m] for m in range(d))
                          * ta.inv_det_u for l in range(d)]
                tg_cat = jnp.concatenate(tg[ct], axis=1)
                tgf3[ct] = dg(ta.opp_0, tg_cat)         # (Pf, d*F, E)

        # ---- volume transformed flux ------------------------------------
        fv = {}
        simf = {}
        grp = {}
        tdisf = {}
        for ct in cts:
            ta = TA[ct]
            fv_ct = None
            simf_ct = None
            if cfg.viscous:
                if cfg.equation == 1:
                    fv_ct = [[-cfg.diff_coeff * gr[ct][m][:, 0]]
                             for m in range(d)]
                else:
                    grp[ct] = [[gr[ct][l][:, i] for i in range(nF)]
                               for l in range(d)]
                    up = [us[ct][:, i] for i in range(nF)]
                    fv_ct = visc_flux_p(up, grp[ct], d, **visc_kw)
                    if use_eddy:
                        fvs = sgs_flux_p(up, grp[ct],
                                         cfg.filter_ratio * ta.delta_u,
                                         ta.wdist_u, d, **sgs_kw)
                        fv_ct = [[a + b for a, b in zip(fv_ct[m], fvs[m])]
                                 for m in range(d)]
                    if use_similarity:
                        dg_f = lambda x, ct=ct: dg(TA[ct].les_filter, x)
                        Lu, Le = similarity_terms_p(up, dg_f, d)
                        simf_ct = similarity_flux_p(up, Lu, Le, gamma, d)
            fv[ct] = fv_ct
            simf[ct] = simf_ct

            if cfg.over_int:
                u_over = dg(ta.opp_over, us[ct])
                flj_o = [stackj(r) for r in inv_flux_planes(u_over)]
                fvj = ([stackj(fv_ct[m]) for m in range(d)]
                       if fv_ct is not None else None)
                parts = []
                for l in range(d):
                    t = dg(ta.over_filter,
                           sum(ta.jg_o[l][m] * flj_o[m] for m in range(d)))
                    if fvj is not None:
                        t = t + sum(ta.jg_u[l][m] * fvj[m]
                                    for m in range(d))
                    parts.append(t)
                tdisf[ct] = parts
            else:
                fl = inv_flux_planes(us[ct])
                if fv_ct is not None:
                    fl = [[a + b for a, b in zip(fl[m], fv_ct[m])]
                          for m in range(d)]
                if simf_ct is not None:
                    fl = [[a + b for a, b in zip(fl[m], simf_ct[m])]
                          for m in range(d)]
                flj = [stackj(fl[m]) for m in range(d)]
                tdisf[ct] = [sum(ta.jg_u[l][m] * flj[m] for m in range(d))
                             for l in range(d)]

        # ---- common interface flux per pool ------------------------------
        fn = [common_inv_flux_p(u_l[pi], u_r[pi], p["norm"])
              if p["groups"] else None for pi, p in enumerate(pools)]
        if cfg.viscous:
            # element-side viscous NORMAL flux planes per type
            q2 = {}
            for ct in cts:
                ta = TA[ct]
                tgf_pl = [[tgf3[ct][:, m * nF + i] for i in range(nF)]
                          for m in range(d)]
                g_f = [[sum(ta.jg_f[m][l] * tgf_pl[m][i]
                            for m in range(d)) * ta.inv_det_f
                        for i in range(nF)] for l in range(d)]
                u_f = [disu_f[ct][:, i] for i in range(nF)]
                if cfg.equation == 1:
                    fv_e = [[-cfg.diff_coeff * g_f[m][0]]
                            for m in range(d)]
                else:
                    fv_e = visc_flux_p(u_f, g_f, d, **visc_kw)
                    if use_eddy:
                        ee = sgs_flux_p(u_f, g_f,
                                        cfg.filter_ratio * ta.delta_f,
                                        ta.wdist_f, d, **sgs_kw)
                        fv_e = [[a + b for a, b in zip(fv_e[m], ee[m])]
                                for m in range(d)]
                    if use_similarity:
                        sf_cat = jnp.concatenate(
                            [stackj(simf[ct][m]) for m in range(d)],
                            axis=1)
                        sff3 = dg(ta.opp_0, sf_cat)
                        fv_e = [[a + sff3[:, m * nF + i]
                                 for i, a in enumerate(fv_e[m])]
                                for m in range(d)]
                qn = [sum(fv_e[m][i] * ta.norm_f[m] for m in range(d))
                      for i in range(nF)]
                q2[ct] = jnp.concatenate(qn, axis=0)   # (F*Pf, E)
            for pi, p in enumerate(pools):
                if not p["groups"]:
                    continue
                qn_l = gather_fm(q2, p, "l", tab="rows_fq_")
                qn_r = gather_fm(q2, p, "r", tab="rows_fq_")
                bl = 0.5 + cfg.ldg_beta * sgn[pi]
                br = 0.5 - cfg.ldg_beta * sgn[pi]
                for i in range(nF):
                    fn[pi][i] = (fn[pi][i] + bl * qn_l[i] - br * qn_r[i]
                                 - cfg.ldg_tau * (u_r[pi][i] - u_l[pi][i]))

        if has_bdy:
            fn_b = bc_fns.inv_common_flux(u_bl, norm_bdy, fluc=fluc,
                                          ramp=ramp)
            if cfg.viscous:
                tgb = jnp.transpose(
                    bdy_read3(tgf3, d * nF).reshape(Fb, nfp_max, d, nF),
                    (0, 1, 3, 2))                      # (Fb, nfp, F, d)
                g_b = adjT_apply(jginv_bdy, tgb, inv_detjac_bdy)
                wm_kw = {}
                if has_wm:
                    wm_state = jnp.zeros((Fb, nF), dtype)
                    for ct in cts:
                        fidx, ele, upt = wm_idx[ct]
                        if fidx.size:
                            # gather E (lane axis) first, then pick the
                            # per-face upt via take_along_axis on the small
                            # spt axis: the scattered us[upt, :, ele] form
                            # made XLA lay the whole scan carry out F-minor
                            # (25x lane padding on the wall-adjacent type,
                            # a measured 85 us/stage of relayout copies)
                            sub = us[ct][:, :, ele]            # (U, F, n)
                            val = jnp.take_along_axis(
                                sub, upt[None, None, :], axis=0)[0]
                            wm_state = wm_state.at[fidx].set(val.T)
                    wm_kw = dict(wm_state=wm_state, wm_dist=wm_dist_j)
                fn_b = fn_b + bc_fns.visc_common_flux(
                    u_bl, g_b, norm_bdy, None, fluc=fluc, ramp=ramp,
                    **wm_kw)

        pool_fn = []
        for pi, p in enumerate(pools):
            parts = []
            if p["groups"]:
                rows_fn = jnp.concatenate(fn[pi], axis=0)
                parts = [rows_fn] + [-rc for rc in r_copies(p, rows_fn)]
            if has_bdy and len(p["bfaces"]):
                parts.append(bdy_bridge(fn_b, p))
            pool_fn.append(jnp.concatenate(parts, axis=1)
                           if parts else None)

        # ---- per-type inverse gather + divergence ------------------------
        ntc_all = assemble_all(pool_fn)
        out = []
        for ct in cts:
            ta = TA[ct]
            ntc = ntc_all[ct] * ta.tdA3                 # (F, Pf, E)
            div = dgp(ta.opp_3, ntc)
            if cfg.over_int:
                div = div + dg(ta.opp_div_cat,
                               jnp.concatenate(tdisf[ct], axis=0))
            else:
                for l in range(d):
                    div = div + dg(ta.opp_div_parts[l], tdisf[ct][l])
            rhs = -div * ta.inv_det_u
            if cfg.rans:
                src = sa_source_p(
                    [us[ct][:, i] for i in range(nF)], grp[ct],
                    ta.wdist_u, d, gamma=gamma, mu_inf=cfg.mu_inf,
                    rt_inf=cfg.rt_inf, c_sth=cfg.c_sth,
                    fix_vis=cfg.fix_vis, kappa=cfg.kappa, c_v1=cfg.c_v1,
                    c_v2=cfg.c_v2, c_v3=cfg.c_v3, c_b1=cfg.c_b1,
                    c_b2=cfg.c_b2, c_w2=cfg.c_w2, c_w3=cfg.c_w3,
                    omega=cfg.omega)
                rhs = rhs.at[:, d + 2, :].add(src)
            out.append(rhs)
        return tuple(out)

    return residual
