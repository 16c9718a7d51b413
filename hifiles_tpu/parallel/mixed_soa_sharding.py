"""Sharded SoA residual for MIXED-element-type meshes: the per-type
(U_t, F, E_t) fast path of solver/residual_mixed_soa.py run inside
shard_map, with halo faces riding lax.ppermute.

Combines the two round-4 fast paths:

  * per-type elements-minor blocks + per-face-shape pools with field-major
    rows (solver/residual_mixed_soa.py) — volume stages are per-type
    large-N GEMMs, cross-type faces gather from each type's (Pf_t*F, E_t)
    view;
  * the halo machinery of parallel/soa_sharding.py — sender groups pack
    partner rows from their OWN d2 views in receiver-matched order, one
    buffer per (ring offset, face shape) pair crosses the ICI
    (the send_solution analog, ref:src/mpi_inters.cpp:218-276), and the
    viscous exchange ships the F element-side NORMAL-flux (qn) planes —
    3x less traffic than the reference's d*F gradient exchange
    (ref:src/mpi_inters.cpp:278-338).  Buffers are split per face SHAPE
    because a tri-face row block (nfp_t*F) and a quad-face block (nfp_q*F)
    cannot share one concat axis — the mixed analog of the reference's
    per-inters-type MPI tags (ref:src/mpi_inters.cpp:249-250).

shard_map requires one program for all shards, so group signatures are
UNIONED across shards and each group's face count is padded to the
per-shard maximum; padding columns gather element 0 of the owning type
(finite), produce garbage fluxes, and are never referenced by the
per-type inverse ``sel`` tables.  Padding-clone elements (unequal shard
sizes) have no faces and a pad-masked rhs.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import riemann
from ..solver.kernels import adjT_apply
from ..solver.residual_soa import (hllc_p, ldg_sign_p, lf_p, roem_p,
                                   rusanov_p, sa_source_p, sgs_flux_p,
                                   similarity_flux_p, similarity_terms_p,
                                   visc_flux_p)

_REF_VOL = {0: 2.0, 1: 4.0, 2: 4.0 / 3.0, 3: 4.0, 4: 8.0}


def build_mixed_soa_shard_tables(cts, ops_by_ct, blocks, owner_ct, sizes_ct,
                                 E_loc, n, nF, offsets, Fb, nfp_max,
                                 ints_rec, bdy_rec, halo_rec, norm_cat,
                                 les=False):
    """Host-side SoA gather tables for the sharded mixed residual.

    Face records (built by ShardedMixedSolver.__init__, type-aware):
      ints_rec[s]: (ct_l, e_l, lf_l, fl, ct_r, e_r, fr_matched, gsl_l)
      bdy_rec[s]:  (ct, e, lf, fl, k_slot, gsl)
      halo_rec[s]: (ct_l, e_l, lf_l, fl_local, o, ct_p, e_p, fp_matched,
                    gsl_local)
    where f* are LOCAL fpt indices within the element (lut-matched on the
    r/partner side) and gsl are global slot ids into ``norm_cat``.

    Returns (meta, tabS, geoS) or None when not expressible."""
    d = norm_cat.shape[1]
    fpt_off = {ct: np.concatenate(
        [[0], np.cumsum(ops_by_ct[ct].n_fpts_per_face)]) for ct in cts}
    nfp_of = {ct: np.asarray(ops_by_ct[ct].n_fpts_per_face, dtype=np.int64)
              for ct in cts}
    nf_ct = {ct: ops_by_ct[ct].n_faces for ct in cts}
    Pf = {ct: ops_by_ct[ct].n_fpts for ct in cts}

    # ---------------- interior groups (unioned across shards) ----------
    int_keys = {}
    int_lists = {}
    for s in range(n):
        for (ct_l, e_l, lf_l, fl, ct_r, e_r, frm, gsl) in ints_rec[s]:
            nfp = fl.size
            if not np.array_equal(fl, fpt_off[ct_l][lf_l] + np.arange(nfp)):
                return None
            lf_r = int(np.searchsorted(fpt_off[ct_r], frm.min(),
                                       side="right")) - 1
            k = (nfp, ct_l, tuple(fl), ct_r, tuple(frm))
            if k not in int_keys:
                int_keys[k] = len(int_keys)
                int_lists[k] = [[] for _ in range(n)]
            int_lists[k][s].append((e_l, e_r, lf_l, lf_r, gsl))
    if len(int_keys) > 64:
        return None

    shapes = sorted({k[0] for k in int_keys}
                    | {rec[3].size for s in range(n) for rec in bdy_rec[s]}
                    | {rec[3].size for s in range(n) for rec in halo_rec[s]})
    if not shapes:
        return None
    shape_of = {sh: i for i, sh in enumerate(shapes)}

    # per-type inverse tables; -1 = uncovered (validated on real elements)
    sel = {ct: -np.ones((n, nf_ct[ct], E_loc[ct]), dtype=np.int64)
           for ct in cts}
    covered = {ct: np.zeros((n, nf_ct[ct], E_loc[ct]), dtype=bool)
               for ct in cts}

    pools = [dict(nfp=sh, int_groups=[], Fi=0, halo_groups=[], Fh=0,
                  bfaces=None, Fb_sh=0) for sh in shapes]

    tabS, geoS = {}, {}
    for k in sorted(int_keys):
        nfp, ct_l, fl_t, ct_r, fr_t = k
        per = int_lists[k]
        Ng = max(len(x) for x in per)
        P = pools[shape_of[nfp]]
        col0 = P["Fi"]
        pi = shape_of[nfp]
        gi = len(P["int_groups"])
        fl = np.asarray(fl_t)
        fr = np.asarray(fr_t)
        r_order = np.argsort(fr)
        idx_l = np.zeros((n, Ng), dtype=np.int64)
        idx_r = np.zeros((n, Ng), dtype=np.int64)
        gnorm = np.zeros((n, nfp, d, Ng))
        gnorm[:, :, 0, :] = 1.0            # safe padding normal
        for s in range(n):
            for j, (e_l, e_r, lf_l, lf_r, gsl) in enumerate(per[s]):
                idx_l[s, j] = e_l
                idx_r[s, j] = e_r
                gnorm[s, :, :, j] = norm_cat[gsl]
                sel[ct_l][s, lf_l, e_l] = col0 + j            # resolved later
                covered[ct_l][s, lf_l, e_l] = True
                sel[ct_r][s, lf_r, e_r] = -(col0 + j) - 2     # r marker
                covered[ct_r][s, lf_r, e_r] = True
        P["int_groups"].append(dict(
            ct_l=ct_l, ct_r=ct_r,
            rows_fm_l=(fl[None, :] * nF
                       + np.arange(nF)[:, None]).reshape(-1),
            rows_fm_r=(fr[None, :] * nF
                       + np.arange(nF)[:, None]).reshape(-1),
            rows_fq_l=(np.arange(nF)[:, None] * Pf[ct_l]
                       + fl[None, :]).reshape(-1),
            rows_fq_r=(np.arange(nF)[:, None] * Pf[ct_r]
                       + fr[None, :]).reshape(-1),
            rows_rq_local=(np.arange(nF)[:, None] * nfp
                           + r_order[None, :]).reshape(-1),
            sl=slice(col0, col0 + Ng)))
        tabS[f"p{pi}i{gi}_l"] = idx_l
        tabS[f"p{pi}i{gi}_r"] = idx_r
        geoS[f"p{pi}i{gi}_norm"] = gnorm
        P["Fi"] += Ng

    # ---------------- boundary --------------------------------------
    # u_bl is assembled in the SLOT bdy-table order (n, Fb, nfp_max, F) so
    # bcP / wall-model tables line up.  Read side: per-(ct, lf) groups —
    # a face's fpt rows are contiguous in Pf (checked below), so each
    # group reads a free Pf-slice of the (Pf, K, El) GEMM output + one
    # minor element gather; a per-shard permutation restores slot order.
    # (The per-face 2-axis fancy gather this replaces lowers to a serial
    # ~10 ns/element TPU gather — 68% of the mixed3d stage, profiled.)
    bdy_cts = sorted({rec[0] for s in range(n) for rec in bdy_rec[s]})
    bdy_read_meta = []
    if bdy_cts:
        pool_bf = [[[] for _ in range(n)] for _ in shapes]
        for s in range(n):
            for (ct, e, lf, fl, k_slot, gsl) in bdy_rec[s]:
                nfp = fl.size
                if not np.array_equal(fl,
                                      fpt_off[ct][lf] + np.arange(nfp)):
                    return None
                pi = shape_of[nfp]
                sel[ct][s, lf, e] = -len(pool_bf[pi][s]) - 2 - 10 ** 9
                covered[ct][s, lf, e] = True
                pool_bf[pi][s].append(k_slot)
        for pi, P in enumerate(pools):
            Fb_sh = max(len(x) for x in pool_bf[pi])
            P["Fb_sh"] = Fb_sh
            bf = np.zeros((n, Fb_sh), dtype=np.int64)
            for s in range(n):
                bf[s, :len(pool_bf[pi][s])] = pool_bf[pi][s]
            tabS[f"p{pi}_bfaces"] = bf
        keys_rg = sorted({(rec[0], rec[2]) for s in range(n)
                          for rec in bdy_rec[s]})
        bdy_perm = np.zeros((n, Fb), dtype=np.int64)
        base = 0
        for gi, (ct, lf) in enumerate(keys_rg):
            per_shard = []
            for s in range(n):
                ek = sorted((rec[1], rec[4]) for rec in bdy_rec[s]
                            if rec[0] == ct and rec[2] == lf)
                per_shard.append(ek)
            Ng = max(len(x) for x in per_shard)
            earr = np.zeros((n, Ng), dtype=np.int64)
            for s, lst in enumerate(per_shard):
                for j, (e, k_slot) in enumerate(lst):
                    earr[s, j] = e
                    bdy_perm[s, k_slot] = base + j
            tabS[f"brg{gi}_e"] = earr
            bdy_read_meta.append((ct, int(fpt_off[ct][lf]),
                                  int(nfp_of[ct][lf]), Ng))
            base += Ng
        tabS["bdy_perm"] = bdy_perm

    # ---------------- halo ------------------------------------------
    # sender groups per (offset, shape, partner pattern); buffers split by
    # face shape so row counts are uniform per concat
    send_pats = {}
    for s in range(n):
        for rec in halo_rec[s]:
            (_ct_l, _e_l, _lf_l, fl, o, ct_p, _e_p, fp, _gsl) = rec
            send_pats.setdefault((o, fl.size), set()).add(
                (ct_p, tuple(fp)))
    send_pats = {k: sorted(v) for k, v in send_pats.items()}
    send_lists = {(o, sh, p): [[] for _ in range(n)]
                  for (o, sh), ps in send_pats.items() for p in ps}
    face_col = [dict() for _ in range(n)]
    for s in range(n):
        for fi, rec in enumerate(halo_rec[s]):
            (_ct_l, _e_l, _lf_l, fl, o, ct_p, e_p, fp, _gsl) = rec
            sh = fl.size
            t = (s - o) % n
            pat = (ct_p, tuple(fp))
            lst = send_lists[(o, sh, pat)][t]
            face_col[s][fi] = (o, sh, pat, len(lst))
            lst.append(int(e_p))
    # column bases: per shape, offsets in canonical order, groups in
    # pattern order; one recv buffer per shape = concat over offsets
    gbase = {}
    W = {}
    for (o, sh), pats in sorted(send_pats.items()):
        base = 0
        for gi, p in enumerate(pats):
            per = send_lists[(o, sh, p)]
            Nmax = max((len(x) for x in per), default=0)
            arr = np.zeros((n, Nmax), dtype=np.int64)
            for t in range(n):
                arr[t, :len(per[t])] = per[t]
            tabS[f"s{o}_{sh}_{gi}"] = arr
            gbase[(o, sh, p)] = base
            base += Nmax
        W[(o, sh)] = base
    off_base = {}
    for sh in shapes:
        cum = 0
        for o in offsets:
            off_base[(o, sh)] = cum
            cum += W.get((o, sh), 0)

    # receiver groups keyed (shape, ct_l, local fpt pattern) — the local
    # pattern may be lut-permuted within one face (the r-shard side)
    recv_keys = {}
    recv_lists = {}
    for s in range(n):
        for fi, rec in enumerate(halo_rec[s]):
            (ct_l, e_l, lf_l, fl, o, ct_p, e_p, fp, gsl) = rec
            k = (fl.size, ct_l, tuple(fl))
            if k not in recv_keys:
                recv_keys[k] = len(recv_keys)
                recv_lists[k] = [[] for _ in range(n)]
            recv_lists[k][s].append((fi, e_l, lf_l, gsl))
    if len(int_keys) + len(recv_keys) > 96:
        return None
    for k in sorted(recv_keys):
        nfp, ct_l, fl_t = k
        fl = np.asarray(fl_t)
        lf_l = int(np.searchsorted(fpt_off[ct_l], fl.min(),
                                   side="right")) - 1
        if np.any((fl < fpt_off[ct_l][lf_l])
                  | (fl >= fpt_off[ct_l][lf_l + 1])):
            return None                      # fpts straddle faces
        per = recv_lists[k]
        Ng = max(len(x) for x in per)
        pi = shape_of[nfp]
        P = pools[pi]
        hoff = P["Fh"]
        gi = len(P["halo_groups"])
        order = np.argsort(fl)
        idx_l = np.zeros((n, Ng), dtype=np.int64)
        col = np.zeros((n, Ng), dtype=np.int64)
        gnorm = np.zeros((n, nfp, d, Ng))
        gnorm[:, :, 0, :] = 1.0
        for s in range(n):
            for j, (fi, e_l, lf_f, gsl) in enumerate(per[s]):
                idx_l[s, j] = e_l
                o, sh, pat, jj = face_col[s][fi]
                col[s, j] = off_base[(o, sh)] + gbase[(o, sh, pat)] + jj
                gnorm[s, :, :, j] = norm_cat[gsl]
                sel[ct_l][s, lf_f, e_l] = -(hoff + j) - 2 - 2 * 10 ** 9
                covered[ct_l][s, lf_f, e_l] = True
        P["halo_groups"].append(dict(
            ct_l=ct_l,
            rows_fm_l=(fl[None, :] * nF
                       + np.arange(nF)[:, None]).reshape(-1),
            rows_fq_l=(np.arange(nF)[:, None] * Pf[ct_l]
                       + fl[None, :]).reshape(-1),
            rows_rq_local=(np.arange(nF)[:, None] * nfp
                           + order[None, :]).reshape(-1),
            sl=slice(hoff, hoff + Ng)))
        tabS[f"p{pi}h{gi}_l"] = idx_l
        tabS[f"p{pi}h{gi}_c"] = col
        geoS[f"p{pi}h{gi}_norm"] = gnorm
        P["Fh"] += Ng

    # resolve sel markers into pool-local columns
    # l: col | r: Fi+col | bdy: 2*Fi + j | halo: 2*Fi + Fb_sh + j
    for ct in cts:
        s_arr = sel[ct]
        for s in range(n):
            if not covered[ct][s, :, :int(sizes_ct[ct][s])].all():
                return None                   # hole on a real element
        lf_pool = np.array([shape_of[int(nfp_of[ct][lf])]
                            for lf in range(nf_ct[ct])])
        Fi_lf = np.array([pools[pi]["Fi"] for pi in lf_pool])[
            :, None, None].transpose(1, 0, 2)
        Fb_lf = np.array([pools[pi]["Fb_sh"] for pi in lf_pool])[
            :, None, None].transpose(1, 0, 2)
        bdy_m = (s_arr <= -2 - 10 ** 9) & (s_arr > -2 - 2 * 10 ** 9)
        halo_m = s_arr <= -2 - 2 * 10 ** 9
        r_m = (s_arr < 0) & ~bdy_m & ~halo_m
        out = np.where(r_m, Fi_lf + (-s_arr - 2), s_arr)
        out = np.where(bdy_m, 2 * Fi_lf + (-(s_arr + 10 ** 9) - 2), out)
        out = np.where(halo_m,
                       2 * Fi_lf + Fb_lf + (-(s_arr + 2 * 10 ** 9) - 2),
                       out)
        out = np.where(covered[ct], out, 0)   # clones: in-bounds dummy
        sel[ct] = out
        tabS[f"sel_{ct}"] = out

    # ---------------- per-type element-side fpt geometry ----------------
    for ct in cts:
        b = blocks[ct]
        E_tot = np.asarray(b.detjac_upts).shape[0]
        El = E_loc[ct]
        owner_flat = owner_ct[ct].reshape(-1)
        Pfc = Pf[ct]
        nrm = np.asarray(b.norm_fpts).reshape(E_tot, Pfc, d)[
            owner_flat].reshape(n, El, Pfc, d)
        geoS[f"normf_{ct}"] = nrm.transpose(0, 3, 2, 1)
        jgf = np.asarray(b.jginv_fpts).reshape(E_tot, Pfc, d, d)[
            owner_flat].reshape(n, El, Pfc, d, d)
        geoS[f"jgf_{ct}"] = jgf.transpose(0, 3, 4, 2, 1)
        detf = np.asarray(b.detjac_fpts).reshape(E_tot, Pfc)[
            owner_flat].reshape(n, El, Pfc)
        geoS[f"invdetf_{ct}"] = (1.0 / detf).transpose(0, 2, 1)
        tda = np.asarray(b.tdA_fpts).reshape(E_tot, Pfc)[
            owner_flat].reshape(n, El, Pfc)
        geoS[f"tdA_{ct}"] = tda.transpose(0, 2, 1)
        if les:
            rv = _REF_VOL[ops_by_ct[ct].ele_type]
            delta = ((np.asarray(b.detjac_fpts) * rv) ** (1.0 / d)
                     / (ops_by_ct[ct].order + 1)).reshape(E_tot, Pfc)
            wd = (np.asarray(b.wall_dist_fpts).reshape(E_tot, Pfc)
                  if getattr(b, "wall_dist_fpts", None) is not None
                  else np.full((E_tot, Pfc), 1e10))
            geoS[f"delta_f_{ct}"] = delta[owner_flat].reshape(
                n, El, Pfc).transpose(0, 2, 1)
            geoS[f"wdist_f_{ct}"] = wd[owner_flat].reshape(
                n, El, Pfc).transpose(0, 2, 1)

    meta = dict(shapes=shapes, offsets=list(offsets),
                pools=pools, bdy_cts=bdy_cts, bdy_read=bdy_read_meta,
                send_pats=send_pats, Fb=Fb, nfp_max=nfp_max)
    return meta, tabS, geoS


def make_mixed_shard_residual_soa(solver, meta):
    """The per-shard mixed SoA residual body (runs inside shard_map).

    State is a tuple of per-type (U_t, F, E_t) blocks; geo/tabs carry this
    shard's rows of the stacked tables (slot entries + the ``msoa_``
    prefixed SoA entries)."""
    cfg = solver.rcfg
    dtype = solver.dtype
    d = solver.n_dims
    nF = solver.n_fields
    cts = solver.cts
    ops_by_ct = solver.ops_by_ct
    blocks = solver.blocks
    axis, n = solver.axis, solver.n_shards
    prec = jax.lax.Precision[cfg.precision.upper()]
    bc_fns = solver.bc_fns
    has_wm = solver.has_wm
    gamma, Pr = cfg.gamma, cfg.prandtl
    shapes = meta["shapes"]
    offsets = meta["offsets"]
    pools = meta["pools"]
    bdy_cts = meta["bdy_cts"]
    Fb, nfp_max = meta["Fb"], meta["nfp_max"]
    has_bdy = bool(bdy_cts)
    Pf = {ct: ops_by_ct[ct].n_fpts for ct in cts}
    U = {ct: ops_by_ct[ct].n_upts for ct in cts}
    nf_ct = {ct: ops_by_ct[ct].n_faces for ct in cts}
    nfp_of = {ct: np.asarray(ops_by_ct[ct].n_fpts_per_face) for ct in cts}
    fpt_off = {ct: np.concatenate(
        [[0], np.cumsum(ops_by_ct[ct].n_fpts_per_face)]) for ct in cts}
    shape_of = {sh: i for i, sh in enumerate(shapes)}
    lf_shape = {ct: [shape_of[int(nfp_of[ct][lf])]
                     for lf in range(nf_ct[ct])] for ct in cts}

    visc_kw = dict(gamma=gamma, prandtl=Pr, mu_inf=cfg.mu_inf,
                   rt_inf=cfg.rt_inf, c_sth=cfg.c_sth, fix_vis=cfg.fix_vis,
                   rans=cfg.rans, prandtl_t=cfg.prandtl_t, c_v1=cfg.c_v1,
                   omega=cfg.omega)
    use_eddy = cfg.les and cfg.sgs_model in (0, 1, 2) and cfg.viscous
    use_similarity = cfg.les and cfg.sgs_model in (2, 4) and cfg.viscous
    sgs_kw = dict(sgs_model=cfg.sgs_model, C_s=cfg.C_s, gamma=gamma,
                  prandtl_t=cfg.prandtl_t, kappa=cfg.kappa)

    f = lambda a: jnp.asarray(a, dtype=dtype)
    i32 = lambda a: jnp.asarray(a, dtype=jnp.int32)

    # per-type operator constants (identical across shards)
    OPP = {}
    for ct in cts:
        ops = ops_by_ct[ct]
        b = blocks[ct]
        o = dict(
            opp_0=f(ops.opp_0),
            opp_2=[f(ops.opp_2[m]) for m in range(d)],
            opp_3=f(ops.opp_3),
            opp_5=[f(ops.opp_3 * ops.tnorm_fpts[None, :, m])
                   for m in range(d)],
            opp_div_parts=[f(ops.opp_div_fused[:, l * U[ct]:
                                               (l + 1) * U[ct]])
                           for l in range(d)],
            opp_div_cat=f(ops.opp_div_fused))
        if cfg.over_int:
            o["opp_over"] = f(b.opp_over)
            o["over_filter"] = f(b.over_filter)
        if use_similarity:
            from ..ops.les_filter import build_les_filter
            o["les_filter"] = f(build_les_filter(
                ops, cfg.filter_type, cfg.filter_ratio))
        OPP[ct] = o

    # static row tables per pool group
    def prep_groups(gs):
        return [dict(g, rows_fm_l=i32(g["rows_fm_l"]),
                     rows_fm_r=i32(g.get("rows_fm_r", [])),
                     rows_fq_l=i32(g["rows_fq_l"]),
                     rows_fq_r=i32(g.get("rows_fq_r", [])),
                     rows_rq_local=i32(g["rows_rq_local"])) for g in gs]

    PJ = [dict(nfp=p["nfp"], Fi=p["Fi"], Fh=p["Fh"], Fb_sh=p["Fb_sh"],
               int_groups=prep_groups(p["int_groups"]),
               halo_groups=prep_groups(p["halo_groups"]))
          for p in pools]
    send_pats = meta["send_pats"]
    send_rows = {}
    send_rows_q = {}
    for (o_, sh), pats in send_pats.items():
        for gi, (ct_p, fp_t) in enumerate(pats):
            fp = np.asarray(fp_t)
            send_rows[(o_, sh, gi)] = (ct_p, i32(
                (fp[None, :] * nF + np.arange(nF)[:, None]).reshape(-1)))
            send_rows_q[(o_, sh, gi)] = (ct_p, i32(
                (np.arange(nF)[:, None] * Pf[ct_p]
                 + fp[None, :]).reshape(-1)))

    def dg(A, x):
        return jax.lax.dot_general(A, x, (((1,), (0,)), ((), ())),
                                   precision=prec,
                                   preferred_element_type=dtype)

    def dgp(A, x3):
        """(U, Pf) @ (F, Pf, E) -> (U, F, E)."""
        return jax.lax.dot_general(A, x3, (((1,), (1,)), ((), ())),
                                   precision=prec,
                                   preferred_element_type=dtype)

    def split_planes(rows2d, nfp):
        return [rows2d[i * nfp:(i + 1) * nfp] for i in range(nF)]

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

    def inv_flux_planes(u):
        if cfg.equation == 1:
            return [[u[:, 0] * cfg.wave_speed[m]] for m in range(d)]
        up = [u[:, i] for i in range(nF)]
        inv_rho = 1.0 / up[0]
        v = [up[1 + m] * inv_rho for m in range(d)]
        q2 = sum(vi * vi for vi in v)
        p = (gamma - 1.0) * (up[d + 1] - 0.5 * up[0] * q2)
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

    def residual(us_tuple, geo, tabs, bcP, ramp=None):
        us = dict(zip(cts, us_tuple))
        tS = {k[5:]: v for k, v in tabs.items() if k.startswith("msoa_")}
        gS = {k[5:]: v for k, v in geo.items() if k.startswith("msoa_")}

        # per-type volume geometry planes (transposes fuse into the GEMMs)
        jg_u, inv_det_u, delta_u, wdist_u, jg_o = {}, {}, {}, {}, {}
        for ct in cts:
            jg_u[ct] = [[jnp.transpose(
                geo[f"jginv_upts_{ct}"][:, :, l, m])[:, None, :]
                for m in range(d)] for l in range(d)]
            inv_det_u[ct] = jnp.transpose(
                1.0 / geo[f"detjac_upts_{ct}"])[:, None, :]
            if use_eddy or cfg.rans:
                delta_u[ct] = jnp.transpose(geo[f"delta_upts_{ct}"])
                wdist_u[ct] = jnp.transpose(geo[f"wdist_upts_{ct}"])
            if cfg.over_int:
                jg_o[ct] = [[jnp.transpose(
                    geo[f"jginv_over_{ct}"][:, :, l, m])[:, None, :]
                    for m in range(d)] for l in range(d)]

        disu_f = {ct: dg(OPP[ct]["opp_0"], us[ct]) for ct in cts}
        # FIELD-major 2-D views: free bitcasts under the GEMMs' natural
        # F-major layout (the single-type twin measured +3%)
        d2 = {ct: jnp.transpose(disu_f[ct], (1, 0, 2))
              .reshape(nF * Pf[ct], us[ct].shape[2]) for ct in cts}

        def gather_fm(srcs, p, pi, which, tab="rows_fm_"):
            nfp = p["nfp"]
            parts = []
            for gi, g in enumerate(p["int_groups"]):
                ct = g["ct_l"] if which == "l" else g["ct_r"]
                rows = srcs[ct][g[tab + which]]
                parts.append(rows[:, tS[f"p{pi}i{gi}_{which}"]])
            cat = jnp.concatenate(parts, axis=1)
            return split_planes(cat, nfp)

        u_l = [gather_fm(d2, p, pi, "l", tab="rows_fq_")
               if p["int_groups"] else None
               for pi, p in enumerate(PJ)]
        u_r = [gather_fm(d2, p, pi, "r", tab="rows_fq_")
               if p["int_groups"] else None
               for pi, p in enumerate(PJ)]
        norm_i = [[jnp.concatenate(
            [gS[f"p{pi}i{gi}_norm"][:, m]
             for gi in range(len(p["int_groups"]))], axis=1)
            for m in range(d)] if p["int_groups"] else None
            for pi, p in enumerate(PJ)]

        # halo: per (offset, shape) send buffers -> ppermute -> per-shape
        # recv concat (ref:src/mpi_inters.cpp:218-276)
        def exchange(srcs, rows_tab):
            recv = {}
            for sh in shapes:
                bufs = []
                for o_ in offsets:
                    pats = send_pats.get((o_, sh))
                    if not pats:
                        continue
                    parts = []
                    for gi in range(len(pats)):
                        ct_p, rows = rows_tab[(o_, sh, gi)]
                        parts.append(
                            srcs[ct_p][rows][:, tS[f"s{o_}_{sh}_{gi}"]])
                    buf = jnp.concatenate(parts, axis=1)
                    perm = [(i, (i + o_) % n) for i in range(n)]
                    bufs.append(jax.lax.ppermute(buf, axis, perm))
                if bufs:
                    recv[sh] = jnp.concatenate(bufs, axis=1)
            return recv

        any_halo = any(p["halo_groups"] for p in PJ)
        recv = exchange(d2, send_rows_q) if any_halo else {}
        u_hl, u_hr, norm_h, hcol = [], [], [], []
        for pi, p in enumerate(PJ):
            if not p["halo_groups"]:
                u_hl.append(None), u_hr.append(None)
                norm_h.append(None), hcol.append(None)
                continue
            nfp = p["nfp"]
            u_hl.append(split_planes(jnp.concatenate(
                [d2[g["ct_l"]][g["rows_fq_l"]][:, tS[f"p{pi}h{gi}_l"]]
                 for gi, g in enumerate(p["halo_groups"])], axis=1), nfp))
            hc = jnp.concatenate(
                [tS[f"p{pi}h{gi}_c"]
                 for gi in range(len(p["halo_groups"]))], axis=0)
            hcol.append(hc)
            u_hr.append(split_planes(recv[nfp][:, hc], nfp))
            norm_h.append([jnp.concatenate(
                [gS[f"p{pi}h{gi}_norm"][:, m]
                 for gi in range(len(p["halo_groups"]))], axis=1)
                for m in range(d)])

        def bdy_read3(srcs, K):
            """Per-type (Pf_t, K, E_t) -> (Fb, nfp_max, K): per-(ct, lf)
            free Pf-slices + minor element gathers (the single-device
            bdy_read3 discipline, solver/residual_mixed_soa.py); padded
            fpt entries replicate the face's fpt 0 (don't-care)."""
            parts = []
            for gi, (ct, f0, nfp, _) in enumerate(meta["bdy_read"]):
                sub = srcs[ct][f0:f0 + nfp][:, :, tS[f"brg{gi}_e"]]
                a3 = jnp.transpose(sub, (2, 0, 1))    # (Ng, nfp, K)
                if nfp < nfp_max:
                    a3 = jnp.concatenate(
                        [a3, jnp.broadcast_to(
                            a3[:, :1],
                            (a3.shape[0], nfp_max - nfp, K))], axis=1)
                parts.append(a3)
            out = (jnp.concatenate(parts, axis=0) if len(parts) > 1
                   else parts[0])
            return out[tS["bdy_perm"]]

        if has_bdy:
            u_bl = bdy_read3(disu_f, nF)               # (Fb, nfp_max, F)
            norm_b = geo["norm"][tabs["bdy"]]

        def bdy_bridge(fn_aos, pi):
            nfp = PJ[pi]["nfp"]
            sel_f = fn_aos[tS[f"p{pi}_bfaces"]][:, :nfp]
            return jnp.transpose(sel_f, (2, 1, 0)).reshape(
                nF * nfp, sel_f.shape[0])

        def r_copies(p, rows):
            return [rows[:, g["sl"]][g["rows_rq_local"]]
                    for g in p["int_groups"]]

        def assemble(ct, pool_rows):
            # each lf block (F*nfp, E) splits its major axis for free; one
            # concat along the fpt axis replaces the old nf*F slices +
            # F concats + stack (the single-device assemble discipline)
            blks = []
            sel_ct = tS[f"sel_{ct}"]
            for lf in range(nf_ct[ct]):
                pi = lf_shape[ct][lf]
                nfp = int(nfp_of[ct][lf])
                blk = pool_rows[pi][:, sel_ct[lf]]
                blks.append(blk.reshape(nF, nfp, -1))
            return (jnp.concatenate(blks, axis=1) if len(blks) > 1
                    else blks[0])

        # ---- viscous gradient path --------------------------------------
        if cfg.viscous:
            tg = {ct: [dg(OPP[ct]["opp_2"][m], us[ct]) for m in range(d)]
                  for ct in cts}
            sgn = [ldg_sign_p(norm_i[pi]) if p["int_groups"] else None
                   for pi, p in enumerate(PJ)]
            sgn_h = [ldg_sign_p(norm_h[pi]) if p["halo_groups"] else None
                     for pi, p in enumerate(PJ)]
            pool_uc = []
            for pi, p in enumerate(PJ):
                parts = []
                if p["int_groups"]:
                    bco = cfg.ldg_beta * sgn[pi]
                    u_c = [0.5 * (a + b) - bco * (a - b)
                           for a, b in zip(u_l[pi], u_r[pi])]
                    rows_dl = jnp.concatenate(
                        [c - a for c, a in zip(u_c, u_l[pi])], axis=0)
                    rows_dr = jnp.concatenate(
                        [c - b for c, b in zip(u_c, u_r[pi])], axis=0)
                    parts = [rows_dl] + r_copies(p, rows_dr)
                if has_bdy and p["Fb_sh"]:
                    u_c_b = bc_fns.ldg_solution(u_bl, norm_b, P=bcP,
                                                ramp=ramp)
                    parts.append(bdy_bridge(u_c_b - u_bl, pi))
                if p["halo_groups"]:
                    bch = cfg.ldg_beta * sgn_h[pi]
                    u_c_h = [0.5 * (a + b) - bch * (a - b)
                             for a, b in zip(u_hl[pi], u_hr[pi])]
                    rows_dh = jnp.concatenate(
                        [c - a for c, a in zip(u_c_h, u_hl[pi])], axis=0)
                    parts.extend(rows_dh[:, g["sl"]][g["rows_rq_local"]]
                                 for g in p["halo_groups"])
                pool_uc.append(jnp.concatenate(parts, axis=1)
                               if parts else None)
            gr, tgf3 = {}, {}
            for ct in cts:
                delta3 = assemble(ct, pool_uc)
                tg[ct] = [tg[ct][m] + dgp(OPP[ct]["opp_5"][m], delta3)
                          for m in range(d)]
                gr[ct] = [sum(jg_u[ct][m][l] * tg[ct][m] for m in range(d))
                          * inv_det_u[ct] for l in range(d)]
                tgf3[ct] = dg(OPP[ct]["opp_0"],
                              jnp.concatenate(tg[ct], axis=1))

        # ---- volume transformed flux ------------------------------------
        fv, simf, grp, tdisf = {}, {}, {}, {}
        for ct in cts:
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
                        fvs = sgs_flux_p(
                            up, grp[ct], cfg.filter_ratio * delta_u[ct],
                            wdist_u[ct], d, **sgs_kw)
                        fv_ct = [[a + b for a, b in zip(fv_ct[m], fvs[m])]
                                 for m in range(d)]
                    if use_similarity:
                        dg_f = lambda x, ct=ct: dg(
                            OPP[ct]["les_filter"], x)
                        Lu, Le = similarity_terms_p(up, dg_f, d)
                        simf_ct = similarity_flux_p(up, Lu, Le, gamma, d)
            fv[ct] = fv_ct
            simf[ct] = simf_ct
            if cfg.over_int:
                u_over = dg(OPP[ct]["opp_over"], us[ct])
                flj_o = [stackj(r) for r in inv_flux_planes(u_over)]
                fvj = ([stackj(fv_ct[m]) for m in range(d)]
                       if fv_ct is not None else None)
                parts = []
                for l in range(d):
                    t = dg(OPP[ct]["over_filter"],
                           sum(jg_o[ct][l][m] * flj_o[m]
                               for m in range(d)))
                    if fvj is not None:
                        t = t + sum(jg_u[ct][l][m] * fvj[m]
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
                tdisf[ct] = [sum(jg_u[ct][l][m] * flj[m]
                                 for m in range(d)) for l in range(d)]

        # ---- common interface flux per pool ------------------------------
        fn = [common_inv_flux_p(u_l[pi], u_r[pi], norm_i[pi])
              if p["int_groups"] else None for pi, p in enumerate(PJ)]
        fn_h = [common_inv_flux_p(u_hl[pi], u_hr[pi], norm_h[pi])
                if p["halo_groups"] else None for pi, p in enumerate(PJ)]
        if cfg.viscous:
            # element-side viscous NORMAL flux planes per type; only the F
            # qn planes cross the ICI for halo faces (the
            # send_corrected_gradient analog, ref:src/mpi_inters.cpp:278-398
            # — similarity's third exchange rides the same planes)
            q2 = {}
            for ct in cts:
                tgf_pl = [[tgf3[ct][:, m * nF + i] for i in range(nF)]
                          for m in range(d)]
                jgf = gS[f"jgf_{ct}"]
                ivf = gS[f"invdetf_{ct}"]
                g_f = [[sum(jgf[m, l] * tgf_pl[m][i] for m in range(d))
                        * ivf for i in range(nF)] for l in range(d)]
                u_f = [disu_f[ct][:, i] for i in range(nF)]
                if cfg.equation == 1:
                    fv_e = [[-cfg.diff_coeff * g_f[m][0]]
                            for m in range(d)]
                else:
                    fv_e = visc_flux_p(u_f, g_f, d, **visc_kw)
                    if use_eddy:
                        ee = sgs_flux_p(
                            u_f, g_f,
                            cfg.filter_ratio * gS[f"delta_f_{ct}"],
                            gS[f"wdist_f_{ct}"], d, **sgs_kw)
                        fv_e = [[a + b for a, b in zip(fv_e[m], ee[m])]
                                for m in range(d)]
                    if use_similarity:
                        sf_cat = jnp.concatenate(
                            [stackj(simf[ct][m]) for m in range(d)],
                            axis=1)
                        sff3 = dg(OPP[ct]["opp_0"], sf_cat)
                        fv_e = [[a + sff3[:, m * nF + i]
                                 for i, a in enumerate(fv_e[m])]
                                for m in range(d)]
                normf = gS[f"normf_{ct}"]
                qn = [sum(fv_e[m][i] * normf[m] for m in range(d))
                      for i in range(nF)]
                q2[ct] = jnp.concatenate(qn, axis=0)
            qrecv = exchange(q2, send_rows_q) if any_halo else {}
            for pi, p in enumerate(PJ):
                if p["int_groups"]:
                    qn_l = gather_fm(q2, p, pi, "l", tab="rows_fq_")
                    qn_r = gather_fm(q2, p, pi, "r", tab="rows_fq_")
                    bl = 0.5 + cfg.ldg_beta * sgn[pi]
                    br = 0.5 - cfg.ldg_beta * sgn[pi]
                    for i in range(nF):
                        fn[pi][i] = (fn[pi][i] + bl * qn_l[i]
                                     - br * qn_r[i]
                                     - cfg.ldg_tau * (u_r[pi][i]
                                                      - u_l[pi][i]))
                if p["halo_groups"]:
                    nfp = p["nfp"]
                    qn_hl = split_planes(jnp.concatenate(
                        [q2[g["ct_l"]][g["rows_fq_l"]]
                         [:, tS[f"p{pi}h{gi}_l"]]
                         for gi, g in enumerate(p["halo_groups"])],
                        axis=1), nfp)
                    # received qn was evaluated with the PARTNER's outward
                    # normal (= -ours): the r-side sign convention
                    qn_hr = split_planes(qrecv[nfp][:, hcol[pi]], nfp)
                    bh_l = 0.5 + cfg.ldg_beta * sgn_h[pi]
                    bh_r = 0.5 - cfg.ldg_beta * sgn_h[pi]
                    for i in range(nF):
                        fn_h[pi][i] = (fn_h[pi][i] + bh_l * qn_hl[i]
                                       - bh_r * qn_hr[i]
                                       - cfg.ldg_tau * (u_hr[pi][i]
                                                        - u_hl[pi][i]))

        if has_bdy:
            fn_b = bc_fns.inv_common_flux(u_bl, norm_b, P=bcP,
                                          ramp=ramp)
            if cfg.viscous:
                tgb = jnp.transpose(
                    bdy_read3(tgf3, d * nF).reshape(Fb, nfp_max, d, nF),
                    (0, 1, 3, 2))                     # (Fb, nfp, F, d)
                g_b = adjT_apply(geo["jginv_f"][tabs["bdy"]], tgb,
                                 geo["inv_detjac_f"][tabs["bdy"]])
                wm_kw = {}
                if has_wm:
                    wm_state = jnp.zeros((Fb, nF), dtype)
                    for i, ct in enumerate(cts):
                        # E-axis lane gather + take_along_axis on the small
                        # spt axis keeps the carry E-minor (see
                        # residual_mixed_soa.py)
                        sub = us[ct][:, :, tabs[f"wm_ele_{i}"]]
                        cand = jnp.take_along_axis(
                            sub, tabs[f"wm_upt_{i}"][None, None, :],
                            axis=0)[0].T
                        wm_state = jnp.where(
                            (tabs["wm_ct"] == i)[:, None], cand, wm_state)
                    wm_kw = dict(wm_state=wm_state,
                                 wm_dist=geo["wm_dist"])
                fn_b = fn_b + bc_fns.visc_common_flux(
                    u_bl, g_b, norm_b, None, P=bcP, ramp=ramp, **wm_kw)

        pool_fn = []
        for pi, p in enumerate(PJ):
            parts = []
            if p["int_groups"]:
                rows_fn = jnp.concatenate(fn[pi], axis=0)
                parts = [rows_fn] + [-rc for rc in r_copies(p, rows_fn)]
            if has_bdy and p["Fb_sh"]:
                parts.append(bdy_bridge(fn_b, pi))
            if p["halo_groups"]:
                rows_fnh = jnp.concatenate(fn_h[pi], axis=0)
                parts.extend(rows_fnh[:, g["sl"]][g["rows_rq_local"]]
                             for g in p["halo_groups"])
            pool_fn.append(jnp.concatenate(parts, axis=1)
                           if parts else None)

        # ---- per-type inverse gather + divergence ------------------------
        out = []
        for ct in cts:
            ntc = assemble(ct, pool_fn) * gS[f"tdA_{ct}"][None]
            div = dgp(OPP[ct]["opp_3"], ntc)
            if cfg.over_int:
                div = div + dg(OPP[ct]["opp_div_cat"],
                               jnp.concatenate(tdisf[ct], axis=0))
            else:
                for l in range(d):
                    div = div + dg(OPP[ct]["opp_div_parts"][l],
                                   tdisf[ct][l])
            rhs = -div * inv_det_u[ct]
            if cfg.rans:
                src = sa_source_p(
                    [us[ct][:, i] for i in range(nF)], grp[ct],
                    wdist_u[ct], d, gamma=gamma, mu_inf=cfg.mu_inf,
                    rt_inf=cfg.rt_inf, c_sth=cfg.c_sth,
                    fix_vis=cfg.fix_vis, kappa=cfg.kappa, c_v1=cfg.c_v1,
                    c_v2=cfg.c_v2, c_v3=cfg.c_v3, c_b1=cfg.c_b1,
                    c_b2=cfg.c_b2, c_w2=cfg.c_w2, c_w3=cfg.c_w3,
                    omega=cfg.omega)
                rhs = rhs.at[:, d + 2, :].add(src)
            # freeze padding clones (zero rhs keeps their finite IC)
            out.append(rhs * geo[f"pad_{ct}"][None, None, :])
        return tuple(out)

    return residual
