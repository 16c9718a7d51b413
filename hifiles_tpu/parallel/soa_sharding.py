"""Sharded SoA residual: the elements-minor (U, F, El) fast path inside
shard_map (see solver/residual_soa.py for the single-device layout
rationale; measured 3.9x there).

Halo faces extend the face-group machinery: a halo face's l-side is
gathered locally like any interior face, while its r-side data arrives by
`lax.ppermute` — the sender gathers the partner rows for its OWN elements
(grouped by the sender-side fpt patterns, so every send is the same two
fast gather forms) and ships one (nfp*F, cols) buffer per ring offset
(the send_solution analog, ref:src/mpi_inters.cpp:218-276).  The viscous
exchange ships the F element-side NORMAL-flux (qn) planes instead of d*F
physical-gradient planes — 3x less ICI traffic than the reference's
send_corrected_gradient (ref:src/mpi_inters.cpp:278-338).  The common
flux at halo faces is evaluated one-sided on each shard, exactly like
the slot path.

shard_map requires one program for all shards, so group signatures are
UNIONED across shards and each group's face count is padded to the
per-shard maximum; padding columns gather element 0 (finite), produce
garbage fluxes, and are never referenced by the inverse `sel` tables.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..solver.residual_soa import (hllc_p, ldg_sign_p, lf_p, roem_p,
                                   rusanov_p, sa_source_p, sgs_flux_p,
                                   similarity_flux_p, similarity_terms_p,
                                   visc_flux_p)

RUSANOV, LAX_FRIEDRICHS, ROEM, HLLC = 0, 1, 2, 3


def build_soa_shard_tables(block, tables, owner_flat, n_shards, El, nF,
                           offsets, sizes=None):
    """Host-side SoA gather tables from the slot-level ShardTables.

    Returns (meta, tabS, geoS) — ``meta`` static python structure closed
    over by the residual; ``tabS``/``geoS`` stacked (n_shards, ...) numpy
    arrays passed through shard_map — or None when the configuration
    isn't expressible (non-uniform fpt counts, non-contiguous l rows,
    too many groups)."""
    ops = block.ops
    Pf = ops.n_fpts
    if not np.all(ops.n_fpts_per_face == ops.n_fpts_per_face[0]):
        return None
    nfp = int(ops.n_fpts_per_face[0])
    nf = ops.n_faces
    n = n_shards
    E = block.n_eles

    # per-shard slot geometry in padded local order (np mirrors of geo)
    d = ops.n_dims
    norm_slot = block.norm_fpts.reshape(E, Pf, d)[owner_flat].reshape(
        n, El * Pf, d)
    jginv_slot = block.jginv_fpts.reshape(E, Pf, d, d)[owner_flat].reshape(
        n, El * Pf, d, d)
    invdet_slot = (1.0 / block.detjac_fpts.reshape(E, Pf))[
        owner_flat].reshape(n, El * Pf)
    tdA_slot = block.tdA_fpts.reshape(E, Pf)[owner_flat].reshape(n, El * Pf)

    def rows_of(fpts):
        """fpt-major rows into the (Pf*F, El) view of (Pf, F, El)."""
        return (np.asarray(fpts)[:, None] * nF
                + np.arange(nF)[None, :]).reshape(-1)

    # ---------------- interior groups -------------------------------
    int_faces = [[] for _ in range(n)]          # (pat, ele_l, ele_r, lf_l, lf_r)
    for s in range(n):
        for k in range(int(tables.n_int_s[s])):
            sl = tables.int_slot_l[s, k]
            sr = tables.int_slot_r[s, k]
            fl, fr = sl % Pf, sr % Pf
            lf_l = fl[0] // nfp
            if not np.array_equal(fl, lf_l * nfp + np.arange(nfp)):
                return None
            int_faces[s].append((tuple(fl), tuple(fr),
                                 int(sl[0] // Pf), int(sr[0] // Pf),
                                 int(lf_l), int(fr[0] // nfp), sl, sr))
    int_pats = sorted({(f[0], f[1]) for faces in int_faces for f in faces})
    if len(int_pats) > 64:
        return None
    # per group: per-shard face lists
    int_by = {p: [[] for _ in range(n)] for p in int_pats}
    for s in range(n):
        for f in int_faces[s]:
            int_by[(f[0], f[1])][s].append(f)
    int_groups = []
    off = 0
    sel = np.zeros((n, nf, El), dtype=np.int64)
    covered = np.zeros((n, nf, El), dtype=bool)
    for p in int_pats:
        per = int_by[p]
        Ng = max(len(x) for x in per)
        fl = np.asarray(p[0])
        fr = np.asarray(p[1])
        r_order = np.argsort(fr)
        idx_l = np.zeros((n, Ng), dtype=np.int64)
        idx_r = np.zeros((n, Ng), dtype=np.int64)
        gnorm = np.zeros((n, nfp, d, Ng))
        gnorm[:, :, 0, :] = 1.0                   # safe padding normal
        for s in range(n):
            for j, f in enumerate(per[s]):
                sl = f[6]
                idx_l[s, j] = f[2]
                idx_r[s, j] = f[3]
                gnorm[s, :, :, j] = norm_slot[s, sl]
                sel[s, f[4], f[2]] = off + j          # l pool col
                covered[s, f[4], f[2]] = True
                sel[s, f[5], f[3]] = -(off + j) - 1   # r col marker (tmp)
                covered[s, f[5], f[3]] = True
        int_groups.append(dict(
            rows_l=rows_of(fl), rows_r=rows_of(fr),
            rows_r_local=(r_order[:, None] * nF
                          + np.arange(nF)[None, :]).reshape(-1),
            idx_l=idx_l, idx_r=idx_r, norm=gnorm,
            sl=slice(off, off + Ng)))
        off += Ng
    Fi_tot = off
    # resolve r markers now that Fi_tot is known
    rmask = sel < 0
    sel[rmask] = Fi_tot + (-sel[rmask] - 1)

    # ---------------- boundary --------------------------------------
    Fb = tables.n_bdy
    bdy_read_meta = None
    bdy_read_tabs = {}
    if Fb:
        fpt_b = tables.bdy_slot % Pf              # (n, Fb, nfp)
        ele_b = tables.bdy_slot[:, :, 0] // Pf
        # field-major rows into the (F*Pf, El) d2/tgf2 views, in the
        # same (fpt, field) result order as the old fpt-major table
        rows_b = (fpt_b[:, :, :, None]
                  + np.arange(nF)[None, None, None, :] * Pf).reshape(
                      n, Fb, nfp * nF)
        norm_b = np.stack([norm_slot[s][tables.bdy_slot[s]]
                           for s in range(n)])
        jginv_b = np.stack([jginv_slot[s][tables.bdy_slot[s]]
                            for s in range(n)])
        invdet_b = np.stack([invdet_slot[s][tables.bdy_slot[s]]
                             for s in range(n)])
        for s in range(n):
            for k in range(int(tables.n_bdy_s[s])):
                lf = int(fpt_b[s, k, 0] // nfp)
                sel[s, lf, ele_b[s, k]] = 2 * Fi_tot + k
                covered[s, lf, ele_b[s, k]] = True
        # per-lf boundary READ groups (the single-device bdy_read3
        # discipline, solver/residual_soa.py): a face's fpt rows are
        # contiguous in Pf, so the read is a free Pf-slice + one minor
        # element gather per lf instead of the per-face 2-axis fancy
        # gather (a serial ~10 ns/element TPU gather).  Groups are
        # uniform across shards (padded with element 0); the perm table
        # restores each shard's global boundary order.
        lf_b = fpt_b[:, :, 0] // nfp
        contig = all(
            np.array_equal(fpt_b[s, k],
                           lf_b[s, k] * nfp + np.arange(nfp))
            for s in range(n) for k in range(int(tables.n_bdy_s[s])))
        if contig:
            lfs_present = sorted({int(lf_b[s, k]) for s in range(n)
                                  for k in range(int(tables.n_bdy_s[s]))})
            perm = np.zeros((n, Fb), dtype=np.int64)
            bdy_read_meta = []
            base = 0
            for gi, lf in enumerate(lfs_present):
                per_shard = []
                for s in range(n):
                    ks = [k for k in range(int(tables.n_bdy_s[s]))
                          if int(lf_b[s, k]) == lf]
                    ks.sort(key=lambda k: ele_b[s, k])
                    per_shard.append(ks)
                Ng = max(len(x) for x in per_shard)
                earr = np.zeros((n, Ng), dtype=np.int64)
                for s, lst in enumerate(per_shard):
                    for j, k in enumerate(lst):
                        earr[s, j] = ele_b[s, k]
                        perm[s, k] = base + j
                bdy_read_tabs[f"b{gi}_e"] = earr
                bdy_read_meta.append((lf * nfp, Ng))
                base += Ng
            bdy_read_tabs["b_perm"] = perm
    else:
        ele_b = np.zeros((n, 0), dtype=np.int64)
        rows_b = np.zeros((n, 0, nfp * nF), dtype=np.int64)
        norm_b = jginv_b = invdet_b = None

    # ---------------- halo ------------------------------------------
    # sender groups per offset (sender fpt pattern); canonical order
    send_pats = {o: set() for o in offsets}
    halo_faces = [[] for _ in range(n)]
    for s in range(n):
        for (sl, o, partner) in (tables.halo_faces_s[s] or []):
            pat_s = tuple(partner % Pf)
            send_pats[o].add(pat_s)
            halo_faces[s].append((sl, o, partner, pat_s))
    send_pats = {o: sorted(v) for o, v in send_pats.items()}
    # assign columns: for offset o, sender t serves receiver s=(t+o)%n;
    # per (o, pat): sender-local face list in receiver order
    send_lists = {(o, p): [[] for _ in range(n)]
                  for o in offsets for p in send_pats[o]}
    face_col = [dict() for _ in range(n)]  # (receiver face idx)->col in o-buf
    for s in range(n):
        t_of = {o: (s - o) % n for o in offsets}
        for fi, (sl, o, partner, pat_s) in enumerate(halo_faces[s]):
            lst = send_lists[(o, pat_s)][t_of[o]]
            face_col[s][fi] = (o, pat_s, len(lst))
            lst.append(int(partner[0] // Pf))
    send_group_meta = {}          # (o) -> list of (pat, base, Nmax)
    send_tab = {}                 # (o, gi) -> (n, Nmax) element ids
    recv_width = {}
    for o in offsets:
        base = 0
        metas = []
        for gi, p in enumerate(send_pats[o]):
            per = send_lists[(o, p)]
            Nmax = max((len(x) for x in per), default=0)
            arr = np.zeros((n, Nmax), dtype=np.int64)
            for t in range(n):
                for j, e in enumerate(per[t]):
                    arr[t, j] = e
            metas.append((p, base, Nmax))
            send_tab[(o, gi)] = arr
            base += Nmax
        send_group_meta[o] = metas
        recv_width[o] = base
    # offset base inside the concatenated recv buffer
    off_base = {}
    cum = 0
    for o in offsets:
        off_base[o] = cum
        cum += recv_width[o]
    H_width = cum

    # receiver groups by l pattern
    recv_pats = sorted({tuple(f[0] % Pf) for faces in halo_faces
                        for f in faces})
    recv_by = {p: [[] for _ in range(n)] for p in recv_pats}
    for s in range(n):
        for fi, f in enumerate(halo_faces[s]):
            recv_by[tuple(f[0] % Pf)][s].append((fi, f))
    halo_groups = []
    hoff = 0
    for p in recv_pats:
        per = recv_by[p]
        Ng = max(len(x) for x in per)
        fl = np.asarray(p)
        lf_l = int(fl[0] // nfp)
        # r-side shards store their halo rows in PARTNER-matched order
        # (the lut permutation); the pool copy must be in the element's
        # ascending fpt order, like the interior r-copies
        if np.any(fl // nfp != lf_l):
            return None
        order = np.argsort(fl)
        rows_local = (order[:, None] * nF
                      + np.arange(nF)[None, :]).reshape(-1)
        idx_l = np.zeros((n, Ng), dtype=np.int64)
        col = np.zeros((n, Ng), dtype=np.int64)
        gnorm = np.zeros((n, nfp, d, Ng))
        gnorm[:, :, 0, :] = 1.0
        for s in range(n):
            for j, (fi, f) in enumerate(per[s]):
                sl = f[0]
                e_l = int(sl[0] // Pf)
                idx_l[s, j] = e_l
                o, pat_s, jj = face_col[s][fi]
                gbase = dict((pp, b) for pp, b, _ in send_group_meta[o])[
                    pat_s]
                col[s, j] = off_base[o] + gbase + jj
                gnorm[s, :, :, j] = norm_slot[s, sl]
                sel[s, lf_l, e_l] = 2 * Fi_tot + Fb + hoff + j
                covered[s, lf_l, e_l] = True
        halo_groups.append(dict(
            rows_l=rows_of(fl), idx_l=idx_l, col=col, norm=gnorm,
            rows_local=rows_local,
            sl=slice(hoff, hoff + Ng)))
        hoff += Ng
    Fh_tot = hoff

    # Uncovered (e, lf) pairs must all belong to padding clones (their sel
    # stays 0 — finite garbage, zeroed by the pad_mask on the rhs).  A hole
    # on a REAL element would silently gather a wrong flux, so verify and
    # fall back to the slot path instead (the single-device SoaTables'
    # `(sel < 0).any()` guard, solver/residual_soa.py).
    if sizes is not None:
        for s in range(n):
            if not covered[s, :, :int(sizes[s])].all():
                return None

    meta = dict(nfp=nfp, nf=nf, Pf=Pf, Fi_tot=Fi_tot, Fb=Fb,
                Fh_tot=Fh_tot, H_width=H_width,
                int_rows=[(g["rows_l"], g["rows_r"], g["rows_r_local"],
                           g["sl"]) for g in int_groups],
                halo_rows=[(g["rows_l"], g["rows_local"], g["sl"])
                           for g in halo_groups],
                send_rows={o: [np.asarray(p) for p, _, _ in
                               send_group_meta[o]] for o in offsets},
                offsets=list(offsets))

    tabS = {}
    geoS = {}
    for gi, g in enumerate(int_groups):
        tabS[f"i{gi}_l"] = g["idx_l"]
        tabS[f"i{gi}_r"] = g["idx_r"]
        geoS[f"i{gi}_norm"] = g["norm"]
    for gi, g in enumerate(halo_groups):
        tabS[f"h{gi}_l"] = g["idx_l"]
        tabS[f"h{gi}_c"] = g["col"]
        geoS[f"h{gi}_norm"] = g["norm"]
    for o in offsets:
        for gi in range(len(send_pats[o])):
            tabS[f"s{o}_{gi}"] = send_tab[(o, gi)]
    tabS["sel"] = sel
    # element-side fpt geometry planes: the viscous NORMAL flux is
    # evaluated once per element fpt (and only the F qn planes cross the
    # ICI), replacing per-side gradient metric tables
    geoS["normf"] = norm_slot.reshape(n, El, Pf, d).transpose(0, 3, 2, 1)
    geoS["jgf"] = jginv_slot.reshape(n, El, Pf, d, d).transpose(
        0, 3, 4, 2, 1)
    geoS["invdetf"] = invdet_slot.reshape(n, El, Pf).transpose(0, 2, 1)
    # LES cutoff length + wall distance planes at element fpts (the
    # element-side SGS face flux, ref:src/eles.cpp:2480-2481)
    ref_vol = {1: 4.0, 4: 8.0, 0: 2.0, 2: 4.0 / 3.0, 3: 4.0}[ops.ele_type]
    delta_slot = ((block.detjac_fpts * ref_vol) ** (1.0 / d)
                  / (ops.order + 1)).reshape(E, Pf)
    wdist_slot = (block.wall_dist_fpts.reshape(E, Pf)
                  if getattr(block, "wall_dist_fpts", None) is not None
                  else np.full((E, Pf), 1e10))
    geoS["delta_f"] = delta_slot[owner_flat].reshape(n, El, Pf).transpose(
        0, 2, 1)
    geoS["wdist_f"] = wdist_slot[owner_flat].reshape(n, El, Pf).transpose(
        0, 2, 1)
    if Fb:
        tabS["rows_b"] = rows_b
        tabS["ele_b"] = ele_b
        tabS.update(bdy_read_tabs)
        meta["bdy_read"] = bdy_read_meta
        geoS["norm_b"] = norm_b
        geoS["jginv_b"] = jginv_b
        geoS["invdet_b"] = invdet_b
    geoS["tdA"] = tdA_slot.reshape(n, El, Pf)
    return meta, tabS, geoS


def make_shard_residual_soa(solver, meta):
    """The per-shard SoA residual body (runs inside shard_map).

    solver: the ShardedSolver (for cfg/opp/axis/offsets/bc_fns).
    State u is (U, F, El); returns rhs (U, F, El)."""
    cfg = solver.rcfg
    dtype = solver.dtype
    d = solver.base.ops.n_dims
    U = solver.base.ops.n_upts
    El = solver.El
    nF = solver.n_fields
    axis = solver.axis
    n = solver.n_shards
    prec = jax.lax.Precision[cfg.precision.upper()]
    opp = solver.opp
    bc_fns = solver.bc_fns
    nfp, nf, Pf = meta["nfp"], meta["nf"], meta["Pf"]
    Fi_tot, Fb, Fh = meta["Fi_tot"], meta["Fb"], meta["Fh_tot"]
    offsets = meta["offsets"]
    gamma, Pr = cfg.gamma, cfg.prandtl
    visc_kw = dict(gamma=gamma, prandtl=Pr, mu_inf=cfg.mu_inf,
                   rt_inf=cfg.rt_inf, c_sth=cfg.c_sth, fix_vis=cfg.fix_vis,
                   rans=cfg.rans, prandtl_t=cfg.prandtl_t, c_v1=cfg.c_v1,
                   omega=cfg.omega)
    # feature physics (round-4: the sharded twin of the single-device SoA
    # coverage, solver/residual_soa.py).  The similarity face flux enters
    # the element-side qn planes, so the reference's THIRD halo exchange
    # (send_sgsf_fpts, ref:src/mpi_inters.cpp:339-398) collapses into the
    # qn ppermute — no extra ICI traffic.
    use_eddy = cfg.les and cfg.sgs_model in (0, 1, 2) and cfg.viscous
    use_similarity = cfg.les and cfg.sgs_model in (2, 4) and cfg.viscous
    sgs_kw = dict(sgs_model=cfg.sgs_model, C_s=cfg.C_s, gamma=gamma,
                  prandtl_t=cfg.prandtl_t, kappa=cfg.kappa)
    if use_similarity:
        from ..ops.les_filter import build_les_filter
        les_filter = jnp.asarray(
            build_les_filter(solver.base.ops, cfg.filter_type,
                             cfg.filter_ratio), dtype=dtype)
    has_wm = getattr(solver, "has_wm", False)
    nG = len(meta["int_rows"])
    nH = len(meta["halo_rows"])

    # Static row tables as jnp constants, following the single-device
    # row disciplines (solver/residual_soa.py): READ gathers use tables
    # in FIELD-major entry order (the gather result's row blocks ARE the
    # field planes — no interleave gather); sources are either the
    # fpt-major d2 view (a free reshape of the opp_0 GEMM output) or the
    # field-major q2 plane concat (``_fq`` value-transformed tables).
    # WRITE-side rows (pool parts) stay field-major throughout and the
    # lift GEMMs contract the (lf, fpt) face rows directly (dgq).
    _il_np = (np.arange(nfp * nF).reshape(nfp, nF).T).reshape(-1)

    def _fqv(t):
        """fpt-major (Pf*F) row values -> field-major (F*Pf) source."""
        return (t % nF) * Pf + t // nF

    def _rl_fq(rl):
        """r-local row permutation, fpt-major -> field-major rows."""
        order = np.asarray(rl).reshape(-1, nF)[:, 0] // nF
        return (np.arange(nF)[:, None] * nfp + order[None, :]).reshape(-1)

    i32c = lambda a: jnp.asarray(a, jnp.int32)
    int_rows = [(i32c(np.asarray(a)[_il_np]), i32c(np.asarray(b)[_il_np]),
                 i32c(_fqv(np.asarray(a))[_il_np]),
                 i32c(_fqv(np.asarray(b))[_il_np]),
                 i32c(_rl_fq(c)), sl)
                for a, b, c, sl in meta["int_rows"]]
    halo_rows = [(i32c(np.asarray(a)[_il_np]),
                  i32c(_fqv(np.asarray(a))[_il_np]),
                  i32c(_rl_fq(rl)), sl)
                 for a, rl, sl in meta["halo_rows"]]
    # send tables: field-major entry order; _q variant reads q2
    send_rows = {
        o: [i32c((np.asarray(p)[None, :] * nF
                  + np.arange(nF)[:, None]).reshape(-1))
            for p in meta["send_rows"][o]] for o in offsets}
    send_rows_q = {
        o: [i32c((np.arange(nF)[:, None] * Pf
                  + np.asarray(p)[None, :]).reshape(-1))
            for p in meta["send_rows"][o]] for o in offsets}

    def split_planes(rows2d):
        return [rows2d[i * nfp:(i + 1) * nfp] for i in range(nF)]

    def dg(A, x):
        return jax.lax.dot_general(A, x, (((1,), (0,)), ((), ())),
                                   precision=prec,
                                   preferred_element_type=dtype)

    def dgq(A4, x4):
        """(U, nf, nfp) @ (nf, F, nfp, El) -> (U, F, El)."""
        return jax.lax.dot_general(A4, x4, (((1, 2), (0, 2)), ((), ())),
                                   precision=prec,
                                   preferred_element_type=dtype)

    # lift operators in face-row form; tdisf divergence split per dim
    # (the single-device split-div layout, solver/residual_soa.py)
    opp_corr4 = jnp.reshape(opp["opp_div_all"][:, d * U:], (U, nf, nfp))
    opp_div_parts = [opp["opp_div_all"][:, l * U:(l + 1) * U]
                     for l in range(d)]
    opp_5q = ([jnp.reshape(opp["opp_5_stack"][m], (U, nf, nfp))
               for m in range(d)] if cfg.viscous else None)

    def common_inv_flux_p(u_l, u_r, norm):
        if cfg.equation == 0:
            if cfg.riemann_solve_type == RUSANOV:
                return rusanov_p(u_l, u_r, norm, gamma, d)
            if cfg.riemann_solve_type == HLLC:
                return hllc_p(u_l, u_r, norm, gamma, d)
            if cfg.riemann_solve_type == ROEM:
                return roem_p(u_l, u_r, norm, gamma, d)
            raise ValueError(cfg.riemann_solve_type)
        ws = [float(cfg.wave_speed[m]) for m in range(d)]
        return lf_p(u_l, u_r, norm, ws, cfg.lambda_lf)

    def visc_faces(u_p, g_p, delta_f=None, wdist_f=None):
        if cfg.equation == 1:
            return [[-cfg.diff_coeff * g_p[m][0]] for m in range(d)]
        fv = visc_flux_p(u_p, g_p, d, **visc_kw)
        if use_eddy:
            ee = sgs_flux_p(u_p, g_p, cfg.filter_ratio * delta_f, wdist_f,
                            d, **sgs_kw)
            fv = [[a + b for a, b in zip(fv[m], ee[m])] for m in range(d)]
        return fv

    def exchange(bufs):
        """bufs: {offset: (rows, cols)} -> concat of ppermute'd recvs."""
        recvs = []
        for o in offsets:
            perm = [(i, (i + o) % n) for i in range(n)]
            recvs.append(jax.lax.ppermute(bufs[o], axis, perm))
        return jnp.concatenate(recvs, axis=1) if recvs else None

    def residual(u, geo, geoS, tabS, bcP, ramp=None, fluc=None):
        """u (U, F, El); geo: the solver's slot geo (for jg_u/detjac/pad);
        geoS/tabS: this shard's SoA rows."""
        jg_u = [[jnp.transpose(geo["jginv_upts"][:, :, l, m])[:, None, :]
                 for m in range(d)] for l in range(d)]
        inv_det_u = jnp.transpose(1.0 / geo["detjac_upts"])[:, None, :]
        if use_eddy or cfg.rans:
            delta_u = jnp.transpose(geo["delta_upts"])       # (U, El)
            wdist_u = jnp.transpose(geo["wdist_upts"])
        if cfg.over_int:
            jg_o = [[jnp.transpose(geo["jginv_over"][:, :, l, m])
                     [:, None, :] for m in range(d)] for l in range(d)]

        disu_f = dg(opp["opp_0"], u)              # (Pf, F, El)
        # FIELD-major 2-D view: free bitcast under the GEMM's natural
        # F-major layout (the fpt-major reshape forced a transpose copy
        # per stage; measured +3% on the single-device twin)
        d2 = jnp.transpose(disu_f, (1, 0, 2)).reshape(nF * Pf, El)

        def gsl(src2, rows, idx):
            return src2[rows][:, idx]

        # interior faces, concatenated in pool l order (field-major rows:
        # the row blocks are the F planes directly)
        u_l = split_planes(jnp.concatenate(
            [gsl(d2, r[2], tabS[f"i{gi}_l"])
             for gi, r in enumerate(int_rows)], axis=1))
        u_r = split_planes(jnp.concatenate(
            [gsl(d2, r[3], tabS[f"i{gi}_r"])
             for gi, r in enumerate(int_rows)], axis=1))
        norm_i = [jnp.concatenate(
            [geoS[f"i{gi}_norm"][:, m] for gi in range(nG)], axis=1)
            for m in range(d)]

        # halo: send buffers, exchange, receiver-side gathers
        # (ref:src/mpi_inters.cpp:218-276 send/receive_solution)
        send_bufs = {o: jnp.concatenate(
            [gsl(d2, send_rows_q[o][gi], tabS[f"s{o}_{gi}"])
             for gi in range(len(send_rows[o]))], axis=1)
            for o in offsets} if offsets else {}
        recv = exchange(send_bufs) if offsets else None
        if nH:
            u_hl = split_planes(jnp.concatenate(
                [gsl(d2, halo_rows[gi][1], tabS[f"h{gi}_l"])
                 for gi in range(nH)], axis=1))
            hcol = jnp.concatenate(
                [tabS[f"h{gi}_c"] for gi in range(nH)], axis=0)
            u_hr = split_planes(recv[:, hcol])
            norm_h = [jnp.concatenate(
                [geoS[f"h{gi}_norm"][:, m] for gi in range(nH)], axis=1)
                for m in range(d)]
        def bdy_read3(src3, tabS):
            """(Pf, K, El) -> (Fb, nfp, K): per-lf free Pf-slices + minor
            element gathers (the single-device bdy_read3 discipline)."""
            parts = []
            for gi, (f0, _) in enumerate(meta["bdy_read"]):
                sub = src3[f0:f0 + nfp][:, :, tabS[f"b{gi}_e"]]
                parts.append(jnp.transpose(sub, (2, 0, 1)))
            out = (jnp.concatenate(parts, axis=0) if len(parts) > 1
                   else parts[0])
            return out[tabS["b_perm"]]

        if Fb:
            if meta.get("bdy_read") is not None:
                u_bl = bdy_read3(disu_f, tabS)        # (Fb, nfp, F)
            else:  # non-contiguous fpt rows: per-face fancy gather
                u_bl = d2[tabS["rows_b"], tabS["ele_b"][:, None]].reshape(
                    Fb, nfp, nF)

        # viscous gradient path: per-side LDG deltas scattered
        # field-major, lifted with the (lf, fpt) contraction (the
        # single-device write-side discipline)
        if cfg.viscous:
            tg = [dg(opp["opp_2_stack"][m], u) for m in range(d)]
            sgn_i = ldg_sign_p(norm_i)
            bco = cfg.ldg_beta * sgn_i
            u_c = [0.5 * (a + b) - bco * (a - b) for a, b in zip(u_l, u_r)]
            rows_dl = jnp.concatenate(
                [c - a for c, a in zip(u_c, u_l)], axis=0)
            rows_dr = jnp.concatenate(
                [c - b for c, b in zip(u_c, u_r)], axis=0)
            parts = [rows_dl]
            for gi, r in enumerate(int_rows):
                parts.append(rows_dr[:, r[5]][r[4]])
            if Fb:
                u_c_b = bc_fns.ldg_solution(u_bl, geoS["norm_b"], P=bcP,
                                            ramp=ramp, fluc=fluc)
                parts.append(jnp.transpose(u_c_b - u_bl, (2, 1, 0))
                             .reshape(nF * nfp, Fb))
            if nH:
                sgn_h = ldg_sign_p(norm_h)
                bch = cfg.ldg_beta * sgn_h
                u_c_h = [0.5 * (a + b) - bch * (a - b)
                         for a, b in zip(u_hl, u_hr)]
                rows_dh = jnp.concatenate(
                    [c - a for c, a in zip(u_c_h, u_hl)], axis=0)
                # reorder each group's columns to element-ascending rows
                parts.extend(rows_dh[:, hr[3]][hr[2]] for hr in halo_rows)
            pool_uc = jnp.concatenate(parts, axis=1)
            delta = jnp.concatenate(
                [pool_uc[:, tabS["sel"][lf]] for lf in range(nf)],
                axis=0).reshape(nf, nF, nfp, El)
            tg = [tg[m] + dgq(opp_5q[m], delta) for m in range(d)]
            gr = [sum(jg_u[m][l] * tg[m] for m in range(d)) * inv_det_u
                  for l in range(d)]
            # transformed gradient at the faces: ONE extrapolation GEMM
            # over the dim-concatenated planes
            tg_cat = jnp.concatenate(tg, axis=1)       # (U, d*F, El)
            tgf3 = dg(opp["opp_0"], tg_cat)            # (Pf, d*F, El)
            # field-major per-dim views (free under the F-major layout)
            tgf2 = [jnp.transpose(tgf3[:, m * nF:(m + 1) * nF], (1, 0, 2))
                    .reshape(nF * Pf, El) for m in range(d)]

        # volume flux (the single-device SoA stage 4, residual_soa.py)
        def inv_flux_planes(x):
            if cfg.equation == 1:
                return [[x[:, 0] * cfg.wave_speed[m]] for m in range(d)]
            xp = [x[:, i] for i in range(nF)]
            inv_rho = 1.0 / xp[0]
            v = [xp[1 + m] * inv_rho for m in range(d)]
            q2v = sum(vi * vi for vi in v)
            pp = (gamma - 1.0) * (xp[d + 1] - 0.5 * xp[0] * q2v)
            hp = xp[d + 1] + pp
            out = []
            for mm in range(d):
                rows = [xp[1 + mm]]
                for i in range(d):
                    r_ = xp[1 + i] * v[mm]
                    if i == mm:
                        r_ = r_ + pp
                    rows.append(r_)
                rows.append(hp * v[mm])
                for k in range(d + 2, nF):   # SA advection
                    rows.append(xp[k] * v[mm])
                out.append(rows)
            return out

        def stackj(pl):
            return (jnp.stack(pl, axis=1) if len(pl) > 1
                    else pl[0][:, None, :])

        up = [u[:, i] for i in range(nF)]
        fv = None
        simf = None
        grp = None
        if cfg.viscous:
            if cfg.equation == 1:
                fv = [[-cfg.diff_coeff * gr[m][:, 0]] for m in range(d)]
            else:
                grp = [[gr[l][:, i] for i in range(nF)] for l in range(d)]
                fv = visc_flux_p(up, grp, d, **visc_kw)
                if use_eddy:
                    fvs = sgs_flux_p(up, grp,
                                     cfg.filter_ratio * delta_u, wdist_u,
                                     d, **sgs_kw)
                    fv = [[a + b for a, b in zip(fv[m], fvs[m])]
                          for m in range(d)]
                if use_similarity:
                    Lu, Le = similarity_terms_p(
                        up, lambda x: dg(les_filter, x), d)
                    simf = similarity_flux_p(up, Lu, Le, gamma, d)
        if cfg.over_int:
            u_over = dg(opp["opp_over"], u)            # (C2, F, El)
            flj_o = [stackj(r) for r in inv_flux_planes(u_over)]
            fvj = ([stackj(fv[m]) for m in range(d)]
                   if fv is not None else None)
            tdisf = []
            for l in range(d):
                t = dg(opp["over_filter"],
                       sum(jg_o[l][m] * flj_o[m] for m in range(d)))
                if fvj is not None:
                    t = t + sum(jg_u[l][m] * fvj[m] for m in range(d))
                tdisf.append(t)
        else:
            fl = inv_flux_planes(u)
            if fv is not None:
                fl = [[a + b for a, b in zip(fl[m], fv[m])]
                      for m in range(d)]
            if simf is not None:
                fl = [[a + b for a, b in zip(fl[m], simf[m])]
                      for m in range(d)]
            flj = [stackj(fl[m]) for m in range(d)]
            tdisf = [sum(jg_u[l][m] * flj[m] for m in range(d))
                     for l in range(d)]                # d x (U, F, El)

        # common interface fluxes
        fn = common_inv_flux_p(u_l, u_r, norm_i)
        if cfg.viscous:
            # viscous NORMAL flux on the ELEMENT side (one scalar plane
            # per field at every fpt), then gathered per side — and only
            # the F qn planes cross the ICI for halo faces, not d*F
            # gradient planes (the single-device element-side layout)
            tgf_pl = [[tgf3[:, m * nF + i] for i in range(nF)]
                      for m in range(d)]
            jgf = geoS["jgf"]                      # (d, d, Pf, El)
            ivf = geoS["invdetf"]                  # (Pf, El)
            g_f = [[sum(jgf[m, l] * tgf_pl[m][i] for m in range(d)) * ivf
                    for i in range(nF)] for l in range(d)]
            u_f = [disu_f[:, i] for i in range(nF)]
            fv_e = visc_faces(u_f, g_f, geoS.get("delta_f"),
                              geoS.get("wdist_f"))
            if use_similarity:
                # extrapolate the upts similarity flux for all dims in ONE
                # GEMM; its normal flux rides the qn planes — the
                # reference's third exchange (send_sgsf_fpts) needs no
                # separate ppermute (ref:src/mpi_inters.cpp:339-398)
                sf_cat = jnp.concatenate(
                    [stackj(simf[m]) for m in range(d)], axis=1)
                sff3 = dg(opp["opp_0"], sf_cat)        # (Pf, d*F, El)
                fv_e = [[a + sff3[:, m * nF + i]
                         for i, a in enumerate(fv_e[m])]
                        for m in range(d)]
            normf = geoS["normf"]                  # (d, Pf, El)
            qn = [sum(fv_e[m][i] * normf[m] for m in range(d))
                  for i in range(nF)]
            q2 = jnp.concatenate(qn, axis=0)       # (F*Pf, El) field-major
            qn_l = split_planes(jnp.concatenate(
                [gsl(q2, r[2], tabS[f"i{gi}_l"])
                 for gi, r in enumerate(int_rows)], axis=1))
            qn_r = split_planes(jnp.concatenate(
                [gsl(q2, r[3], tabS[f"i{gi}_r"])
                 for gi, r in enumerate(int_rows)], axis=1))
            # qn exchange (the send_corrected_gradient analog,
            # ref:src/mpi_inters.cpp:278-338 — but 3x less traffic)
            if offsets:
                qsend = {o: jnp.concatenate(
                    [gsl(q2, send_rows_q[o][gi], tabS[f"s{o}_{gi}"])
                     for gi in range(len(send_rows_q[o]))], axis=1)
                    for o in offsets}
                qrecv = exchange(qsend)
            bl = 0.5 + cfg.ldg_beta * sgn_i
            br = 0.5 - cfg.ldg_beta * sgn_i
            for i in range(nF):
                fn[i] = (fn[i] + bl * qn_l[i] - br * qn_r[i]
                         - cfg.ldg_tau * (u_r[i] - u_l[i]))
        rows_fn = jnp.concatenate(fn, axis=0)          # (F*nfp, Fi)
        fn_parts = [rows_fn]
        for gi, r in enumerate(int_rows):
            fn_parts.append(-rows_fn[:, r[5]][r[4]])
        if Fb:
            fn_b = bc_fns.inv_common_flux(u_bl, geoS["norm_b"], P=bcP,
                                          ramp=ramp, fluc=fluc)
            if cfg.viscous:
                if meta.get("bdy_read") is not None:
                    tgb = jnp.transpose(
                        bdy_read3(tgf3, tabS).reshape(Fb, nfp, d, nF),
                        (0, 1, 3, 2))                 # (Fb, nfp, F, d)
                else:
                    tb = [tgf2[m][tabS["rows_b"], tabS["ele_b"][:, None]]
                          .reshape(Fb, nfp, nF) for m in range(d)]
                    tgb = jnp.stack(tb, axis=-1)
                from ..solver.kernels import adjT_apply
                g_b = adjT_apply(geoS["jginv_b"], tgb, geoS["invdet_b"])
                wm_kw = {}
                if has_wm:
                    # wall-model input state gathered from the SoA volume
                    # solution (ref:src/eles.cpp:4873-4903).  E-axis lane
                    # gather + take_along_axis on the small spt axis keeps
                    # the carry E-minor (see residual_soa.py)
                    sub = u[:, :, tabS["wm_ele"]]              # (U, F, n)
                    wm_val = jnp.take_along_axis(
                        sub, tabS["wm_upt"][None, None, :], axis=0)[0]
                    wm_kw = dict(wm_state=wm_val.T,
                                 wm_dist=geoS["wm_dist"])
                fn_b = fn_b + bc_fns.visc_common_flux(
                    u_bl, g_b, geoS["norm_b"], None, P=bcP, ramp=ramp,
                    fluc=fluc, **wm_kw)
            fn_parts.append(jnp.transpose(fn_b, (2, 1, 0)).reshape(
                nF * nfp, Fb))
        if nH:
            fn_h = common_inv_flux_p(u_hl, u_hr, norm_h)
            if cfg.viscous:
                qn_hl = split_planes(jnp.concatenate(
                    [gsl(q2, halo_rows[gi][1], tabS[f"h{gi}_l"])
                     for gi in range(nH)], axis=1))
                # received qn was evaluated with the PARTNER's outward
                # normal (= -ours), exactly the r-side convention
                qn_hr = split_planes(qrecv[:, hcol])
                bh_l = 0.5 + cfg.ldg_beta * sgn_h
                bh_r = 0.5 - cfg.ldg_beta * sgn_h
                for i in range(nF):
                    fn_h[i] = (fn_h[i] + bh_l * qn_hl[i] - bh_r * qn_hr[i]
                               - cfg.ldg_tau * (u_hr[i] - u_hl[i]))
            rows_fnh = jnp.concatenate(fn_h, axis=0)
            fn_parts.extend(rows_fnh[:, hr[3]][hr[2]] for hr in halo_rows)
        pool_fn = jnp.concatenate(fn_parts, axis=1)

        tdA_q = jnp.broadcast_to(
            jnp.transpose(geoS["tdA"], (1, 0)).reshape(nf, 1, nfp, El),
            (nf, nF, nfp, El))
        ntc = (jnp.concatenate(
            [pool_fn[:, tabS["sel"][lf]] for lf in range(nf)], axis=0)
            .reshape(nf, nF, nfp, El) * tdA_q)

        div = dgq(opp_corr4, ntc)
        if cfg.over_int:
            div = div + dg(opp["opp_div_fused"],
                           jnp.concatenate(tdisf, axis=0))
        else:
            for l in range(d):
                div = div + dg(opp_div_parts[l], tdisf[l])
        rhs = -div * inv_det_u
        if cfg.rans:
            # SA source (ref:src/eles.cpp:2650, ref:src/source.cpp:33-105)
            src = sa_source_p(
                up, grp, wdist_u, d, gamma=gamma, mu_inf=cfg.mu_inf,
                rt_inf=cfg.rt_inf, c_sth=cfg.c_sth, fix_vis=cfg.fix_vis,
                kappa=cfg.kappa, c_v1=cfg.c_v1, c_v2=cfg.c_v2,
                c_v3=cfg.c_v3, c_b1=cfg.c_b1, c_b2=cfg.c_b2,
                c_w2=cfg.c_w2, c_w3=cfg.c_w3, omega=cfg.omega)
            rhs = rhs.at[:, d + 2, :].add(src)
        # freeze padding clones (zero rhs keeps them at their finite IC)
        return rhs * geo["pad_mask"][None, None, :]

    return residual
