"""Multi-chip domain decomposition for MIXED-element-type meshes.

Combines the per-type block structure of solver/multiblock.py with the
shard_map + ppermute halo machinery of parallel/sharding.py: every shard
owns a near-balanced share of each element type, padded to the per-type
max with clone elements (the SPMD shapes must match across shards; clones
have zero face coupling and a pad-masked rhs), per-type volume GEMMs run
per shard, and the face exchange happens in a per-shard LOCAL slot space
  slot = off_local[ctype] + e_local * Pf_ct + fpt_off_ct[locf] + j
with halo faces riding lax.ppermute ring shifts (the reference couples its
ParMETIS partition, mixed eles objects, and mpi_inters the same way:
ref:src/mesh.cpp:72-314, ref:src/geometry.cpp:250-420,
ref:src/mpi_inters.cpp:218-398).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config.params import RunInput
from ..mesh.core import MeshData, build_faces
from ..models.euler import inviscid_flux
from ..models.viscous import adv_diff_viscous_flux, viscous_flux
from ..ops import riemann
from ..solver.elements import build_element_block, match_fpts_grouped
from ..solver.kernels import adj_apply_cat, adjT_apply, opmat, opmat_md
from ..solver.ics import initial_condition
from ..solver.multiblock import _build_ops
from ..solver.residual import BlockArrays, ResidualConfig
from ..solver.step import RK414_A, RK414_B, RK45_A, RK45_B


class ShardedMixedSolver:
    """shard_map FR solver for meshes with several element types."""

    def __init__(self, run_input: RunInput, mesh: MeshData, devices=None,
                 dtype=jnp.float32, axis_name: str = "x"):
        from ..utils import enable_persistent_cache
        enable_persistent_cache()
        self.p = run_input
        self.mesh = mesh
        self.dtype = dtype
        self.axis = axis_name
        devices = devices if devices is not None else jax.devices()
        n = self.n_shards = len(devices)
        self.jmesh = Mesh(np.array(devices), (axis_name,))
        self.n_dims = mesh.n_dims
        nF = self.n_fields = run_input.n_fields_for(self.n_dims)

        if (mesh.bc_names and not run_input.bc_list
                and run_input._deck is not None):
            run_input.read_boundary_params(mesh.bc_names)
        if run_input.bc_list:
            bc_flags = {i: bc.flag for i, bc in enumerate(run_input.bc_list)}
        else:
            from ..config.params import CYCLIC
            bc_flags = {0: CYCLIC}
        delta_cyclic = np.array([run_input.dx_cyclic, run_input.dy_cyclic,
                                 run_input.dz_cyclic])[:self.n_dims]
        conn = build_faces(mesh, bc_flags, delta_cyclic)

        cts = self.cts = sorted(int(c) for c in np.unique(mesh.ctype))
        ops_by_ct = {ct: _build_ops(run_input, ct) for ct in cts}
        self.ops_by_ct = ops_by_ct
        d = self.n_dims

        # --- per-type near-balanced partition (contiguous chunks within
        # type).  Shards below a type's max local count are padded with
        # CLONES of that type's first element (finite geometry/state, zero
        # face coupling; rhs zeroed by pad_mask) — the mixed analog of the
        # single-type padded-clone mechanism (sharding.py), so arbitrary
        # per-type counts shard (the reference's ParMETIS partition is
        # likewise only near-balanced, ref:src/mesh.cpp:169).
        sels, E_loc, loc_idx = {}, {}, np.zeros(mesh.n_cells, dtype=np.int64)
        sizes_ct, owner_ct, pad_ct = {}, {}, {}
        shard_of_tl, eloc_of_tl = {}, {}
        from ..solver.elements import mixed_type_selections
        sig_sels = mixed_type_selections(mesh, conn)
        for ct in cts:
            sel = sig_sels[ct]
            if sel.size == 0:
                raise ValueError(f"type {ct}: empty selection")
            sels[ct] = sel
            base, extra = divmod(sel.size, n)
            sizes = base + (np.arange(n) < extra)
            El = int(sizes.max())
            E_loc[ct] = El
            sizes_ct[ct] = sizes
            loc_idx[sel] = np.arange(sel.size)
            cum = np.concatenate([[0], np.cumsum(sizes)])
            tl = np.arange(sel.size)
            shard_of_tl[ct] = np.searchsorted(cum, tl, side="right") - 1
            eloc_of_tl[ct] = tl - cum[shard_of_tl[ct]]
            owner = np.zeros((n, El), dtype=np.int64)   # -> type-local id
            pm = np.zeros((n, El))
            for s in range(n):
                owner[s, :sizes[s]] = np.arange(cum[s], cum[s + 1])
                owner[s, sizes[s]:] = cum[s] if sizes[s] else 0
                pm[s, :sizes[s]] = 1.0
            owner_ct[ct], pad_ct[ct] = owner, pm
        self.sels, self.E_loc = sels, E_loc
        self.sizes_ct, self.pad_ct = sizes_ct, pad_ct
        self.owner_ct = owner_ct

        # per-type geometry blocks (global; leading axis later split (n, .))
        blocks = {ct: build_element_block(
            mesh, None, ops_by_ct[ct], sel=sels[ct], face_tables=False,
            over_int_order=(run_input.over_int_order if run_input.over_int
                            else None))
            for ct in cts}
        self.blocks = blocks

        # --- local slot space
        fpt_off = {ct: np.concatenate(
            [[0], np.cumsum(ops_by_ct[ct].n_fpts_per_face)]) for ct in cts}
        off_local, off = {}, 0
        for ct in cts:
            off_local[ct] = off
            off += E_loc[ct] * ops_by_ct[ct].n_fpts
        S_loc = off
        nfp_max = max(int(ops_by_ct[ct].n_fpts_per_face.max())
                      for ct in cts)

        def shard_slots(ele, locf):
            ct = int(mesh.ctype[ele])
            tl = int(loc_idx[ele])
            s, e_loc = int(shard_of_tl[ct][tl]), int(eloc_of_tl[ct][tl])
            nfp = int(ops_by_ct[ct].n_fpts_per_face[locf])
            return s, (off_local[ct] + e_loc * ops_by_ct[ct].n_fpts
                       + fpt_off[ct][locf] + np.arange(nfp))

        # global fpt positions for geometric matching
        pos_cat = np.concatenate([blocks[ct].pos_fpts for ct in cts])
        goff, go = {}, 0
        for ct in cts:
            goff[ct] = go
            go += sels[ct].size * ops_by_ct[ct].n_fpts

        def global_slots(ele, locf):
            ct = int(mesh.ctype[ele])
            nfp = int(ops_by_ct[ct].n_fpts_per_face[locf])
            return (goff[ct] + loc_idx[ele] * ops_by_ct[ct].n_fpts
                    + fpt_off[ct][locf] + np.arange(nfp))

        Fi_all = conn.int_ele_l.size
        gls = [global_slots(conn.int_ele_l[f], conn.int_locf_l[f])
               for f in range(Fi_all)]
        grs = [global_slots(conn.int_ele_r[f], conn.int_locf_r[f])
               for f in range(Fi_all)]
        luts = match_fpts_grouped(pos_cat, gls, grs)

        def face_rec(ele, locf):
            """Type-aware face side: (shard, ct, e_local, lf, local fpts)
            — the record form consumed by the mixed SoA table builder."""
            ct = int(mesh.ctype[ele])
            tl = int(loc_idx[ele])
            nfp = int(ops_by_ct[ct].n_fpts_per_face[locf])
            return (int(shard_of_tl[ct][tl]), ct, int(eloc_of_tl[ct][tl]),
                    int(locf), fpt_off[ct][locf] + np.arange(nfp))

        ints = [[] for _ in range(n)]
        bdys = [[] for _ in range(n)]
        halos = [[] for _ in range(n)]
        ints_rec = [[] for _ in range(n)]
        bdy_rec = [[] for _ in range(n)]
        halo_rec = [[] for _ in range(n)]
        for f in range(Fi_all):
            s_l, sl = shard_slots(conn.int_ele_l[f], conn.int_locf_l[f])
            s_r, sr0 = shard_slots(conn.int_ele_r[f], conn.int_locf_r[f])
            sr = sr0[luts[f]]
            _, ct_l, el_l, lf_l, fl = face_rec(conn.int_ele_l[f],
                                               conn.int_locf_l[f])
            _, ct_r, el_r, lf_r, fr0 = face_rec(conn.int_ele_r[f],
                                                conn.int_locf_r[f])
            frm = fr0[luts[f]]
            if s_l == s_r:
                ints[s_l].append((sl, sr))
                ints_rec[s_l].append((ct_l, el_l, lf_l, fl,
                                      ct_r, el_r, frm, gls[f]))
            else:
                halos[s_l].append((sl, (s_l - s_r) % n, sr))
                halos[s_r].append((sr, (s_r - s_l) % n, sl))
                halo_rec[s_l].append((ct_l, el_l, lf_l, fl,
                                      (s_l - s_r) % n, ct_r, el_r, frm,
                                      gls[f]))
                halo_rec[s_r].append((ct_r, el_r, lf_r, frm,
                                      (s_r - s_l) % n, ct_l, el_l, fl,
                                      grs[f][luts[f]]))
        for f in range(conn.bdy_ele.size):
            s, sl = shard_slots(conn.bdy_ele[f], conn.bdy_locf[f])
            _, ct_b, el_b, lf_b, fb = face_rec(conn.bdy_ele[f],
                                               conn.bdy_locf[f])
            bdy_rec[s].append((ct_b, el_b, lf_b, fb, len(bdys[s]),
                               global_slots(conn.bdy_ele[f],
                                            conn.bdy_locf[f])))
            bdys[s].append((sl, int(conn.bdy_bcid[f]),
                            int(conn.bdy_ele[f]), int(conn.bdy_locf[f])))

        Fi = max((len(x) for x in ints), default=0)
        Fb = max((len(x) for x in bdys), default=0)
        Fh = max((len(x) for x in halos), default=0)
        offsets = sorted({o for h in halos for (_, o, _) in h})
        self.n_int, self.n_bdy, self.n_halo = Fi, Fb, Fh
        self.nfp_max, self.S_loc = nfp_max, S_loc

        int_l = np.zeros((n, Fi, nfp_max), dtype=np.int64)
        int_r = np.zeros((n, Fi, nfp_max), dtype=np.int64)
        bdy = np.zeros((n, Fb, nfp_max), dtype=np.int64)
        bdy_bcid = np.zeros((n, Fb), dtype=np.int64)
        halo_l = np.zeros((n, Fh, nfp_max), dtype=np.int64)
        halo_recv = np.zeros((n, Fh, nfp_max), dtype=np.int64)
        slot_src = -np.ones((n, S_loc), dtype=np.int64)
        slot_sign = np.zeros((n, S_loc))
        send_lists = {o: [[] for _ in range(n)] for o in offsets}
        halo_sorted = []
        for s in range(n):
            by_off = {o: [] for o in offsets}
            for (sl, o, partner) in halos[s]:
                by_off[o].append((sl, partner))
            halo_sorted.append(by_off)
        n_send_max = {o: max((sum(len(x[1]) for x in halo_sorted[s][o])
                              for s in range(n)), default=0)
                      for o in offsets}
        for s in range(n):
            for k, (sl, sr) in enumerate(ints[s]):
                m = sl.size
                int_l[s, k, :m] = sl
                int_r[s, k, :m] = sr
                base = k * nfp_max + np.arange(m)
                slot_src[s, sl] = base
                slot_sign[s, sl] = 1.0
                slot_src[s, sr] = base
                slot_sign[s, sr] = -1.0
            for k, (sl, bid, _ele, _locf) in enumerate(bdys[s]):
                m = sl.size
                bdy[s, k, :m] = sl
                bdy_bcid[s, k] = bid
                base = (Fi + k) * nfp_max + np.arange(m)
                slot_src[s, sl] = base
                slot_sign[s, sl] = 1.0
            cum, pos_in_offset = 0, {}
            for o in offsets:
                pos_in_offset[o] = cum
                cum += n_send_max[o]
            recv_cursor = {o: 0 for o in offsets}
            k = 0
            for o in offsets:
                t = (s - o) % n
                for (sl, partner) in halo_sorted[s][o]:
                    m = sl.size
                    halo_l[s, k, :m] = sl
                    halo_recv[s, k, :m] = (pos_in_offset[o]
                                           + recv_cursor[o] + np.arange(m))
                    recv_cursor[o] += m
                    send_lists[o][t].extend(partner.tolist())
                    base = (Fi + Fb + k) * nfp_max + np.arange(m)
                    slot_src[s, sl] = base
                    slot_sign[s, sl] = 1.0
                    k += 1
        # padding-clone slots have no faces: give them src 0 / sign 0 so
        # the gather is in-bounds and the face correction vanishes (the
        # rhs on clones is additionally zeroed by pad_mask)
        for s in range(n):
            for ct in cts:
                Pf_ct = ops_by_ct[ct].n_fpts
                lo = off_local[ct] + int(sizes_ct[ct][s]) * Pf_ct
                hi = off_local[ct] + E_loc[ct] * Pf_ct
                assert not np.any(slot_sign[s, lo:hi]), "face on a clone"
                slot_src[s, lo:hi] = 0
        if np.any(slot_src < 0):
            raise AssertionError("uncovered slots in sharded mixed tables")
        send_idx = {}
        for o in offsets:
            arr = np.zeros((n, n_send_max[o]), dtype=np.int64)
            for t in range(n):
                arr[t, :len(send_lists[o][t])] = send_lists[o][t]
            send_idx[o] = arr
        self.offsets = offsets

        # wall-model input tables per shard (the input element is the
        # face's own element, so these stay shard-local;
        # ref:src/eles.cpp:4873-4903, ref:src/bdy_inters.cpp:1095-1131)
        self.has_wm = False
        wm_np = None
        if run_input.wall_model and run_input.bc_list and Fb:
            use_wm = np.array([b.use_wm for b in run_input.bc_list])
            norm_cat = np.concatenate([blocks[ct].norm_fpts for ct in cts])
            wm_ct = -np.ones((n, Fb), dtype=np.int64)
            wm_ele = {i: np.zeros((n, Fb), dtype=np.int64)
                      for i in range(len(cts))}
            wm_upt = {i: np.zeros((n, Fb), dtype=np.int64)
                      for i in range(len(cts))}
            wm_dist = np.ones((n, Fb))
            for s in range(n):
                for k, (sl, bid, ele, locf) in enumerate(bdys[s]):
                    if bid < 0 or bid >= use_wm.size or use_wm[bid] <= 0:
                        continue
                    ct = int(mesh.ctype[ele])
                    i = cts.index(ct)
                    tl = int(loc_idx[ele])
                    gsl = global_slots(ele, locf)
                    fpt_pos = pos_cat[gsl]
                    fpt_nrm = norm_cat[gsl]
                    dvec = (fpt_pos[None, :, :]
                            - blocks[ct].pos_upts[tl][:, None, :])
                    dist = np.einsum("ufd,fd->uf", dvec, fpt_nrm).min(axis=1)
                    wm_ct[s, k] = i
                    wm_ele[i][s, k] = int(eloc_of_tl[ct][tl])
                    wm_upt[i][s, k] = int(np.argmax(dist))
                    wm_dist[s, k] = float(dist.max())
            if np.any(wm_ct >= 0):
                self.has_wm = True
                wm_np = (wm_ct, wm_ele, wm_upt, wm_dist)

        # wall distance for SA / wall-damped Smagorinsky / wall models
        # (ref:src/geometry.cpp:708-894)
        if (run_input.RANS or run_input.wall_model
                or (run_input.LES and run_input.SGS_model == 0)):
            from ..config.params import ADIABAT_WALL, ISOTHERM_WALL
            wall_slots = []
            for fgi in range(conn.bdy_ele.size):
                if bc_flags.get(int(conn.bdy_bcid[fgi]), -1) in (
                        ISOTHERM_WALL, ADIABAT_WALL):
                    wall_slots.append(global_slots(conn.bdy_ele[fgi],
                                                   conn.bdy_locf[fgi]))
            wall_pts = (pos_cat[np.concatenate(wall_slots)]
                        if wall_slots else np.empty((0, d)))
            for ct in cts:
                blocks[ct].compute_wall_distance(wall_pts)

        # --- per-shard geometry operands
        f = lambda a: jnp.asarray(a, dtype=dtype)
        i32 = lambda a: jnp.asarray(a, dtype=jnp.int32)
        self.B = {ct: BlockArrays(blocks[ct], dtype) for ct in cts}
        self.B_delta = {ct: self.B[ct].delta_slot for ct in cts}
        self.B_wdist = {ct: self.B[ct].wdist_slot for ct in cts}

        owner_flat = {ct: owner_ct[ct].reshape(-1) for ct in cts}

        def shard_flat(getter, trailing):
            """Per-type flat slot arrays -> (n, S_loc, *trailing), clones
            included via the owner gather."""
            parts = []
            for ct in cts:
                Pf_ct = ops_by_ct[ct].n_fpts
                arr = np.asarray(getter(ct)).reshape(
                    (sels[ct].size, Pf_ct) + trailing)[owner_flat[ct]]
                parts.append(arr.reshape(
                    (n, E_loc[ct] * Pf_ct) + trailing))
            return np.concatenate(parts, axis=1)

        def shard_upts(arr, ct, trailing):
            """Per-type (E_tot, U, *trailing) -> (n, El, U, *trailing)."""
            U = ops_by_ct[ct].n_upts
            return np.asarray(arr)[owner_flat[ct]].reshape(
                (n, E_loc[ct], U) + trailing)

        self.geo = dict(
            tdA=f(shard_flat(lambda ct: blocks[ct].tdA_fpts, ())),
            norm=f(shard_flat(lambda ct: blocks[ct].norm_fpts, (d,))),
            inv_detjac_f=f(1.0 / shard_flat(
                lambda ct: blocks[ct].detjac_fpts, ())),
            jginv_f=f(shard_flat(lambda ct: blocks[ct].jginv_fpts, (d, d))))
        for ct in cts:
            b, U = blocks[ct], ops_by_ct[ct].n_upts
            self.geo[f"detjac_upts_{ct}"] = f(
                shard_upts(b.detjac_upts, ct, ()))
            self.geo[f"jginv_upts_{ct}"] = f(
                shard_upts(b.jginv_upts, ct, (d, d)))
            self.geo[f"pad_{ct}"] = f(pad_ct[ct])
            if run_input.over_int:
                C2 = b.jginv_over.shape[1]
                self.geo[f"jginv_over_{ct}"] = f(np.asarray(
                    b.jginv_over)[owner_flat[ct]].reshape(
                    n, E_loc[ct], C2, d, d))
        if run_input.LES:
            self.geo["delta_slot"] = f(shard_flat(
                lambda ct: np.asarray(self.B_delta[ct]), ()))
            self.geo["wdist_slot"] = f(shard_flat(
                lambda ct: np.asarray(self.B_wdist[ct]), ()))
        if run_input.LES or run_input.RANS:
            for ct in cts:
                self.geo[f"delta_upts_{ct}"] = f(
                    shard_upts(self.B[ct].delta_upts, ct, ()))
                self.geo[f"wdist_upts_{ct}"] = f(
                    shard_upts(self.B[ct].wdist_upts, ct, ()))
        self.tabs = dict(
            int_l=i32(int_l), int_r=i32(int_r), bdy=i32(bdy),
            halo_l=i32(halo_l), halo_recv=i32(halo_recv),
            slot_src=i32(slot_src), slot_sign=f(slot_sign))
        if wm_np is not None:
            wm_ct_t, wm_ele_t, wm_upt_t, wm_dist_t = wm_np
            self.tabs["wm_ct"] = i32(wm_ct_t)
            for i in range(len(cts)):
                self.tabs[f"wm_ele_{i}"] = i32(wm_ele_t[i])
                self.tabs[f"wm_upt_{i}"] = i32(wm_upt_t[i])
            self.geo["wm_dist"] = f(wm_dist_t)
        self.send_idx = {o: i32(v) for o, v in send_idx.items()}

        self.rcfg = ResidualConfig(
            equation=run_input.equation, viscous=bool(run_input.viscous),
            riemann_solve_type=run_input.riemann_solve_type,
            gamma=run_input.gamma, prandtl=run_input.prandtl,
            prandtl_t=run_input.prandtl_t,
            mu_inf=0.0 if np.isnan(run_input.mu_inf) else run_input.mu_inf,
            rt_inf=1.0 if np.isnan(run_input.rt_inf) else run_input.rt_inf,
            c_sth=0.0 if np.isnan(run_input.c_sth) else run_input.c_sth,
            fix_vis=run_input.fix_vis, ldg_tau=run_input.ldg_tau,
            ldg_beta=run_input.ldg_beta,
            wave_speed=tuple(run_input.wave_speed),
            lambda_lf=run_input.lambda_lf, diff_coeff=run_input.diff_coeff,
            n_fields=nF, over_int=bool(run_input.over_int),
            les=bool(run_input.LES), sgs_model=run_input.SGS_model,
            C_s=run_input.C_s, filter_ratio=run_input.filter_ratio,
            filter_type=run_input.filter_type, kappa=run_input.Kappa,
            rans=bool(run_input.RANS),
            c_v1=run_input.c_v1, c_v2=run_input.c_v2, c_v3=run_input.c_v3,
            c_b1=run_input.c_b1, c_b2=run_input.c_b2, c_w2=run_input.c_w2,
            c_w3=run_input.c_w3, omega=run_input.omega)

        # boundary conditions (partitioned parameter tables)
        self.bc_fns = None
        self.bcP = {}
        if Fb:
            from ..solver.bc import _pack_params, make_bc_functions
            from ..io.vtu import _MixedBlockView  # noqa: F401
            from ..solver.multiblock import _BCBlockFacade, \
                build_mixed_blocks  # reuse global facade for closures
            mt = build_mixed_blocks(mesh, conn, ops_by_ct)
            self.bc_fns = make_bc_functions(run_input, _BCBlockFacade(mt),
                                            self.rcfg, dtype)
            bcid = np.repeat(bdy_bcid[:, :, None], nfp_max, axis=2)
            P_np = _pack_params(run_input, bcid, d)
            self.bcP = {k: jnp.asarray(
                v, dtype=dtype if k != "flag" else jnp.int32)
                for k, v in P_np.items()}

        # initial condition per type, shard-major
        sharding = NamedSharding(self.jmesh, P(self.axis))
        us = []
        for ct in cts:
            u0 = initial_condition(run_input, blocks[ct].pos_upts, nF)
            us.append(jax.device_put(jnp.asarray(
                u0[owner_flat[ct]].reshape(
                    n, E_loc[ct], ops_by_ct[ct].n_upts, nF),
                dtype=dtype), sharding))
        self.u = tuple(us)
        self.reg = jax.tree.map(jnp.zeros_like, self.u)
        self.time = 0.0

        # featured runs: body forcing + running time averages — the
        # sharded twins of MixedSolver's (ref:src/eles.cpp:5281-5484 with
        # MPI-reduced inflow integrals, :5630-5700).  SEM inlets / BC
        # ramping are unimplemented on mixed meshes: fail loudly.
        if run_input.bc_list and run_input.LES and any(
                getattr(b, "inlet_type", 0) for b in run_input.bc_list):
            raise NotImplementedError(
                "turbulent inlets (SEM/white noise) are not "
                "implemented on mixed-type meshes")
        self._forcing = bool(run_input.forcing) and run_input.equation == 0
        self._mdot_old = jnp.asarray(run_input.body_force_mdot0
                                     if self._forcing else 0.0, dtype)
        self._force_cts = []
        if self._forcing:
            # inflow plane = cyclic faces with normal -x; rows in each
            # shard's BLOCK-LOCAL fpt space, padded with weight 0
            from ..config.params import CYCLIC as _CYC
            from ..mesh.core import NUM_F_PER_C
            per = {ct: [[] for _ in range(n)] for ct in cts}
            for c in range(mesh.n_cells):
                ct = int(mesh.ctype[c])
                o = ops_by_ct[ct]
                for k2 in range(NUM_F_PER_C[ct]):
                    bid = int(mesh.bc_id[c, k2])
                    if bid < 0 or bc_flags.get(bid, -1) != _CYC:
                        continue
                    tl = int(loc_idx[c])
                    nfp = int(o.n_fpts_per_face[k2])
                    sl_g = (tl * o.n_fpts + fpt_off[ct][k2]
                            + np.arange(nfp))
                    if blocks[ct].norm_fpts[sl_g[0], 0] >= -0.99:
                        continue
                    s_ = int(shard_of_tl[ct][tl])
                    e_loc = int(eloc_of_tl[ct][tl])
                    w_ = (o.fpt_weights[sl_g % o.n_fpts]
                          * blocks[ct].tdA_fpts[sl_g])
                    sl_loc = (e_loc * o.n_fpts + fpt_off[ct][k2]
                              + np.arange(nfp))
                    per[ct][s_].append((sl_loc, w_))
            if not any(any(sh) for sh in per.values()):
                raise ValueError("body forcing: no -x cyclic inflow plane")
            for ct in cts:
                if not any(per[ct]):
                    continue
                self._force_cts.append(ct)
                Ns = max([sum(x[0].size for x in sh) for sh in per[ct]]
                         + [1])
                frow = np.zeros((n, Ns), dtype=np.int64)
                fw = np.zeros((n, Ns))
                for s_ in range(n):
                    j = 0
                    for sl_loc, w_ in per[ct][s_]:
                        frow[s_, j:j + sl_loc.size] = sl_loc
                        fw[s_, j:j + sl_loc.size] = w_
                        j += sl_loc.size
                self.tabs["force_row_%d" % ct] = i32(frow)
                self.geo["force_w_%d" % ct] = f(fw)
        self._avg = bool(run_input.average_fields)
        self.u_avg = None
        if self._avg:
            for f_ in run_input.average_fields:
                if f_ not in ("rho_average", "u_average", "v_average",
                              "w_average", "e_average"):
                    raise ValueError(f"unknown average field '{f_}'")
            K = len(run_input.average_fields)
            self.u_avg = tuple(jax.device_put(
                jnp.zeros((n, E_loc[ct], ops_by_ct[ct].n_upts, K), dtype),
                sharding) for ct in cts)
        self._t_sim = jnp.asarray(0.0, dtype)
        # BC ramping (ref:src/bdy_inters.cpp:482-509)
        self._has_ramp = any(getattr(b, "pressure_ramp", 0)
                             for b in run_input.bc_list) \
            if run_input.bc_list else False
        self._iter_k = jnp.asarray(1, jnp.int32)  # ref:src/input.cpp:377

        # mixed SoA fast path inside shard_map (mixed_soa_sharding.py):
        # per-type (U_t, F, E_t) blocks, per-face-shape pools, ppermute
        # halos — the sharded twin of solver/residual_mixed_soa.py.
        # RANS+HLLC stays on the slot path (HLLC star states carry no SA
        # field), like the single-device dispatch.
        import os as _os
        self._residual_soa_shard = None
        rc = self.rcfg
        if (not _os.environ.get("HIFILES_NO_SOA")
                and not (rc.rans
                         and rc.riemann_solve_type == riemann.HLLC)
                and not (rc.over_int
                         and any(blocks[ct].jginv_over is None
                                 for ct in cts))
                and (rc.equation != 0
                     or nF == d + (3 if rc.rans else 2))):
            from .mixed_soa_sharding import (
                build_mixed_soa_shard_tables,
                make_mixed_shard_residual_soa)
            norm_cat = np.concatenate(
                [blocks[ct].norm_fpts for ct in cts])
            out = build_mixed_soa_shard_tables(
                cts, ops_by_ct, blocks, owner_ct, sizes_ct, E_loc, n,
                nF, offsets, Fb, nfp_max, ints_rec, bdy_rec, halo_rec,
                norm_cat, les=bool(run_input.LES))
            if out is not None:
                meta, tabS_np, geoS_np = out
                for k2, v in tabS_np.items():
                    self.tabs["msoa_" + k2] = i32(v)
                for k2, v in geoS_np.items():
                    self.geo["msoa_" + k2] = f(v)
                self._residual_soa_shard = make_mixed_shard_residual_soa(
                    self, meta)

        from ..utils import log_residual_path
        self.run_path = ("sharded mixed SoA (fast)"
                         if self._residual_soa_shard is not None
                         else "sharded mixed slot (fallback, up to 20x "
                              "slower)")
        log_residual_path("ShardedMixedSolver", self.run_path)

        self._step_jit = jax.jit(self._make_step(), static_argnums=2,
                                 donate_argnums=0)

    # ------------------------------------------------------------------
    def _make_shard_residual(self):
        cfg = self.rcfg
        dtype = self.dtype
        d = self.n_dims
        nF = self.n_fields
        cts = self.cts
        E_loc = self.E_loc
        B = self.B
        axis, offsets, n = self.axis, self.offsets, self.n_shards
        n_bdy, nfp_max = self.n_bdy, self.nfp_max
        bc_fns = self.bc_fns
        prec = jax.lax.Precision[cfg.precision.upper()]
        seg = {}
        off = 0
        for ct in cts:
            seg[ct] = (off, off + E_loc[ct] * self.ops_by_ct[ct].n_fpts)
            off = seg[ct][1]

        def exchange(flat, sends):
            recvs = []
            for o in offsets:
                send = flat[sends[o]]
                perm = [(i, (i + o) % n) for i in range(n)]
                recvs.append(jax.lax.ppermute(send, axis, perm))
            return jnp.concatenate(recvs) if recvs else None

        def phys_flux(u):
            if cfg.equation == 0:
                return inviscid_flux(u, cfg.gamma, d)
            ws = jnp.asarray(cfg.wave_speed[:d], dtype=u.dtype)
            return u[..., None] * ws

        def common_inv_flux(u_l, u_r, norm):
            if cfg.equation == 0:
                return riemann.solve(cfg.riemann_solve_type, u_l, u_r, norm,
                                     gamma=cfg.gamma, n_dims=d)
            ws = jnp.asarray(cfg.wave_speed[:d], dtype=u_l.dtype)
            return riemann.lax_friedrichs_flux(u_l, u_r, norm, ws,
                                               cfg.lambda_lf)

        def phys_visc_flux(u, grad, delta=None, wdist=None):
            if cfg.equation == 0:
                fv = viscous_flux(
                    u, grad, gamma=cfg.gamma, prandtl=cfg.prandtl,
                    mu_inf=cfg.mu_inf, rt_inf=cfg.rt_inf, c_sth=cfg.c_sth,
                    fix_vis=cfg.fix_vis, n_dims=d, rans=cfg.rans,
                    prandtl_t=cfg.prandtl_t)
                if cfg.les and cfg.sgs_model in (0, 1, 2) \
                        and delta is not None:
                    from ..models.sgs import sgs_flux
                    fv = fv + sgs_flux(
                        u, grad, cfg.filter_ratio * delta, wdist,
                        sgs_model=cfg.sgs_model, C_s=cfg.C_s,
                        gamma=cfg.gamma, prandtl_t=cfg.prandtl_t,
                        n_dims=d, kappa=cfg.kappa)
                return fv
            return adv_diff_viscous_flux(grad, cfg.diff_coeff)

        use_similarity = cfg.les and cfg.sgs_model in (2, 4) and cfg.viscous
        if use_similarity:
            from ..ops.les_filter import build_les_filter
            les_filter = {ct: jnp.asarray(build_les_filter(
                self.ops_by_ct[ct], cfg.filter_type, cfg.filter_ratio),
                dtype=dtype) for ct in cts}
        has_wm = self.has_wm

        def residual(us, geo, tab, sends, bcP, ramp=None):
            flat = jnp.concatenate([
                jnp.einsum("pu,euf->epf", B[ct].opp_0, us[i],
                           preferred_element_type=dtype,
                           precision=prec).reshape(-1, nF)
                for i, ct in enumerate(cts)])
            u_l = flat[tab["int_l"]]
            u_r = flat[tab["int_r"]]
            norm_l = geo["norm"][tab["int_l"]]
            halo_recv = exchange(flat, sends)
            u_hl = flat[tab["halo_l"]]
            u_hr = halo_recv[tab["halo_recv"]] if halo_recv is not None \
                else u_hl
            norm_h = geo["norm"][tab["halo_l"]]
            if n_bdy:
                u_bl = flat[tab["bdy"]]
                norm_b = geo["norm"][tab["bdy"]]

            # similarity Leonard terms + extrapolated SGS flux
            # (ref:src/eles.cpp:2091-2218, :2817)
            if use_similarity:
                from ..models.sgs import similarity_flux, similarity_terms
                simf_upts = []
                parts = []
                for i, ct in enumerate(cts):
                    Lu, Le = similarity_terms(us[i], les_filter[ct], d)
                    sf = similarity_flux(us[i], Lu, Le, cfg.gamma, d)
                    simf_upts.append(sf)
                    parts.append(opmat_md(B[ct].opp_0, sf, dtype,
                                          prec).reshape(-1, nF, d))
                simf_flat = jnp.concatenate(parts)

            if cfg.viscous:
                u_c_int = riemann.ldg_common_solution(u_l, u_r, norm_l,
                                                      cfg.ldg_beta)
                u_c_halo = riemann.ldg_common_solution(u_hl, u_hr, norm_h,
                                                       cfg.ldg_beta)
                u_c_bdy = (bc_fns.ldg_solution(u_bl, norm_b, P=bcP,
                                               ramp=ramp)
                           .reshape(-1, nF) if n_bdy
                           else jnp.zeros((0, nF), dtype=dtype))
                u_c_all = jnp.concatenate([
                    u_c_int.reshape(-1, nF), u_c_bdy,
                    u_c_halo.reshape(-1, nF)])
                delta_flat = u_c_all[tab["slot_src"]] - flat
                grad_u = []
                tgf_parts = []
                for i, ct in enumerate(cts):
                    b = B[ct]
                    lo, hi = seg[ct]
                    tg = jnp.stack(
                        [opmat(b.opp_2_stack[g], us[i], dtype, prec)
                         for g in range(d)], axis=-1)
                    delta = delta_flat[lo:hi].reshape(
                        E_loc[ct], b.n_fpts, nF)
                    tg = tg + jnp.stack(
                        [opmat(b.opp_5_stack[g], delta, dtype, prec)
                         for g in range(d)], axis=-1)
                    grad_u.append(adjT_apply(geo[f"jginv_upts_{ct}"], tg,
                                             1.0 / geo[f"detjac_upts_{ct}"]))
                    tgf_parts.append(opmat_md(b.opp_0, tg, dtype,
                                              prec).reshape(-1, nF, d))
                grad_f = adjT_apply(geo["jginv_f"],
                                    jnp.concatenate(tgf_parts),
                                    geo["inv_detjac_f"])

            fn_int = common_inv_flux(u_l, u_r, norm_l)
            fn_halo = common_inv_flux(u_hl, u_hr, norm_h)
            if n_bdy:
                fn_bdy = bc_fns.inv_common_flux(u_bl, norm_b, P=bcP,
                                                ramp=ramp)
            if cfg.viscous:
                sel = (lambda key, idx: geo[key][idx]
                       if key in geo else None)
                fv_l = phys_visc_flux(u_l, grad_f[tab["int_l"]],
                                      sel("delta_slot", tab["int_l"]),
                                      sel("wdist_slot", tab["int_l"]))
                fv_r = phys_visc_flux(u_r, grad_f[tab["int_r"]],
                                      sel("delta_slot", tab["int_r"]),
                                      sel("wdist_slot", tab["int_r"]))
                if use_similarity:
                    fv_l = fv_l + simf_flat[tab["int_l"]]
                    fv_r = fv_r + simf_flat[tab["int_r"]]
                fn_int = fn_int + riemann.ldg_common_flux(
                    u_l, u_r, fv_l, fv_r,
                    norm_l, cfg.ldg_tau, cfg.ldg_beta)
                g_hl = grad_f[tab["halo_l"]]
                grad_recv = exchange(
                    grad_f.reshape(flat.shape[0], nF * d), sends)
                g_hr = (grad_recv[tab["halo_recv"]].reshape(g_hl.shape)
                        if grad_recv is not None else g_hl)
                fv_hl = phys_visc_flux(u_hl, g_hl,
                                       sel("delta_slot", tab["halo_l"]),
                                       sel("wdist_slot", tab["halo_l"]))
                fv_hr = phys_visc_flux(u_hr, g_hr,
                                       sel("delta_slot", tab["halo_l"]),
                                       sel("wdist_slot", tab["halo_l"]))
                if use_similarity:
                    # third exchange: the partner's extrapolated SGS flux
                    # (ref:src/mpi_inters.cpp:339-398 send_sgsf_fpts)
                    sim_recv = exchange(
                        simf_flat.reshape(flat.shape[0], nF * d), sends)
                    fv_hl = fv_hl + simf_flat[tab["halo_l"]]
                    if sim_recv is not None:
                        fv_hr = fv_hr + sim_recv[tab["halo_recv"]].reshape(
                            g_hl.shape)
                fn_halo = fn_halo + riemann.ldg_common_flux(
                    u_hl, u_hr, fv_hl, fv_hr,
                    norm_h, cfg.ldg_tau, cfg.ldg_beta)
                if n_bdy:
                    wm_kw = {}
                    if has_wm:
                        # wall-model input state from the owning block
                        # (ref:src/eles.cpp:4873-4903)
                        wm_state = jnp.zeros((n_bdy, nF), dtype=dtype)
                        for i in range(len(cts)):
                            cand = us[i][tab[f"wm_ele_{i}"],
                                         tab[f"wm_upt_{i}"]]
                            wm_state = jnp.where(
                                (tab["wm_ct"] == i)[:, None], cand,
                                wm_state)
                        wm_kw = dict(wm_state=wm_state,
                                     wm_dist=geo["wm_dist"])
                    fn_bdy = fn_bdy + bc_fns.visc_common_flux(
                        u_bl, grad_f[tab["bdy"]], norm_b, None, P=bcP,
                        ramp=ramp, **wm_kw)
            fn_all = jnp.concatenate([
                fn_int.reshape(-1, nF),
                fn_bdy.reshape(-1, nF) if n_bdy
                else jnp.zeros((0, nF), dtype=dtype),
                fn_halo.reshape(-1, nF)])
            ntc_flat = fn_all[tab["slot_src"]] \
                * (tab["slot_sign"] * geo["tdA"])[:, None]

            out = []
            for i, ct in enumerate(cts):
                b = B[ct]
                lo, hi = seg[ct]
                if cfg.over_int:
                    from ..solver.kernels import adj_apply
                    u_over = opmat(b.opp_over, us[i], dtype, prec)
                    tdisf = opmat_md(
                        b.over_filter,
                        adj_apply(geo[f"jginv_over_{ct}"],
                                  phys_flux(u_over)), dtype, prec)
                    if cfg.viscous:
                        fv = phys_visc_flux(
                            us[i], grad_u[i],
                            geo.get(f"delta_upts_{ct}"),
                            geo.get(f"wdist_upts_{ct}"))
                        tdisf = tdisf + adj_apply(
                            geo[f"jginv_upts_{ct}"], fv)
                    tdisf_cat = jnp.concatenate(
                        [tdisf[..., l] for l in range(d)], axis=1)
                else:
                    fl = phys_flux(us[i])
                    if cfg.viscous:
                        fl = fl + phys_visc_flux(
                            us[i], grad_u[i],
                            geo.get(f"delta_upts_{ct}"),
                            geo.get(f"wdist_upts_{ct}"))
                        if use_similarity:
                            fl = fl + simf_upts[i]
                    tdisf_cat = adj_apply_cat(geo[f"jginv_upts_{ct}"], fl)
                ntc = ntc_flat[lo:hi].reshape(E_loc[ct], b.n_fpts, nF)
                div = opmat(b.opp_div_all,
                            jnp.concatenate([tdisf_cat, ntc], axis=1),
                            dtype, prec)
                rhs = -div / geo[f"detjac_upts_{ct}"][..., None]
                if cfg.rans:
                    # SA source per block (ref:src/source.cpp:33-105)
                    from ..models.sa import sa_source
                    src = sa_source(
                        us[i], grad_u[i], geo[f"wdist_upts_{ct}"],
                        gamma=cfg.gamma, mu_inf=cfg.mu_inf,
                        rt_inf=cfg.rt_inf, c_sth=cfg.c_sth,
                        fix_vis=cfg.fix_vis, kappa=cfg.kappa,
                        c_v1=cfg.c_v1, c_v2=cfg.c_v2, c_v3=cfg.c_v3,
                        c_b1=cfg.c_b1, c_b2=cfg.c_b2, c_w2=cfg.c_w2,
                        c_w3=cfg.c_w3, omega=cfg.omega, n_dims=d)
                    rhs = rhs.at[..., d + 2].add(src)
                # zero the padding clones' rhs: they stay at their
                # (finite) initial state and never couple back
                out.append(rhs * geo[f"pad_{ct}"][..., None, None])
            return tuple(out)

        return residual

    # ------------------------------------------------------------------
    def _make_step(self):
        adv = self.p.adv_type
        residual = self._make_shard_residual()
        soa_res = self._residual_soa_shard
        n_types = len(self.cts)
        ps = lambda x: x
        if self.p.shock_cap:
            if soa_res is not None:
                from ..ops.stabilization import make_shock_capture_soa
                caps = {ct: make_shock_capture_soa(
                    self.ops_by_ct[ct], self.p.s0, self.p.expf_fac,
                    self.p.expf_order, self.p.expf_cutoff,
                    self.p.shock_det_field, self.n_dims, self.dtype)
                    for ct in self.cts}
                ps = lambda ut: tuple(caps[ct](u)
                                      for ct, u in zip(self.cts, ut))
            else:
                from ..ops.stabilization import make_shock_capture_fn
                caps = {ct: make_shock_capture_fn(
                    self.ops_by_ct[ct], self.p.s0, self.p.expf_fac,
                    self.p.expf_order, self.p.expf_cutoff,
                    self.p.shock_det_field, self.n_dims, self.dtype)
                    for ct in self.cts}
                ps = lambda ut: tuple(caps[ct](u)[0]
                                      for ct, u in zip(self.cts, ut))
        pre = None
        if self.p.LES and self.p.SGS_model == 3:
            from ..ops.les_filter import build_les_filter
            svv = {ct: jnp.asarray(build_les_filter(
                self.ops_by_ct[ct], self.p.filter_type,
                self.p.filter_ratio), dtype=self.dtype)
                for ct in self.cts}
            if soa_res is not None:
                pre = lambda ut: tuple(
                    jax.lax.dot_general(svv[ct], u,
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=self.dtype)
                    for ct, u in zip(self.cts, ut))
            else:
                pre = lambda ut: tuple(
                    jnp.einsum("ku,euf->ekf", svv[ct], u)
                    for ct, u in zip(self.cts, ut))

        def sq(tree):
            return jax.tree.map(lambda v: v[0], tree)

        forcing = self._forcing
        axis = self.axis
        dtype = self.dtype
        nF = self.n_fields
        d = self.n_dims
        cts = self.cts
        if forcing:
            bf_area = self.p.body_force_area
            bf_mdot0 = self.p.body_force_mdot0
            bf_type = self.p.body_force_type
            force_cts = list(self._force_cts)
            opp0 = {ct: jnp.asarray(self.ops_by_ct[ct].opp_0, dtype)
                    for ct in force_cts}
            Pf_ct = {ct: self.ops_by_ct[ct].n_fpts for ct in force_cts}
            prec = jax.lax.Precision[
                getattr(self.rcfg, "precision", "highest").upper()]

        has_ramp = self._has_ramp

        def shard_body(us, regs, dt, k, mdot_old, geo, tabs, sends, bcP):
            us = tuple(u[0] for u in us)
            regs = tuple(r[0] for r in regs)
            dt = dt[0] if dt.ndim else dt
            geo, tabs, sends, bcP = sq(geo), sq(tabs), sq(sends), sq(bcP)
            ramp = k.astype(us[0].dtype) if has_ramp else None

            bf = None
            if forcing:
                # bulk-momentum body force from the lax.psum-reduced
                # inflow-plane integrals, once per step from the
                # pre-step state (ref:src/eles.cpp:5281-5484)
                z = jnp.zeros((), us[0].dtype)
                mflux, rho_int = z, z
                for ct in force_cts:
                    i = cts.index(ct)
                    d2 = jnp.einsum(
                        "pu,euf->epf", opp0[ct], us[i], precision=prec,
                        preferred_element_type=us[i].dtype).reshape(
                            -1, nF)
                    uf = d2[tabs["force_row_%d" % ct]]
                    w = geo["force_w_%d" % ct]
                    mflux = mflux + jnp.sum(w * uf[:, 1])
                    rho_int = rho_int + jnp.sum(w * uf[:, 0])
                mflux = jax.lax.psum(mflux, axis)
                rho_int = jax.lax.psum(rho_int, axis)
                ubulk = jnp.where(rho_int == 0, 0.0, mflux / rho_int)
                if bf_type == 1:
                    bf1 = (bf_mdot0 - mflux) / (bf_area * dt)
                else:
                    bf1 = (bf_mdot0 - 2.0 * mflux + mdot_old) \
                        / (bf_area * dt)
                bf = jnp.zeros((nF,), us[0].dtype).at[1].set(bf1)
                bf = bf.at[d + 1].set(bf1 * ubulk)
                mdot_old = mflux

            if soa_res is not None:
                # whole step in the per-type (U_t, F, E_t) layout — one
                # transpose pair per step, like the single-type sharded
                # SoA path (sharding.py)
                us = tuple(jnp.transpose(u, (1, 2, 0)) for u in us)
                regs = tuple(jnp.transpose(r, (1, 2, 0)) for r in regs)

                def rhs(x):
                    return soa_res(x, geo, tabs, bcP, ramp=ramp)
            else:
                def rhs(x):
                    return residual(x, geo, tabs, sends, bcP, ramp=ramp)

            if bf is not None:
                rhs_core = rhs
                bf_add = bf[:, None] if soa_res is not None else bf
                rhs = lambda x: tuple(r + bf_add for r in rhs_core(x))

            tmap = jax.tree.map
            if pre is not None:
                us = pre(us)
            if adv == 0:
                us = ps(tmap(lambda u, k: u + dt * k, us, rhs(us)))
            elif adv == 1:     # SSP-RK24 (ref:src/eles.cpp:1117-1170)
                u0 = us
                for _ in range(3):
                    us = ps(tmap(lambda u, k: u + dt / 3.0 * k, us,
                                 rhs(us)))
                us = ps(tmap(lambda u, u0i, k: 0.75 * u + 0.25 * u0i
                             + dt / 4.0 * k, us, u0, rhs(us)))
            elif adv == 2:     # SSP-RK34 (ref:src/eles.cpp:1172-1220)
                u0 = us
                half = lambda u, k: u + dt / 2.0 * k
                us = ps(tmap(half, us, rhs(us)))
                us = ps(tmap(half, us, rhs(us)))
                us = ps(tmap(lambda u, u0i, k: u / 3.0 + 2.0 / 3.0 * u0i
                             + dt / 6.0 * k, us, u0, rhs(us)))
                us = ps(tmap(half, us, rhs(us)))
            elif adv in (3, 4):
                A = RK45_A if adv == 3 else RK414_A
                Bc = RK45_B if adv == 3 else RK414_B
                r = tmap(lambda x: x * 0.0, regs)
                for s_ in range(len(A)):
                    r = tmap(lambda ri, ki, a=A[s_]: a * ri + dt * ki,
                             r, rhs(us))
                    us = ps(tmap(lambda ui, ri, b=Bc[s_]: ui + b * ri,
                                 us, r))
                regs = r
            else:
                raise ValueError(f"adv_type {adv}")
            if soa_res is not None:
                us = tuple(jnp.transpose(u, (2, 0, 1)) for u in us)
                regs = tuple(jnp.transpose(r, (2, 0, 1)) for r in regs)
            return (tuple(u[None] for u in us),
                    tuple(r[None] for r in regs), mdot_old)

        from jax import shard_map

        def sharded_spec(tree):
            return jax.tree.map(
                lambda v: P(self.axis, *([None] * (v.ndim - 1))), tree)

        specs = (tuple(P(self.axis) for _ in range(n_types)),
                 tuple(P(self.axis) for _ in range(n_types)),
                 P(), P(), P(), sharded_spec(self.geo),
                 sharded_spec(self.tabs),
                 sharded_spec(self.send_idx), sharded_spec(self.bcP))
        out_specs = (tuple(P(self.axis) for _ in range(n_types)),
                     tuple(P(self.axis) for _ in range(n_types)), P())

        avg = self._avg
        if avg:
            avg_fields = list(self.p.average_fields)
            spinup = self.p.spinup_time

        def run_chunk(state, dt, n_steps, geo, tabs, sends, bcP):
            def body(carry, _):
                u, r, k, mdot, t_sim, ua = carry
                u, r, mdot = shard_map(shard_body, mesh=self.jmesh,
                                       in_specs=specs,
                                       out_specs=out_specs,
                                       check_vma=False)(u, r, dt, k, mdot,
                                                        geo, tabs, sends,
                                                        bcP)
                t_sim = t_sim + dt
                if avg:
                    # per-type running average on the sharded (S, El, U,
                    # F) blocks (elementwise: GSPMD keeps it
                    # collective-free; ref:src/eles.cpp:5676-5698)
                    new_ua = []
                    for ub, uab in zip(u, ua):
                        rho = ub[..., 0]
                        cols = []
                        for f_ in avg_fields:
                            if f_ == "rho_average":
                                cols.append(rho)
                            elif f_ == "u_average":
                                cols.append(ub[..., 1] / rho)
                            elif f_ == "v_average":
                                cols.append(ub[..., 2] / rho)
                            elif f_ == "w_average":
                                cols.append(ub[..., 3] / rho)
                            else:  # e_average
                                cols.append(ub[..., d + 1] / rho)
                        cur = jnp.stack(cols, axis=-1)
                        t_rel = t_sim - spinup
                        a = (t_rel - dt) / t_rel
                        b = dt / t_rel
                        new_ua.append(jnp.where(t_rel <= dt, cur,
                                                a * uab + b * cur))
                    ua = tuple(new_ua)
                return (u, r, k + 1, mdot, t_sim, ua), None
            state, _ = jax.lax.scan(body, state, None, length=n_steps)
            return state

        return run_chunk

    # ------------------------------------------------------------------
    def run(self, n_steps: int, dt: float):
        ua = self.u_avg if self.u_avg is not None \
            else jnp.zeros((), self.dtype)
        state = self._step_jit(
            (self.u, self.reg, self._iter_k, self._mdot_old, self._t_sim,
             ua),
            jnp.asarray(dt, self.dtype), n_steps,
            self.geo, self.tabs, self.send_idx, self.bcP)
        (self.u, self.reg, self._iter_k, self._mdot_old, self._t_sim,
         ua) = state
        if self._avg:
            self.u_avg = ua
        self.time += dt * n_steps
        return self.u

    def gather_u_avg(self):
        """Per-type time-averaged fields in the MixedSolver's (E_ct, U, K)
        layout (None unless the deck sets average_fields)."""
        if self.u_avg is None:
            return None
        out = []
        for ct, ua in zip(self.cts, self.u_avg):
            a = np.asarray(ua)
            a = a.reshape(-1, a.shape[2], a.shape[3])
            out.append(a[self.pad_ct[ct].reshape(-1) > 0])
        return tuple(out)

    def gather_u(self):
        """Per-type solutions in the MixedSolver's (E_ct, U, F) layout
        (padding clones dropped)."""
        out = []
        for ct, u in zip(self.cts, self.u):
            a = np.asarray(u)
            a = a.reshape(-1, a.shape[2], a.shape[3])
            out.append(a[self.pad_ct[ct].reshape(-1) > 0])
        return tuple(out)

    def scatter_u(self, us) -> None:
        """Inverse of gather_u: per-type global (E_ct, U, F) solutions
        onto the owner-sharded layout (clones replicate as at init)."""
        new = []
        for ct, u_dev, u_g in zip(self.cts, self.u, us):
            a = np.asarray(u_g)[self.owner_ct[ct].reshape(-1)]
            new.append(jax.device_put(
                jnp.asarray(a.reshape(u_dev.shape), self.dtype),
                u_dev.sharding))
        self.u = tuple(new)
