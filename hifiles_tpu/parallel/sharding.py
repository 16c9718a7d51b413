"""Multi-chip domain decomposition: shard_map + ppermute halo exchange.

TPU-native replacement of the reference's MPI layer
(ref:src/mpi_inters.cpp:218-398 send/receive_solution & gradients,
ref:src/mesh.cpp:72-313 ParMETIS partition):

  * elements are partitioned into equal per-chip blocks and the state array
    (E, U, F) is sharded on its element axis over a 1-D device mesh
  * faces whose two elements live on different chips become *halo faces*;
    each side computes the face flux itself from its own outward normal
    (exactly the reference's mpi_inters contract, where both ranks run the
    Riemann solve for their side)
  * the partner-side flux-point data travels by `lax.ppermute` ring shifts
    over ICI — one shift per neighbor offset, padded to equal counts so all
    shapes are static
  * reductions (dt min, residual norms) use lax.pmin / psum

Everything is built host-side in numpy, stacked with a leading shard axis,
and handed to `shard_map` as sharded operands.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..mesh.core import FaceConnectivity, MeshData, build_faces
from ..models.euler import inviscid_flux
from ..models.viscous import adv_diff_viscous_flux, viscous_flux
from ..ops import riemann
from ..solver.elements import (build_element_block, match_fpts,
                               match_fpts_grouped)
from ..solver.kernels import adj_apply_cat, adjT_apply, opmat, opmat_md
from ..solver.ics import initial_condition
from ..solver.residual import ResidualConfig
from ..solver.step import N_STAGES


@dataclasses.dataclass
class ShardTables:
    """Per-shard connectivity tables, stacked over the leading shard axis.

    fn layout per shard: [interior | boundary | halo] faces, each padded to
    the max count over shards; slot_src indexes into that concatenation.
    Padding faces are never referenced by slot_src, so they need no masks.
    """
    int_slot_l: np.ndarray    # (n, Fi_max, nfp)
    int_slot_r: np.ndarray
    bdy_slot: np.ndarray      # (n, Fb_max, nfp)
    bdy_bcid: np.ndarray      # (n, Fb_max) group id; 0 on padding rows
    bdy_mask: np.ndarray      # (n, Fb_max) 1 = real boundary face
    halo_slot_l: np.ndarray   # (n, Fh_max, nfp) local left slots
    halo_recv_idx: np.ndarray  # (n, Fh_max, nfp) index into concat recv bufs
    send_idx: dict            # offset -> (n, n_send_max) local slot ids
    slot_src: np.ndarray      # (n, S_loc)
    slot_sign: np.ndarray     # (n, S_loc)
    n_int: int
    n_bdy: int
    n_halo: int


def _contiguous_partition(n_eles: int, n_shards: int) -> np.ndarray:
    if n_eles % n_shards:
        raise ValueError(f"{n_eles} elements not divisible by {n_shards} "
                         f"shards (padding not implemented yet)")
    return np.repeat(np.arange(n_shards), n_eles // n_shards)


def graph_partition(conn: FaceConnectivity, n_cells: int,
                    n_shards: int) -> np.ndarray:
    """Balanced low-cut element partition from the face-adjacency graph
    (the reference calls ParMETIS for this, ref:src/geometry.cpp:1040-1200;
    here a greedy-BFS grower in native/mesh_kernels.cc hf_partition, with a
    numpy fallback)."""
    from ..solver import elements  # noqa: F401  (keeps import graph flat)
    from .. import native
    pairs = np.stack([conn.int_ele_l, conn.int_ele_r], axis=1)
    both = np.concatenate([pairs, pairs[:, ::-1]])
    order = np.argsort(both[:, 0], kind="stable")
    both = both[order]
    counts = np.bincount(both[:, 0], minlength=n_cells)
    xadj = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    adjncy = both[:, 1].astype(np.int64)
    part = native.partition_native(xadj, adjncy, n_shards)
    if part is None:
        # numpy fallback: the same greedy max-gain grower
        import heapq
        part = -np.ones(n_cells, dtype=np.int64)
        base, extra = divmod(n_cells, n_shards)
        for p in range(n_shards):
            target = base + (1 if p < extra else 0)
            filled = 0
            gain = np.zeros(n_cells, dtype=np.int64)
            heap: list[tuple[int, int]] = []

            def absorb(c, p=p):
                nonlocal filled
                part[c] = p
                filled += 1
                for nb in adjncy[xadj[c]:xadj[c + 1]]:
                    if part[nb] < 0:
                        gain[nb] += 1
                        heapq.heappush(heap, (-gain[nb], int(nb)))

            while filled < target:
                pick = -1
                while heap:
                    g, c = heapq.heappop(heap)
                    if part[c] < 0 and gain[c] == -g:
                        pick = c
                        break
                if pick < 0:
                    unass = np.where(part < 0)[0]
                    degs = [np.sum(part[adjncy[xadj[c]:xadj[c + 1]]] < 0)
                            for c in unass]
                    pick = int(unass[int(np.argmin(degs))])
                absorb(pick)
    # exact balance sanity
    sizes = np.bincount(part, minlength=n_shards)
    if sizes.max() - sizes.min() > 1:
        raise AssertionError(f"unbalanced partition: {sizes}")
    return part


def build_shard_tables(conn: FaceConnectivity, shard_of: np.ndarray,
                       n_shards: int, Pf: int,
                       n_fpts_per_face: np.ndarray, order: int,
                       perm: np.ndarray,
                       pos_fpts: np.ndarray | None = None) -> ShardTables:
    """Construct halo-aware per-shard slot tables.

    ``shard_of``/``perm``: element partition and the reordering such that
    shard s owns new-index elements [s*El, (s+1)*El).  Faces of different
    shapes (prisms) have different fpt counts; rows are padded to nfp_max
    with slot 0, never referenced through slot_src.
    """
    El = perm.size // n_shards
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    n_fpts_per_face = np.asarray(n_fpts_per_face, dtype=np.int64)
    fpt_off = np.concatenate([[0], np.cumsum(n_fpts_per_face)])
    nfp = int(n_fpts_per_face.max())      # row width (padded)

    def local_slots(e_old, locf, lut_perm=None):
        e_new = inv[e_old]
        s, e_loc = divmod(e_new, El)
        j = np.arange(int(n_fpts_per_face[locf])) if lut_perm is None \
            else lut_perm
        return s, e_loc * Pf + fpt_off[locf] + j

    def global_slots(e_old, locf):
        return (e_old * Pf + fpt_off[locf]
                + np.arange(int(n_fpts_per_face[locf])))

    pf_flat = pos_fpts.reshape(-1, pos_fpts.shape[-1])

    ints = [[] for _ in range(n_shards)]     # (slots_l, slots_r)
    bdys = [[] for _ in range(n_shards)]     # slots
    halos = [[] for _ in range(n_shards)]    # (slots_l, offset, partner_slots)

    gls = [global_slots(conn.int_ele_l[f], conn.int_locf_l[f])
           for f in range(conn.int_ele_l.size)]
    grs = [global_slots(conn.int_ele_r[f], conn.int_locf_r[f])
           for f in range(conn.int_ele_l.size)]
    luts = match_fpts_grouped(pf_flat, gls, grs)
    for f in range(conn.int_ele_l.size):
        lut = luts[f]
        s_l, sl = local_slots(conn.int_ele_l[f], conn.int_locf_l[f])
        s_r, sr = local_slots(conn.int_ele_r[f], conn.int_locf_r[f], lut)
        if s_l == s_r:
            ints[s_l].append((sl, sr))
        else:
            halos[s_l].append((sl, (s_l - s_r) % n_shards, sr))
            halos[s_r].append((sr, (s_r - s_l) % n_shards, sl))

    for f in range(conn.bdy_ele.size):
        s, sl = local_slots(conn.bdy_ele[f], conn.bdy_locf[f])
        bdys[s].append((sl, int(conn.bdy_bcid[f])))

    Fi = max(len(x) for x in ints) if any(ints) else 0
    Fb = max(len(x) for x in bdys) if any(bdys) else 0
    Fh = max(len(x) for x in halos) if any(halos) else 0
    offsets = sorted({o for h in halos for (_, o, _) in h})

    S_loc = El * Pf
    int_l = np.zeros((n_shards, Fi, nfp), dtype=np.int64)
    int_r = np.zeros((n_shards, Fi, nfp), dtype=np.int64)
    bdy = np.zeros((n_shards, Fb, nfp), dtype=np.int64)
    bdy_bcid = np.zeros((n_shards, Fb), dtype=np.int64)
    bdy_mask = np.zeros((n_shards, Fb))
    halo_l = np.zeros((n_shards, Fh, nfp), dtype=np.int64)
    halo_recv = np.zeros((n_shards, Fh, nfp), dtype=np.int64)
    slot_src = -np.ones((n_shards, S_loc), dtype=np.int64)
    slot_sign = np.zeros((n_shards, S_loc))

    # sends: for offset o, shard t sends to shard (t+o)%n the partner data
    # the receiver's halo faces (at offset o) reference, in receiver order
    send_lists = {o: [[] for _ in range(n_shards)] for o in offsets}
    recv_base = {}  # (s, o) -> start position in shard s's concat recv buf

    # first pass: per shard, group halo faces by offset to fix recv ordering
    halo_sorted = []
    for s in range(n_shards):
        by_off = {o: [] for o in offsets}
        for (sl, o, partner) in halos[s]:
            by_off[o].append((sl, partner))
        halo_sorted.append(by_off)

    # send counts must be uniform per offset (static shapes): compute maxima
    n_send_max = {o: max((sum(len(x[1]) for x in halo_sorted[s][o])
                          for s in range(n_shards)), default=0)
                  for o in offsets}

    for s in range(n_shards):
        # interior
        for k, (sl, sr) in enumerate(ints[s]):
            m = sl.size
            int_l[s, k, :m] = sl
            int_r[s, k, :m] = sr
            base = k * nfp + np.arange(m)
            slot_src[s, sl] = base
            slot_sign[s, sl] = 1.0
            slot_src[s, sr] = base
            slot_sign[s, sr] = -1.0
        # boundary
        for k, (sl, bid) in enumerate(bdys[s]):
            m = sl.size
            bdy[s, k, :m] = sl
            bdy_bcid[s, k] = bid
            bdy_mask[s, k] = 1.0
            base = (Fi + k) * nfp + np.arange(m)
            slot_src[s, sl] = base
            slot_sign[s, sl] = 1.0
        # halo: receiver side; sender (s-o)%n appends its partner slots
        k = 0
        pos_in_offset = {}
        cum = 0
        for o in offsets:
            pos_in_offset[o] = cum
            cum += n_send_max[o]
        recv_cursor = {o: 0 for o in offsets}
        for o in offsets:
            t = (s - o) % n_shards
            for (sl, partner) in halo_sorted[s][o]:
                m = sl.size
                halo_l[s, k, :m] = sl
                halo_recv[s, k, :m] = (pos_in_offset[o] + recv_cursor[o]
                                       + np.arange(m))
                recv_cursor[o] += m
                send_lists[o][t].extend(partner.tolist())
                base = (Fi + Fb + k) * nfp + np.arange(m)
                slot_src[s, sl] = base
                slot_sign[s, sl] = 1.0
                k += 1

    if np.any(slot_src < 0):
        raise AssertionError("uncovered slots in sharded tables")

    send_idx = {}
    for o in offsets:
        arr = np.zeros((n_shards, n_send_max[o]), dtype=np.int64)
        for t in range(n_shards):
            lst = send_lists[o][t]
            arr[t, :len(lst)] = lst
        send_idx[o] = arr

    return ShardTables(int_slot_l=int_l, int_slot_r=int_r, bdy_slot=bdy,
                       bdy_bcid=bdy_bcid, bdy_mask=bdy_mask,
                       halo_slot_l=halo_l, halo_recv_idx=halo_recv,
                       send_idx=send_idx, slot_src=slot_src,
                       slot_sign=slot_sign, n_int=Fi, n_bdy=Fb, n_halo=Fh)


class ShardedSolver:
    """Multi-device FR solver over a 1-D element-sharded jax Mesh."""

    def __init__(self, run_input, mesh_data: MeshData, devices=None,
                 dtype=jnp.float32, partition: np.ndarray | None = None,
                 axis_name: str = "x"):
        from ..utils import enable_persistent_cache
        enable_persistent_cache()
        from ..solver.solver import Solver  # reuse single-device setup

        self.axis = axis_name
        devices = devices if devices is not None else jax.devices()
        self.n_shards = len(devices)
        self.mesh = Mesh(np.array(devices), (axis_name,))
        self.p = run_input
        self.dtype = dtype

        if run_input.wall_model or any(
                getattr(b, "inlet_type", 0)
                for b in (run_input.bc_list or [])):
            raise NotImplementedError(
                "sharded runs: wall models / turbulent inlets not "
                "partitioned yet")
        # reuse the single-device setup for geometry/ops/conn
        base = Solver(run_input, mesh_data, dtype=dtype)
        self.base = base
        block, ops, conn = base.block, base.ops, base.conn
        E = block.n_eles
        self.rcfg = base.rcfg

        if isinstance(partition, str) and partition == "graph":
            partition = graph_partition(conn, E, self.n_shards)
        shard_of = (partition if partition is not None
                    else _contiguous_partition(E, self.n_shards))
        sizes = np.bincount(shard_of, minlength=self.n_shards)
        if not np.all(sizes == sizes[0]):
            raise ValueError(f"shards must be equal-sized, got {sizes}")
        order = np.argsort(shard_of, kind="stable")
        self.perm = order
        El = E // self.n_shards
        self.n_eles, self.El = E, El
        Pf = ops.n_fpts

        self.tables = build_shard_tables(
            conn, shard_of, self.n_shards, Pf, ops.n_fpts_per_face,
            ops.order, order,
            pos_fpts=block.pos_fpts.reshape(E, Pf, -1))

        # reorder per-element geometry into shard-major order and stack
        f = lambda a: jnp.asarray(a, dtype=dtype)
        self.geo = dict(
            detjac_upts=f(block.detjac_upts[order].reshape(
                self.n_shards, El, ops.n_upts)),
            jginv_upts=f(block.jginv_upts[order].reshape(
                self.n_shards, El, ops.n_upts, ops.n_dims, ops.n_dims)),
            tdA=f(block.tdA_fpts.reshape(E, Pf)[order].reshape(
                self.n_shards, El * Pf)),
            norm=f(block.norm_fpts.reshape(E, Pf, -1)[order].reshape(
                self.n_shards, El * Pf, ops.n_dims)),
            detjac_fpts=f(block.detjac_fpts.reshape(E, Pf)[order].reshape(
                self.n_shards, El * Pf)),
            jginv_fpts=f(block.jginv_fpts.reshape(E, Pf, ops.n_dims,
                                                  ops.n_dims)[order].reshape(
                self.n_shards, El * Pf, ops.n_dims, ops.n_dims)),
        )
        if run_input.LES or run_input.RANS:
            # LES cutoff length / wall distance per shard (the base Solver
            # already computed wall distances when the model needs them)
            from ..solver.residual import BlockArrays as _BA
            ba = _BA(block, dtype)
            self.geo["delta_upts"] = f(np.asarray(
                ba.delta_upts)[order].reshape(self.n_shards, El,
                                              ops.n_upts))
            self.geo["wdist_upts"] = f(np.asarray(
                ba.wdist_upts)[order].reshape(self.n_shards, El,
                                              ops.n_upts))
            self.geo["delta_slot"] = f(np.asarray(ba.delta_slot).reshape(
                E, Pf)[order].reshape(self.n_shards, El * Pf))
            self.geo["wdist_slot"] = f(np.asarray(ba.wdist_slot).reshape(
                E, Pf)[order].reshape(self.n_shards, El * Pf))
        self.opp = dict(
            opp_0=f(ops.opp_0), opp_2_cat=f(ops.opp_2_cat),
            opp_3=f(ops.opp_3), opp_div_fused=f(ops.opp_div_fused),
            tnorm=f(ops.tnorm_fpts),
            opp_2_stack=f(np.stack([ops.opp_2[g]
                                    for g in range(ops.n_dims)])),
            opp_5_stack=f(np.stack(
                [ops.opp_3 * ops.tnorm_fpts[None, :, g]
                 for g in range(ops.n_dims)])),
            opp_div_all=f(np.concatenate(
                [ops.opp_div_fused, ops.opp_3], axis=1)))

        i32 = lambda a: jnp.asarray(a, dtype=jnp.int32)
        t = self.tables
        self.tabs = dict(
            int_slot_l=i32(t.int_slot_l), int_slot_r=i32(t.int_slot_r),
            bdy_slot=i32(t.bdy_slot), halo_slot_l=i32(t.halo_slot_l),
            halo_recv_idx=i32(t.halo_recv_idx),
            slot_src=i32(t.slot_src), slot_sign=f(t.slot_sign))
        self.send_idx = {o: i32(v) for o, v in t.send_idx.items()}
        self.offsets = sorted(self.send_idx.keys())

        self.bc_fns = None
        self.bcP = {}
        if t.n_bdy:
            # partitioned BC parameter tables: the bc closures take their
            # shard's P rows as an explicit operand inside shard_map
            from ..solver.bc import _pack_params, make_bc_functions
            nfp = int(ops.n_fpts_per_face.max())
            self.bc_fns = make_bc_functions(run_input, block, self.rcfg,
                                            dtype)
            bcid = np.repeat(t.bdy_bcid[:, :, None], nfp, axis=2)
            P_np = _pack_params(run_input, bcid, ops.n_dims)  # (n,Fb,nfp,..)
            self.bcP = {k: jnp.asarray(
                v, dtype=dtype if k != "flag" else jnp.int32)
                for k, v in P_np.items()}

        # initial condition, shard-ordered
        u0 = initial_condition(run_input, block.pos_upts[order],
                               base.n_fields)
        sharding = NamedSharding(self.mesh, P(self.axis))
        self.u = jax.device_put(
            jnp.asarray(u0.reshape(self.n_shards, El, ops.n_upts,
                                   base.n_fields), dtype=dtype), sharding)
        self.reg = jnp.zeros_like(self.u)
        self._iter_k = jnp.asarray(1, jnp.int32)  # ref:src/input.cpp:377
        self.time = 0.0
        self.n_fields = base.n_fields

        self._residual_shard = self._make_shard_residual()
        self._step_jit = jax.jit(self._make_step(), static_argnums=2,
                                 donate_argnums=0)

    # ------------------------------------------------------------------
    def _make_shard_residual(self):
        """The per-shard residual body (runs inside shard_map).

        ``tab``/``sends`` are this shard's rows of the stacked tables —
        passed through shard_map as sharded operands, never captured."""
        cfg = self.rcfg
        dtype = self.dtype
        d = self.base.ops.n_dims
        U = self.base.ops.n_upts
        Pf = self.base.ops.n_fpts
        El = self.El
        nF = self.n_fields
        nfp = int(self.base.ops.n_fpts_per_face.max())
        axis = self.axis
        offsets = self.offsets
        n = self.n_shards
        n_bdy = self.tables.n_bdy
        prec = jax.lax.Precision[cfg.precision.upper()]
        opp = self.opp
        bc_fns = self.bc_fns

        def exchange(flat, sends):
            """ppermute halo exchange of per-slot data
            (the send_solution / send_corrected_gradient analog,
            ref:src/mpi_inters.cpp:218-338)."""
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

        use_similarity = cfg.les and cfg.sgs_model in (2, 4)
        if use_similarity:
            from ..ops.les_filter import build_les_filter
            les_filter = jnp.asarray(
                build_les_filter(self.base.ops, cfg.filter_type,
                                 cfg.filter_ratio), dtype=dtype)

        def phys_visc_flux(u, grad, delta=None, wdist=None):
            if cfg.equation == 0:
                fv = viscous_flux(
                    u, grad, gamma=cfg.gamma, prandtl=cfg.prandtl,
                    mu_inf=cfg.mu_inf, rt_inf=cfg.rt_inf, c_sth=cfg.c_sth,
                    fix_vis=cfg.fix_vis, n_dims=d, rans=cfg.rans,
                    prandtl_t=cfg.prandtl_t)
                # eddy-viscosity SGS models (ref:src/eles.cpp:2330-2361)
                if cfg.les and cfg.sgs_model in (0, 1, 2) \
                        and delta is not None:
                    from ..models.sgs import sgs_flux
                    fv = fv + sgs_flux(
                        u, grad, cfg.filter_ratio * delta, wdist,
                        sgs_model=cfg.sgs_model, C_s=cfg.C_s,
                        gamma=cfg.gamma, prandtl_t=cfg.prandtl_t, n_dims=d,
                        kappa=cfg.kappa)
                return fv
            return adv_diff_viscous_flux(grad, cfg.diff_coeff)

        def residual(u, geo, tab, sends, bcP, ramp=None):
            """u: (El, U, F) local block; geo/tab/sends/bcP: this shard's
            rows; ramp: traced iteration counter for BC ramping."""
            disu_f = jnp.einsum("pu,euf->epf", opp["opp_0"], u,
                                preferred_element_type=dtype, precision=prec)
            flat = disu_f.reshape(El * Pf, nF)

            u_l = flat[tab["int_slot_l"]]
            u_r = flat[tab["int_slot_r"]]
            norm_l = geo["norm"][tab["int_slot_l"]]

            halo_recv = exchange(flat, sends)
            u_hl = flat[tab["halo_slot_l"]]
            u_hr = halo_recv[tab["halo_recv_idx"]] if halo_recv is not None \
                else u_hl
            norm_h = geo["norm"][tab["halo_slot_l"]]
            if n_bdy:
                u_bl = flat[tab["bdy_slot"]]
                norm_b = geo["norm"][tab["bdy_slot"]]

            # similarity Leonard terms + the reference's third halo
            # exchange (send_sgsf_fpts, ref:src/mpi_inters.cpp:339-398)
            if use_similarity:
                from ..models.sgs import similarity_flux, similarity_terms
                Lu, Le = similarity_terms(u, les_filter, d)
                simf_upts = similarity_flux(u, Lu, Le, cfg.gamma, d)
                simf_f = opmat_md(opp["opp_0"], simf_upts, dtype,
                                  prec).reshape(El * Pf, nF * d)
                simf_recv = exchange(simf_f, sends)
                simf_hl = simf_f[tab["halo_slot_l"]].reshape(
                    u_hl.shape + (d,))
                simf_hr = (simf_recv[tab["halo_recv_idx"]].reshape(
                    simf_hl.shape) if simf_recv is not None else simf_hl)

            if cfg.viscous:
                tgrad = jnp.stack(
                    [opmat(opp["opp_2_stack"][g], u, dtype, prec)
                     for g in range(d)], axis=-1)
                u_c_int = riemann.ldg_common_solution(u_l, u_r, norm_l,
                                                      cfg.ldg_beta)
                u_c_halo = riemann.ldg_common_solution(u_hl, u_hr, norm_h,
                                                       cfg.ldg_beta)
                if n_bdy:
                    u_c_bdy = bc_fns.ldg_solution(
                        u_bl, norm_b, P=bcP, ramp=ramp).reshape(-1, nF)
                else:
                    u_c_bdy = jnp.zeros((0, nF), dtype=dtype)
                u_c_all = jnp.concatenate([
                    u_c_int.reshape(-1, nF), u_c_bdy,
                    u_c_halo.reshape(-1, nF)])
                delta = (u_c_all[tab["slot_src"]] - flat).reshape(El, Pf, nF)
                tgrad = tgrad + jnp.stack(
                    [opmat(opp["opp_5_stack"][g], delta, dtype, prec)
                     for g in range(d)], axis=-1)
                grad_u = adjT_apply(geo["jginv_upts"], tgrad,
                                    1.0 / geo["detjac_upts"])
                tgrad_f = opmat_md(opp["opp_0"], tgrad, dtype,
                                   prec).reshape(El * Pf, nF, d)
                grad_f = adjT_apply(geo["jginv_fpts"], tgrad_f,
                                    1.0 / geo["detjac_fpts"])
                grad_recv = exchange(grad_f.reshape(El * Pf, nF * d), sends)
                g_hl = grad_f[tab["halo_slot_l"]]
                g_hr = (grad_recv[tab["halo_recv_idx"]].reshape(
                    g_hl.shape) if grad_recv is not None else g_hl)

            f = phys_flux(u)
            if cfg.viscous:
                f = f + phys_visc_flux(
                    u, grad_u,
                    geo.get("delta_upts"), geo.get("wdist_upts"))
                if use_similarity:
                    f = f + simf_upts
            tdisf_cat = adj_apply_cat(geo["jginv_upts"], f)

            fn_int = common_inv_flux(u_l, u_r, norm_l)
            fn_halo = common_inv_flux(u_hl, u_hr, norm_h)
            if n_bdy:
                fn_bdy = bc_fns.inv_common_flux(u_bl, norm_b, P=bcP,
                                                ramp=ramp)
            if cfg.viscous:
                dsl = geo.get("delta_slot")
                wsl = geo.get("wdist_slot")
                sel = lambda a, idx: a[idx] if a is not None else None
                fv_l = phys_visc_flux(u_l, grad_f[tab["int_slot_l"]],
                                      sel(dsl, tab["int_slot_l"]),
                                      sel(wsl, tab["int_slot_l"]))
                fv_r = phys_visc_flux(u_r, grad_f[tab["int_slot_r"]],
                                      sel(dsl, tab["int_slot_r"]),
                                      sel(wsl, tab["int_slot_r"]))
                if use_similarity:
                    fv_l = fv_l + simf_f.reshape(El * Pf, nF, d)[
                        tab["int_slot_l"]]
                    fv_r = fv_r + simf_f.reshape(El * Pf, nF, d)[
                        tab["int_slot_r"]]
                fn_int = fn_int + riemann.ldg_common_flux(
                    u_l, u_r, fv_l, fv_r, norm_l, cfg.ldg_tau, cfg.ldg_beta)
                fv_hl = phys_visc_flux(u_hl, g_hl,
                                       sel(dsl, tab["halo_slot_l"]),
                                       sel(wsl, tab["halo_slot_l"]))
                # halo partner: its delta/wdist live on the other shard;
                # both sides of the TGV-type periodic meshes share the
                # cutoff scale, and the reference likewise evaluates the
                # partner SGS flux remotely and ships it (we ship simf,
                # eddy-viscosity uses the local-scale approximation)
                fv_hr = phys_visc_flux(u_hr, g_hr,
                                       sel(dsl, tab["halo_slot_l"]),
                                       sel(wsl, tab["halo_slot_l"]))
                if use_similarity:
                    fv_hl = fv_hl + simf_hl
                    fv_hr = fv_hr + simf_hr
                fn_halo = fn_halo + riemann.ldg_common_flux(
                    u_hl, u_hr, fv_hl, fv_hr, norm_h, cfg.ldg_tau,
                    cfg.ldg_beta)
                if n_bdy:
                    fn_bdy = fn_bdy + bc_fns.visc_common_flux(
                        u_bl, grad_f[tab["bdy_slot"]], norm_b, None,
                        P=bcP, ramp=ramp)

            fn_all = jnp.concatenate([
                fn_int.reshape(-1, nF),
                fn_bdy.reshape(-1, nF) if n_bdy
                else jnp.zeros((0, nF), dtype=dtype),
                fn_halo.reshape(-1, nF)])
            norm_tconf = (fn_all[tab["slot_src"]]
                          * (tab["slot_sign"] * geo["tdA"])[:, None]
                          ).reshape(El, Pf, nF)

            rhs_cat = jnp.concatenate([tdisf_cat, norm_tconf], axis=1)
            div = opmat(opp["opp_div_all"], rhs_cat, dtype, prec)
            rhs = -div / geo["detjac_upts"][..., None]
            if cfg.rans:
                from ..models.sa import sa_source
                src = sa_source(
                    u, grad_u, geo["wdist_upts"], gamma=cfg.gamma,
                    mu_inf=cfg.mu_inf, rt_inf=cfg.rt_inf, c_sth=cfg.c_sth,
                    fix_vis=cfg.fix_vis, kappa=cfg.kappa, c_v1=cfg.c_v1,
                    c_v2=cfg.c_v2, c_v3=cfg.c_v3, c_b1=cfg.c_b1,
                    c_b2=cfg.c_b2, c_w2=cfg.c_w2, c_w3=cfg.c_w3,
                    omega=cfg.omega, n_dims=d)
                rhs = rhs.at[..., d + 2].add(src)
            return rhs

        return residual

    # ------------------------------------------------------------------
    def _make_step(self):
        from ..solver.step import RK45_A, RK45_B, RK414_A, RK414_B
        adv = self.p.adv_type
        residual = self._residual_shard
        # shock capture after every stage + SVV pre-filter per step
        # (closures are shard-shape agnostic; ref:src/HiFiLES.cpp:211-218)
        post = self.base._post_stage
        ps = post if post is not None else (lambda x: x)
        pre = self.base._pre_step

        def sq(tree):
            return jax.tree.map(lambda v: v[0], tree)

        has_ramp = any(getattr(b, "pressure_ramp", 0)
                       for b in (self.p.bc_list or []))

        def shard_body(u, reg, dt, k, geo, tabs, sends, bcP):
            u = u[0]        # (1, El, ...) -> (El, ...)
            reg = reg[0]
            dt = dt[0] if dt.ndim else dt
            geo = sq(geo)
            tabs = sq(tabs)
            sends = sq(sends)
            bcP = sq(bcP)
            ramp = k.astype(u.dtype) if has_ramp else None

            def rhs(x):
                return residual(x, geo, tabs, sends, bcP, ramp)

            if pre is not None:
                u = pre(u)
            if adv == 0:
                u = ps(u + dt * rhs(u))
            elif adv == 1:
                u0 = u
                for _ in range(3):
                    u = ps(u + dt / 3.0 * rhs(u))
                u = ps(0.75 * u + 0.25 * u0 + dt / 4.0 * rhs(u))
            elif adv == 2:
                u0 = u
                u = ps(u + dt / 2.0 * rhs(u))
                u = ps(u + dt / 2.0 * rhs(u))
                u = ps(u / 3.0 + 2.0 / 3.0 * u0 + dt / 6.0 * rhs(u))
                u = ps(u + dt / 2.0 * rhs(u))
            elif adv in (3, 4):
                A = RK45_A if adv == 3 else RK414_A
                Bc = RK45_B if adv == 3 else RK414_B
                r = reg * 0.0
                for s_ in range(len(A)):
                    r = A[s_] * r + dt * rhs(u)
                    u = ps(u + Bc[s_] * r)
                reg = r
            return u[None], reg[None]

        from jax import shard_map

        def sharded_spec(tree):
            return jax.tree.map(
                lambda v: P(self.axis, *([None] * (v.ndim - 1))), tree)

        specs = (P(self.axis), P(self.axis), P(), P(),
                 sharded_spec(self.geo), sharded_spec(self.tabs),
                 sharded_spec(self.send_idx), sharded_spec(self.bcP))

        def step_shard(u, reg, dt, k, geo, tabs, sends, bcP):
            return shard_map(
                shard_body, mesh=self.mesh, in_specs=specs,
                out_specs=(P(self.axis), P(self.axis)),
                check_vma=False)(u, reg, dt, k, geo, tabs, sends, bcP)

        def run_chunk(state, dt, n_steps, geo, tabs, sends, bcP):
            def body(carry, _):
                u, r, k = carry
                u, r = step_shard(u, r, dt, k, geo, tabs, sends, bcP)
                return (u, r, k + 1), None
            state, _ = jax.lax.scan(body, state, None, length=n_steps)
            return state

        return run_chunk

    # ------------------------------------------------------------------
    def run(self, n_steps: int, dt: float):
        state = self._step_jit(
            (self.u, self.reg, self._iter_k),
            jnp.asarray(dt, self.dtype), n_steps,
            self.geo, self.tabs, self.send_idx, self.bcP)
        self.u, self.reg, self._iter_k = state
        self.time += dt * n_steps
        return self.u

    def gather_u(self) -> np.ndarray:
        """Solution in the original element ordering (E, U, F)."""
        u = np.asarray(self.u).reshape(self.n_eles, -1, self.n_fields)
        out = np.empty_like(u)
        out[self.perm] = u
        return out

    # ------------------------------------------------------------------
    # checkpoint/resume: the same rank-count-independent HDF5 layout as
    # single-device runs, keyed by global element id (the survey's
    # "sharded checkpoint keyed by global element ID";
    # ref:src/output.cpp:1822-1914 global-index hyperslabs)
    def save_checkpoint(self, directory: str, step: int) -> str:
        from ..io.restart import write_restart

        class _View:
            u = self.gather_u()
            mesh = self.base.mesh
            ops = self.base.ops
            time = self.time
            p = self.p
        return write_restart(directory, _View(), step=step)

    def load_checkpoint(self, path: str) -> float:
        from ..io.restart import read_restart

        class _View:
            mesh = self.base.mesh
            ops = self.base.ops
            p = self.p
            dtype = self.dtype
            n_fields = self.n_fields
        v = _View()
        t = read_restart(path, v)
        u = np.asarray(v.u)
        self.u = jax.device_put(
            jnp.asarray(u[self.perm].reshape(self.u.shape), self.dtype),
            self.u.sharding)
        self.time = t
        return t
