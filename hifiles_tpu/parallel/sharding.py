"""Multi-chip domain decomposition: shard_map + ppermute halo exchange.

TPU-native replacement of the reference's MPI layer
(ref:src/mpi_inters.cpp:218-398 send/receive_solution & gradients,
ref:src/mesh.cpp:72-313 ParMETIS partition):

  * elements are partitioned into near-balanced per-chip blocks (padded
    with frozen clone elements when counts are unequal) and the state
    array (E, U, F) is sharded on its element axis over a 1-D device mesh
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
from ..models.euler import inviscid_flux, max_wavespeed
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
    bdy_face: np.ndarray      # (n, Fb_max) original boundary-face index
    halo_slot_l: np.ndarray   # (n, Fh_max, nfp) local left slots
    halo_recv_idx: np.ndarray  # (n, Fh_max, nfp) index into concat recv bufs
    send_idx: dict            # offset -> (n, n_send_max) local slot ids
    slot_src: np.ndarray      # (n, S_loc)
    slot_sign: np.ndarray     # (n, S_loc)
    n_int: int
    n_bdy: int
    n_halo: int
    # per-shard REAL face counts (rows beyond them are padding)
    n_int_s: np.ndarray = None    # (n,)
    n_bdy_s: np.ndarray = None
    # per-shard halo faces in receive order: (local slots row, offset)
    halo_faces_s: list = None


def _contiguous_partition(n_eles: int, n_shards: int) -> np.ndarray:
    """Near-balanced contiguous chunks; the first ``n_eles % n_shards``
    shards get one extra element.  Shards below the max size are padded
    with clone elements by the solver (the reference's ParMETIS partition
    is likewise only near-balanced, ref:src/mesh.cpp:169)."""
    base, extra = divmod(n_eles, n_shards)
    sizes = base + (np.arange(n_shards) < extra)
    return np.repeat(np.arange(n_shards), sizes)


def _spectral_partition(conn, n_cells: int, n_shards: int):
    """Recursive spectral bisection on the element-adjacency Laplacian
    (Fiedler-vector median splits) — measured 1.8x lower edge cut than the
    greedy grower on the reference cylinder mesh (120 vs 221 of 1051
    interior faces, 8 parts).  Exact ±1 balance via proportional split
    sizes.  Returns None when scipy or the eigensolver fails."""
    try:
        import scipy.sparse as sp
        import scipy.sparse.linalg as spl
    except Exception:                         # pragma: no cover
        return None
    rows = np.concatenate([conn.int_ele_l, conn.int_ele_r])
    cols = np.concatenate([conn.int_ele_r, conn.int_ele_l])
    A = sp.coo_matrix((np.ones(rows.size), (rows, cols)),
                      shape=(n_cells, n_cells)).tocsr()
    base, extra = divmod(n_cells, n_shards)
    targets = base + (np.arange(n_shards) < extra)

    part = np.empty(n_cells, dtype=np.int64)

    def split(idx, p0, p1):
        """Assign parts [p0, p1) to the cells idx."""
        if p1 - p0 == 1:
            part[idx] = p0
            return
        nh = (p1 - p0) // 2
        h = int(targets[p0:p0 + nh].sum())
        k = idx.size
        if k <= 2:
            order = np.arange(k)
        else:
            sub = A[idx][:, idx]
            deg = np.asarray(sub.sum(1)).ravel()
            L = sp.diags(deg) - sub
            try:
                # deterministic start vector: ARPACK's default v0 draws
                # from the GLOBAL numpy RNG, making the partition depend
                # on unrelated earlier np.random use (and the Fiedler
                # direction is degenerate on symmetric meshes)
                v0 = np.random.default_rng(k).standard_normal(k)
                vals, vecs = spl.eigsh(L.asfptype(), k=2, which="SM",
                                       tol=1e-6, maxiter=5000, v0=v0)
                order = np.argsort(vecs[:, np.argsort(vals)[1]])
            except Exception:                 # pragma: no cover
                order = np.arange(k)          # degenerate: id split
        split(idx[order[:h]], p0, p0 + nh)
        split(idx[order[h:]], p0 + nh, p1)

    try:
        split(np.arange(n_cells), 0, n_shards)
    except Exception:                         # pragma: no cover
        return None
    return part


def graph_partition(conn: FaceConnectivity, n_cells: int,
                    n_shards: int) -> np.ndarray:
    """Balanced low-cut element partition from the face-adjacency graph
    (the reference calls ParMETIS for this, ref:src/geometry.cpp:1040-1200).
    Recursive spectral bisection when scipy is present, else a greedy-BFS
    grower (native/mesh_kernels.cc hf_partition, with a numpy fallback);
    both get a Kernighan-Lin move/swap refinement pass."""
    from ..solver import elements  # noqa: F401  (keeps import graph flat)
    from .. import native
    pairs = np.stack([conn.int_ele_l, conn.int_ele_r], axis=1)
    both = np.concatenate([pairs, pairs[:, ::-1]])
    order = np.argsort(both[:, 0], kind="stable")
    both = both[order]
    counts = np.bincount(both[:, 0], minlength=n_cells)
    xadj = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    adjncy = both[:, 1].astype(np.int64)
    part = _spectral_partition(conn, n_cells, n_shards)
    if part is None:
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
    part = _refine_partition(xadj, adjncy, np.asarray(part), n_shards)
    # never do worse than the KL-refined contiguous split (the spectral
    # seed can land in a bad local optimum on degenerate symmetric meshes)
    cut = np.sum(part[conn.int_ele_l] != part[conn.int_ele_r])
    contig = _refine_partition(xadj, adjncy,
                               _contiguous_partition(n_cells, n_shards),
                               n_shards)
    if np.sum(contig[conn.int_ele_l] != contig[conn.int_ele_r]) < cut:
        part = contig
    # exact balance sanity
    sizes = np.bincount(part, minlength=n_shards)
    if sizes.max() - sizes.min() > 1:
        raise AssertionError(f"unbalanced partition: {sizes}")
    return part


def _refine_partition(xadj, adjncy, part, n_shards, max_passes=20):
    """Kernighan-Lin-style refinement: single moves with positive cut gain
    (balance permitting) plus balance-preserving pairwise swaps across cut
    edges — the quality pass ParMETIS performs after its initial
    partition.  Host-side one-time cost, O(passes * cut)."""
    n = part.size
    sizes = np.bincount(part, minlength=n_shards)
    lo, hi = n // n_shards, -(-n // n_shards)
    edge_src = np.repeat(np.arange(n), np.diff(xadj))

    def move_gain(c, dst):
        """Cut reduction from moving c to part dst."""
        nbp = part[adjncy[xadj[c]:xadj[c + 1]]]
        return int(np.sum(nbp == dst)) - int(np.sum(nbp == part[c]))

    for _ in range(max_passes):
        moved = False
        # On big meshes, restrict both loops to cut-front elements: a pass
        # becomes O(cut * deg), not O(N * deg) (a 1e5+-element full sweep
        # would take minutes of one-time host setup).  Interior elements
        # have no foreign neighbors so they can never move anyway; the
        # only difference is that elements becoming frontal mid-pass wait
        # for the next pass.  Small meshes keep the full sweep (measured
        # slightly better local optima there).
        if n > 20000:
            front = np.unique(edge_src[part[edge_src] != part[adjncy]])
        else:
            front = range(n)
        # 1. positive-gain single moves (balance permitting)
        for c in front:
            pc = part[c]
            nbrs = adjncy[xadj[c]:xadj[c + 1]]
            nbp = part[nbrs]
            if nbp.size == 0 or (nbp == pc).all():
                continue
            for dst in np.unique(nbp[nbp != pc]):
                if (sizes[pc] > lo and sizes[dst] < hi
                        and move_gain(c, int(dst)) > 0):
                    part[c] = int(dst)
                    sizes[pc] -= 1
                    sizes[int(dst)] += 1
                    moved = True
                    break
        # 2. balance-preserving pairwise swaps across the current cut
        for a in front:
            pa = part[a]
            nbrs_a = adjncy[xadj[a]:xadj[a + 1]]
            for b in nbrs_a:
                pb = part[b]
                if pb == pa:
                    continue
                # swap a->pb, b->pa; the shared edge stays cut either way,
                # but move_gain counts it as gained on both sides: -2
                g = move_gain(a, pb) + move_gain(int(b), pa) - 2
                if g > 0:
                    part[a], part[b] = pb, pa
                    moved = True
                    break
        if not moved:
            break
    return part


def build_shard_tables(conn: FaceConnectivity, shard_of: np.ndarray,
                       n_shards: int, Pf: int,
                       n_fpts_per_face: np.ndarray, order: int,
                       loc_of: np.ndarray, El: int,
                       pos_fpts: np.ndarray | None = None) -> ShardTables:
    """Construct halo-aware per-shard slot tables.

    ``shard_of``/``loc_of``: per-element shard id and local index within the
    shard; ``El`` is the (max, padded) per-shard block size.  Local indices
    in [sizes[s], El) are padding clones with no faces — their slots get
    slot_sign 0, so they receive no face correction.  Faces of different
    shapes (prisms) have different fpt counts; rows are padded to nfp_max
    with slot 0, never referenced through slot_src.
    """
    sizes = np.bincount(shard_of, minlength=n_shards)
    n_fpts_per_face = np.asarray(n_fpts_per_face, dtype=np.int64)
    fpt_off = np.concatenate([[0], np.cumsum(n_fpts_per_face)])
    nfp = int(n_fpts_per_face.max())      # row width (padded)

    def local_slots(e_old, locf, lut_perm=None):
        s, e_loc = int(shard_of[e_old]), int(loc_of[e_old])
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
        bdys[s].append((sl, int(conn.bdy_bcid[f]), f))

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
    bdy_face = np.zeros((n_shards, Fb), dtype=np.int64)
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
        for k, (sl, bid, fidx) in enumerate(bdys[s]):
            m = sl.size
            bdy[s, k, :m] = sl
            bdy_bcid[s, k] = bid
            bdy_mask[s, k] = 1.0
            bdy_face[s, k] = fidx
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

    # padding-clone slots (local element index >= sizes[s]) have no faces:
    # point them at entry 0 with sign 0 so they gather zero correction
    for s in range(n_shards):
        pad_lo = int(sizes[s]) * Pf
        pad = slot_src[s, pad_lo:]
        if np.any(slot_src[s, :pad_lo] < 0):
            raise AssertionError("uncovered slots in sharded tables")
        slot_src[s, pad_lo:] = np.where(pad < 0, 0, pad)

    send_idx = {}
    for o in offsets:
        arr = np.zeros((n_shards, n_send_max[o]), dtype=np.int64)
        for t in range(n_shards):
            lst = send_lists[o][t]
            arr[t, :len(lst)] = lst
        send_idx[o] = arr

    return ShardTables(int_slot_l=int_l, int_slot_r=int_r, bdy_slot=bdy,
                       bdy_bcid=bdy_bcid, bdy_mask=bdy_mask,
                       bdy_face=bdy_face,
                       halo_slot_l=halo_l, halo_recv_idx=halo_recv,
                       send_idx=send_idx, slot_src=slot_src,
                       slot_sign=slot_sign, n_int=Fi, n_bdy=Fb, n_halo=Fh,
                       n_int_s=np.array([len(x) for x in ints]),
                       n_bdy_s=np.array([len(x) for x in bdys]),
                       halo_faces_s=[
                           [(sl, o, partner) for o in offsets
                            for (sl, partner) in halo_sorted[s][o]]
                           for s in range(n_shards)])


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
        El = int(sizes.max())
        # owner[s, i] = original element id of shard s's i-th local slot;
        # shards below El are padded with clones of their first element
        # (finite geometry + state; zero face correction via slot_sign 0)
        order = np.argsort(shard_of, kind="stable")
        loc_of = np.empty(E, dtype=np.int64)
        owner = np.empty((self.n_shards, El), dtype=np.int64)
        pad_mask = np.zeros((self.n_shards, El))
        off = 0
        for s in range(self.n_shards):
            mine = order[off:off + sizes[s]]
            off += sizes[s]
            loc_of[mine] = np.arange(sizes[s])
            owner[s, :sizes[s]] = mine
            owner[s, sizes[s]:] = mine[0] if sizes[s] else 0
            pad_mask[s, :sizes[s]] = 1.0
        self.owner = owner
        self.pad_mask = pad_mask
        self.sizes = sizes
        owner_flat = owner.reshape(-1)
        # original-element index per (padded) shard slot: u0[perm] scatters
        # a full-mesh array into the sharded layout (clones included)
        self.perm = owner_flat
        self.n_eles, self.El = E, El
        Pf = ops.n_fpts

        self.tables = build_shard_tables(
            conn, shard_of, self.n_shards, Pf, ops.n_fpts_per_face,
            ops.order, loc_of, El,
            pos_fpts=block.pos_fpts.reshape(E, Pf, -1))

        # reorder per-element geometry into shard-major (padded) order
        f = lambda a: jnp.asarray(a, dtype=dtype)
        self.geo = dict(
            detjac_upts=f(block.detjac_upts[owner_flat].reshape(
                self.n_shards, El, ops.n_upts)),
            jginv_upts=f(block.jginv_upts[owner_flat].reshape(
                self.n_shards, El, ops.n_upts, ops.n_dims, ops.n_dims)),
            tdA=f(block.tdA_fpts.reshape(E, Pf)[owner_flat].reshape(
                self.n_shards, El * Pf)),
            norm=f(block.norm_fpts.reshape(E, Pf, -1)[owner_flat].reshape(
                self.n_shards, El * Pf, ops.n_dims)),
            detjac_fpts=f(block.detjac_fpts.reshape(
                E, Pf)[owner_flat].reshape(self.n_shards, El * Pf)),
            jginv_fpts=f(block.jginv_fpts.reshape(
                E, Pf, ops.n_dims, ops.n_dims)[owner_flat].reshape(
                self.n_shards, El * Pf, ops.n_dims, ops.n_dims)),
            h_ref=f(block.h_ref[owner_flat].reshape(self.n_shards, El)),
            pad_mask=f(pad_mask),
        )
        if run_input.LES or run_input.RANS:
            # LES cutoff length / wall distance per shard (the base Solver
            # already computed wall distances when the model needs them)
            from ..solver.residual import BlockArrays as _BA
            ba = _BA(block, dtype)
            self.geo["delta_upts"] = f(np.asarray(
                ba.delta_upts)[owner_flat].reshape(self.n_shards, El,
                                                   ops.n_upts))
            self.geo["wdist_upts"] = f(np.asarray(
                ba.wdist_upts)[owner_flat].reshape(self.n_shards, El,
                                                   ops.n_upts))
            self.geo["delta_slot"] = f(np.asarray(ba.delta_slot).reshape(
                E, Pf)[owner_flat].reshape(self.n_shards, El * Pf))
            self.geo["wdist_slot"] = f(np.asarray(ba.wdist_slot).reshape(
                E, Pf)[owner_flat].reshape(self.n_shards, El * Pf))
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
            # padding rows (bdy_mask 0) carry group-0 params; they are
            # computed but never gathered through slot_src
            P_np["use_wm"] = P_np["use_wm"] * t.bdy_mask[:, :, None]
            self.bcP = {k: jnp.asarray(
                v, dtype=dtype if k != "flag" else jnp.int32)
                for k, v in P_np.items()}
            self._P_np = P_np

        # wall-model input points, shard-local (the input point is a
        # solution point of the face's own element, so the tables are
        # per-shard gathers with no extra exchange;
        # ref:src/eles.cpp:4873-4903, ref:src/bdy_inters.cpp:1095-1131)
        self.has_wm = bool(run_input.wall_model) and t.n_bdy \
            and bool(np.any(P_np["use_wm"] > 0))
        if self.has_wm:
            from ..solver.bc import build_wm_tables
            use_wm_face = np.array(
                [run_input.bc_list[int(b)].use_wm
                 for b in block.bdy_bcid], dtype=np.float64)
            wm_ele_g, wm_upt_g, wm_dist_g = build_wm_tables(block,
                                                            use_wm_face)
            Fb = t.bdy_face.shape[1]
            wm_ele = np.zeros((self.n_shards, Fb), dtype=np.int64)
            wm_upt = np.zeros((self.n_shards, Fb), dtype=np.int64)
            wm_dist = np.ones((self.n_shards, Fb))
            for s in range(self.n_shards):
                for k in range(Fb):
                    if t.bdy_mask[s, k] <= 0:
                        continue
                    fg = int(t.bdy_face[s, k])
                    if use_wm_face[fg] <= 0:
                        continue
                    assert shard_of[wm_ele_g[fg]] == s
                    wm_ele[s, k] = loc_of[wm_ele_g[fg]]
                    wm_upt[s, k] = wm_upt_g[fg]
                    wm_dist[s, k] = wm_dist_g[fg]
            self.tabs["wm_ele"] = i32(wm_ele)
            self.tabs["wm_upt"] = i32(wm_upt)
            self.geo["wm_dist"] = f(wm_dist)

        # turbulent inlet (white noise / SEM), partitioned: per-shard
        # inlet-face tables + replicated eddy state; the plane reductions
        # go through lax.psum inside the core (the reference's
        # MPI_Allreduce, ref:src/bdy_inters.cpp:2059-2101, :1891-1990)
        self._ti_core = None
        self._ti_state = ()
        self.tiP = {}
        if base.turb_inlet is not None:
            from ..solver.bc import _pack_params as _pp
            from ..solver.turb_inlet import inlet_host_setup, make_fluc_core
            c = inlet_host_setup(run_input, block, seed=0)
            Fb_s = t.bdy_face.shape[1]
            row_of = {}
            for s in range(self.n_shards):
                for k in range(Fb_s):
                    if t.bdy_mask[s, k] > 0:
                        row_of[int(t.bdy_face[s, k])] = (s, k)
            per = [[] for _ in range(self.n_shards)]
            for j, fg in enumerate(c.in_faces):
                s, k = row_of[int(fg)]
                per[s].append((j, k))
            Fin = max(1, max(len(x) for x in per))
            nfp = t.bdy_slot.shape[2]
            # pad rows point out of range; the fluc scatter drops them
            ti_row = np.full((self.n_shards, Fin), Fb_s, dtype=np.int64)
            ti_gidx = np.zeros((self.n_shards, Fin), dtype=np.int64)
            ti_pos3 = np.zeros((self.n_shards, Fin, nfp, 3))
            ti_wdA = np.zeros((self.n_shards, Fin, nfp))
            ti_mask = np.zeros((self.n_shards, Fin, nfp))
            ti_norm = np.zeros((self.n_shards, Fin, nfp, ops.n_dims))
            bcid_in = np.zeros((self.n_shards, Fin, nfp), dtype=np.int64)
            for s in range(self.n_shards):
                for i, (j, k) in enumerate(per[s]):
                    ti_row[s, i] = k
                    ti_gidx[s, i] = j
                    ti_pos3[s, i] = c.pos3[j]
                    ti_wdA[s, i] = c.wdA[j]
                    ti_mask[s, i] = c.mask[j]
                    ti_norm[s, i] = c.norm[j]
                    bcid_in[s, i] = t.bdy_bcid[s, k]
            self.tabs["ti_row"] = i32(ti_row)
            self.tabs["ti_gidx"] = i32(ti_gidx)
            self.geo["ti_pos3"] = f(ti_pos3)
            self.geo["ti_wdA"] = f(ti_wdA)
            self.geo["ti_mask"] = f(ti_mask)
            self.geo["ti_norm"] = f(ti_norm)
            self.tiP = {k_: jnp.asarray(
                v, dtype=dtype if k_ != "flag" else jnp.int32)
                for k_, v in _pp(run_input, bcid_in, ops.n_dims).items()}
            self._ti_core = make_fluc_core(c, self.bc_fns, dtype,
                                           psum_axis=self.axis)
            self._ti_state = (f(c.eddy0), f(c.sgn0),
                              jax.random.PRNGKey(c.seed))
        # inlet metadata for the SEM sidecar restart (io/restart.py)
        self.turb_inlet = base.turb_inlet

        # initial condition, shard-ordered (padding clones included)
        u0 = initial_condition(run_input, block.pos_upts[owner_flat],
                               base.n_fields)
        sharding = NamedSharding(self.mesh, P(self.axis))
        self.u = jax.device_put(
            jnp.asarray(u0.reshape(self.n_shards, El, ops.n_upts,
                                   base.n_fields), dtype=dtype), sharding)
        self.reg = jnp.zeros_like(self.u)
        self._iter_k = jnp.asarray(1, jnp.int32)  # ref:src/input.cpp:377
        self.time = 0.0
        self.n_fields = base.n_fields

        # body forcing (channel/hill bulk-momentum source): per-shard
        # inflow-plane fpt rows + lax.psum plane integrals — the
        # reference's globally reduced inflow mass flux
        # (ref:src/eles.cpp:5281-5484 evaluate_body_force)
        self._forcing = bool(getattr(base, "_forcing", False))
        if self._forcing:
            Pf_ = ops.n_fpts
            pm_flat = pad_mask.reshape(-1)
            inv = {}
            for i, g in enumerate(owner_flat):
                if pm_flat[i] > 0:
                    inv[int(g)] = i
            per = [[] for _ in range(self.n_shards)]
            for fs, w in zip(base._force_slots, base._force_wdA):
                i = inv[int(fs // Pf_)]
                per[i // El].append(((i % El) * Pf_ + int(fs % Pf_),
                                     float(w)))
            Ns = max(1, max(len(x) for x in per))
            # padded rows gather element 0 with weight 0 (excluded sums)
            frow = np.zeros((self.n_shards, Ns), dtype=np.int64)
            fw = np.zeros((self.n_shards, Ns))
            for s in range(self.n_shards):
                for j, (r_, w_) in enumerate(per[s]):
                    frow[s, j] = r_
                    fw[s, j] = w_
            self.tabs["force_row"] = i32(frow)
            self.geo["force_wdA"] = f(fw)
        self._mdot_old = jnp.asarray(
            run_input.body_force_mdot0 if self._forcing else 0.0, dtype)

        # running time averages (ref:src/eles.cpp:5630-5700), sharded
        # like the state; padding clones carry junk that gather drops
        self._avg = bool(run_input.average_fields)
        self.u_avg = None
        if self._avg:
            for f_ in run_input.average_fields:
                if f_ not in ("rho_average", "u_average", "v_average",
                              "w_average", "e_average"):
                    raise ValueError(f"unknown average field '{f_}'")
            self.u_avg = jax.device_put(
                jnp.zeros((self.n_shards, El, ops.n_upts,
                           len(run_input.average_fields)), dtype), sharding)
        self._t_sim = jnp.asarray(0.0, dtype)

        self._residual_shard = self._make_shard_residual()

        # SoA (U, F, El) fast path inside shard_map (soa_sharding.py):
        # covers the feature physics since round 4 (LES eddy+similarity,
        # over-integration, SA-RANS, wall models, SEM inlets; shock
        # capture / SVV run as SoA post/pre stages) — same coverage as
        # the single-device SoA residual.  RANS+HLLC stays on the slot
        # path (HLLC star states carry no SA field).
        self._residual_soa_shard = None
        import os as _os
        cfg = self.rcfg
        if (not _os.environ.get("HIFILES_NO_SOA") and cfg.fused
                and not (cfg.rans
                         and cfg.riemann_solve_type == riemann.HLLC)
                and not (cfg.over_int and block.jginv_over is None)
                and (cfg.equation != 0
                     or self.n_fields == ops.n_dims
                     + (3 if cfg.rans else 2))):
            from .soa_sharding import (build_soa_shard_tables,
                                       make_shard_residual_soa)
            out = build_soa_shard_tables(block, self.tables, owner_flat,
                                         self.n_shards, El, self.n_fields,
                                         self.offsets, sizes=self.sizes)
            if out is not None:
                meta, tabS_np, geoS_np = out
                for k, v in tabS_np.items():
                    self.tabs["soa_" + k] = i32(v)
                for k, v in geoS_np.items():
                    self.geo["soa_" + k] = f(v)
                if cfg.over_int:
                    self.geo["jginv_over"] = f(
                        block.jginv_over[owner_flat].reshape(
                            (self.n_shards, El) + block.jginv_over.shape[1:]))
                    self.opp["opp_over"] = f(block.opp_over)
                    self.opp["over_filter"] = f(block.over_filter)
                if self.has_wm:
                    self.tabs["soa_wm_ele"] = self.tabs["wm_ele"]
                    self.tabs["soa_wm_upt"] = self.tabs["wm_upt"]
                    self.geo["soa_wm_dist"] = self.geo["wm_dist"]
                self._residual_soa_shard = make_shard_residual_soa(
                    self, meta)
        from ..utils import log_residual_path
        self.run_path = ("sharded SoA (fast)"
                         if self._residual_soa_shard is not None
                         else "sharded slot (fallback, up to 20x slower)")
        log_residual_path("ShardedSolver", self.run_path)

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

        has_wm = getattr(self, "has_wm", False)
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

        def residual(u, geo, tab, sends, bcP, ramp=None, fluc=None):
            """u: (El, U, F) local block; geo/tab/sends/bcP: this shard's
            rows; ramp: traced iteration counter for BC ramping; fluc:
            (Fb, nfp, d) turbulent-inlet fluctuations for this shard."""
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
                        u_bl, norm_b, P=bcP, ramp=ramp,
                        fluc=fluc).reshape(-1, nF)
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
                                                ramp=ramp, fluc=fluc)
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
                    wm_kw = {}
                    if has_wm:
                        # shard-local wall-model input states
                        # (ref:src/bdy_inters.cpp:1095-1131)
                        wm_kw = dict(
                            wm_state=u[tab["wm_ele"], tab["wm_upt"]],
                            wm_dist=geo["wm_dist"])
                    fn_bdy = fn_bdy + bc_fns.visc_common_flux(
                        u_bl, grad_f[tab["bdy_slot"]], norm_b, None,
                        P=bcP, ramp=ramp, fluc=fluc, **wm_kw)

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
            # freeze padding clones (unequal shard sizes): no face terms
            # reference them, and zero rhs keeps them at their finite IC
            return rhs * geo["pad_mask"][:, None, None]

        return residual

    # ------------------------------------------------------------------
    def _make_step(self):
        from ..solver.step import RK45_A, RK45_B, RK414_A, RK414_B
        adv = self.p.adv_type
        residual = self._residual_shard
        soa_res = self._residual_soa_shard
        # shock capture after every stage + SVV pre-filter per step
        # (closures are shard-shape agnostic; ref:src/HiFiLES.cpp:211-218);
        # the SoA path uses the elements-minor variants
        if soa_res is not None:
            post = self.base._post_stage_soa
            pre = self.base._pre_step_soa
        else:
            post = self.base._post_stage
            pre = self.base._pre_step
        ps = post if post is not None else (lambda x: x)

        def sq(tree):
            return jax.tree.map(lambda v: v[0], tree)

        has_ramp = any(getattr(b, "pressure_ramp", 0)
                       for b in (self.p.bc_list or []))
        ti_core = self._ti_core
        axis = self.axis
        d = self.base.ops.n_dims
        dtype = self.dtype
        prec = jax.lax.Precision[self.rcfg.precision.upper()]
        opp_0 = self.opp["opp_0"]
        nF = self.n_fields
        Pf = self.base.ops.n_fpts
        El = self.El
        forcing = self._forcing
        if forcing:
            bf_area = self.p.body_force_area
            bf_mdot0 = self.p.body_force_mdot0
            bf_type = self.p.body_force_type

        def shard_body(u, reg, dt, k, ti, mdot_old, geo, tabs, sends, bcP,
                       tiP):
            u = u[0]        # (1, El, ...) -> (El, ...)
            reg = reg[0]
            dt = dt[0] if dt.ndim else dt
            geo = sq(geo)
            tabs = sq(tabs)
            sends = sq(sends)
            bcP = sq(bcP)
            tiP = sq(tiP)
            ramp = k.astype(u.dtype) if has_ramp else None

            mdot_old = mdot_old if forcing else jnp.zeros((), dtype)
            fluc = None
            disu_f = None
            if ti_core is not None:
                # inlet update once per step at stage 0, like the
                # single-device loop (ref:src/solver.cpp:111-118); eddies
                # convect with the GLOBAL min step under local dt (the
                # single-device dt_s = min(dt); padding clones carry dt=0
                # and are excluded)
                dt_ti = dt if getattr(dt, "ndim", 0) == 0 else \
                    jax.lax.pmin(jnp.where(dt > 0.0, dt, jnp.inf).min(),
                                 axis)
                disu_f = jnp.einsum(
                    "pu,euf->epf", opp_0, u, preferred_element_type=dtype,
                    precision=prec).reshape(El * Pf, nF)
                u_bl = disu_f[tabs["bdy_slot"]]
                rows = tabs["ti_row"]
                ti, fl = ti_core(
                    ti, u_bl[rows], geo["ti_norm"], dt_ti, geo["ti_pos3"],
                    geo["ti_wdA"], geo["ti_mask"], P=tiP,
                    gidx=tabs["ti_gidx"])
                fluc = jnp.zeros(u_bl.shape[:2] + (d,), dtype).at[rows].set(
                    fl, mode="drop")

            bf = None
            if forcing:
                # bulk-momentum body force from the globally reduced
                # inflow-plane mass flux, once per step like the
                # single-device featured chunk (solver/solver.py;
                # ref:src/eles.cpp:5281-5484 evaluate_body_force + the
                # reference's MPI_Allreduce of the plane integrals)
                dt_s = dt if getattr(dt, "ndim", 0) == 0 else \
                    jax.lax.pmin(jnp.where(dt > 0.0, dt, jnp.inf).min(),
                                 axis)
                if disu_f is None:
                    disu_f = jnp.einsum(
                        "pu,euf->epf", opp_0, u,
                        preferred_element_type=dtype,
                        precision=prec).reshape(El * Pf, nF)
                uf = disu_f[tabs["force_row"]]        # (Ns, F), 0-padded
                w = geo["force_wdA"]
                mflux = jax.lax.psum(jnp.sum(w * uf[:, 1]), axis)
                rho_int = jax.lax.psum(jnp.sum(w * uf[:, 0]), axis)
                ubulk = jnp.where(rho_int == 0, 0.0, mflux / rho_int)
                if bf_type == 1:
                    bf1 = (bf_mdot0 - mflux) / (bf_area * dt_s)
                else:
                    bf1 = (bf_mdot0 - 2.0 * mflux + mdot_old) \
                        / (bf_area * dt_s)
                bf = jnp.zeros((nF,), dtype).at[1].set(bf1)
                bf = bf.at[d + 1].set(bf1 * ubulk)
                mdot_old = mflux

            if soa_res is not None:
                # run the whole step in the SoA (U, F, El) layout — one
                # transpose pair per step instead of relayout copies per
                # stage (guards exclude the ps/pre/fluc hooks)
                tabS = {k[4:]: v for k, v in tabs.items()
                        if k.startswith("soa_")}
                geoS = {k[4:]: v for k, v in geo.items()
                        if k.startswith("soa_")}
                u = jnp.transpose(u, (1, 2, 0))
                reg = jnp.transpose(reg, (1, 2, 0))
                dt_c = (jnp.reshape(dt, (1, 1, -1))
                        if getattr(dt, "ndim", 0) == 3 else dt)

                def rhs(x):
                    return soa_res(x, geo, geoS, tabS, bcP, ramp, fluc)

                dt_use = dt_c
            else:
                def rhs(x):
                    return residual(x, geo, tabs, sends, bcP, ramp, fluc)

                dt_use = dt

            if bf is not None:
                rhs_core = rhs
                bf_add = bf[:, None] if soa_res is not None else bf
                rhs = lambda x: rhs_core(x) + bf_add

            if pre is not None:
                u = pre(u)
            dt = dt_use
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
                A = [float(a) for a in (RK45_A if adv == 3 else RK414_A)]
                Bc = [float(b) for b in (RK45_B if adv == 3 else RK414_B)]
                r = reg * 0.0
                for s_ in range(len(A)):
                    r = A[s_] * r + dt * rhs(u)
                    u = ps(u + Bc[s_] * r)
                reg = r
            if soa_res is not None:
                u = jnp.transpose(u, (2, 0, 1))
                reg = jnp.transpose(reg, (2, 0, 1))
            return u[None], reg[None], ti, mdot_old

        from jax import shard_map

        def sharded_spec(tree):
            return jax.tree.map(
                lambda v: P(self.axis, *([None] * (v.ndim - 1))), tree)

        # local time stepping (dt_type 2) passes a per-element dt array
        # sharded like the state; global/fixed dt is a replicated scalar
        dt_spec = (P(self.axis, None, None, None)
                   if self.p.dt_type == 2 else P())
        ti_spec = jax.tree.map(lambda v: P(), self._ti_state)
        specs = (P(self.axis), P(self.axis), dt_spec, P(), ti_spec, P(),
                 sharded_spec(self.geo), sharded_spec(self.tabs),
                 sharded_spec(self.send_idx), sharded_spec(self.bcP),
                 sharded_spec(self.tiP))

        def step_shard(u, reg, dt, k, ti, mdot, geo, tabs, sends, bcP,
                       tiP):
            return shard_map(
                shard_body, mesh=self.mesh, in_specs=specs,
                out_specs=(P(self.axis), P(self.axis), ti_spec, P()),
                check_vma=False)(u, reg, dt, k, ti, mdot, geo, tabs,
                                 sends, bcP, tiP)

        avg = self._avg
        if avg:
            avg_fields = list(self.p.average_fields)
            spinup = self.p.spinup_time

        def run_chunk(state, dt, n_steps, geo, tabs, sends, bcP, tiP):
            def body(carry, _):
                u, r, k, ti, mdot, t_sim, ua = carry
                u, r, ti, mdot = step_shard(u, r, dt, k, ti, mdot, geo,
                                            tabs, sends, bcP, tiP)
                dt_s = (dt if getattr(dt, "ndim", 0) == 0
                        else jnp.where(dt > 0.0, dt, jnp.inf).min())
                t_sim = t_sim + dt_s
                if avg:
                    # running average on the sharded (S, El, U, F) state —
                    # elementwise, so GSPMD keeps it collective-free;
                    # padding clones carry junk that gather_u_avg drops
                    # (ref:src/eles.cpp:5676-5698)
                    rho = u[..., 0]
                    cols = []
                    for f_ in avg_fields:
                        if f_ == "rho_average":
                            cols.append(rho)
                        elif f_ == "u_average":
                            cols.append(u[..., 1] / rho)
                        elif f_ == "v_average":
                            cols.append(u[..., 2] / rho)
                        elif f_ == "w_average":
                            cols.append(u[..., 3] / rho)
                        else:  # e_average
                            cols.append(u[..., d + 1] / rho)
                    cur = jnp.stack(cols, axis=-1)
                    t_rel = t_sim - spinup
                    a = (t_rel - dt_s) / t_rel
                    b = dt_s / t_rel
                    ua = jnp.where(t_rel <= dt_s, cur, a * ua + b * cur)
                return (u, r, k + 1, ti, mdot, t_sim, ua), None
            state, _ = jax.lax.scan(body, state, None, length=n_steps)
            return state

        return run_chunk

    # ------------------------------------------------------------------
    def _sharded_spec(self, tree):
        return jax.tree.map(
            lambda v: P(self.axis, *([None] * (v.ndim - 1))), tree)

    def _make_dt_fn(self):
        """CFL dt with an in-mesh lax.pmin — the reference's
        MPI_Allreduce(MIN) (ref:src/solver.cpp:484-549; per-element formula
        ref:src/eles.cpp:1267-1356).  dt_type 1 returns a replicated scalar;
        dt_type 2 a sharded (n_shards, El, 1, 1) local-dt array with
        padding clones frozen at dt=0."""
        p = self.p
        cfg = self.rcfg
        d = self.base.ops.n_dims
        order = self.base.ops.order
        axis = self.axis
        viscous = bool(p.viscous) and cfg.equation == 0
        local = p.dt_type == 2

        def dt_body(u, h_ref, pad_mask):
            u, h_ref, pad_mask = u[0], h_ref[0], pad_mask[0]
            lam = max_wavespeed(u, cfg.gamma, d).max(axis=1)
            dt_ele = p.CFL * h_ref / lam / (2 * order + 1)
            if viscous:
                from ..models.viscous import sutherland_mu
                rho = u[..., 0]
                ke = 0.5 * jnp.sum(u[..., 1:1 + d] ** 2, axis=-1) / rho
                inte = (u[..., d + 1] - ke) / rho
                mu = sutherland_mu(inte, cfg.gamma, cfg.mu_inf, cfg.rt_inf,
                                   cfg.c_sth, cfg.fix_vis)
                lam_v = (max(4.0 / 3.0, cfg.gamma / cfg.prandtl)
                         * mu / rho).max(axis=1)
                dt_ele = jnp.minimum(
                    dt_ele,
                    p.CFL * 0.25 * h_ref ** 2 / lam_v / (2 * order + 1))
            if local:
                return jnp.where(pad_mask > 0, dt_ele, 0.0)[None, :, None,
                                                            None]
            masked = jnp.where(pad_mask > 0, dt_ele, jnp.inf)
            return jax.lax.pmin(masked.min(), axis)

        from jax import shard_map
        out_spec = (P(axis, None, None, None) if local else P())
        fn = shard_map(
            dt_body, mesh=self.mesh,
            in_specs=(P(self.axis), P(self.axis), P(self.axis)),
            out_specs=out_spec, check_vma=False)
        return jax.jit(fn)

    def compute_dt(self):
        """Sharded CFL time step (never gathers state to the host)."""
        if self.p.dt_type == 0:
            return self.p.dt
        if self.rcfg.equation != 0:
            return self.p.dt
        dt_key = (self.p.dt_type, float(self.p.CFL))
        if getattr(self, "_dt_key", None) != dt_key:
            self._dt_key = dt_key
            self._dt_jit = self._make_dt_fn()
        return self._dt_jit(self.u, self.geo["h_ref"],
                            self.geo["pad_mask"])

    def norm_residual(self, norm_type: int = 2) -> np.ndarray:
        """Residual norms via lax.psum / pmax inside shard_map — the
        reference's MPI_Reduce monitoring (ref:src/output.cpp:2166-2247),
        with the same normalization as Solver.residual_norm: L1 =
        sum|r|/n_pts, L2 = sqrt(sum r^2)/n_pts, inf = max|r|."""
        if not hasattr(self, "_norm_jit"):
            self._norm_jit = {}
        if norm_type not in self._norm_jit:
            residual = self._residual_shard
            axis = self.axis
            U = self.base.ops.n_upts
            n_pts = self.n_eles * U

            def norm_body(u, geo, tabs, sends, bcP):
                sq = lambda tree: jax.tree.map(lambda v: v[0], tree)
                r = residual(u[0], sq(geo), sq(tabs), sq(sends), sq(bcP))
                r = r * sq(geo)["pad_mask"][:, None, None]
                if norm_type == 1:
                    return jax.lax.psum(
                        jnp.abs(r).sum(axis=(0, 1)), axis) / n_pts
                if norm_type == 2:
                    return jnp.sqrt(jax.lax.psum(
                        (r * r).sum(axis=(0, 1)), axis)) / n_pts
                return jax.lax.pmax(jnp.abs(r).max(axis=(0, 1)), axis)

            from jax import shard_map
            specs = (P(self.axis), self._sharded_spec(self.geo),
                     self._sharded_spec(self.tabs),
                     self._sharded_spec(self.send_idx),
                     self._sharded_spec(self.bcP))
            self._norm_jit[norm_type] = jax.jit(shard_map(
                norm_body, mesh=self.mesh, in_specs=specs,
                out_specs=P(), check_vma=False))
        return np.asarray(self._norm_jit[norm_type](
            self.u, self.geo, self.tabs, self.send_idx, self.bcP))

    def run(self, n_steps: int, dt=None):
        if dt is None:
            dt = self.compute_dt()
        if isinstance(dt, (int, float)):
            dt_j = jnp.asarray(dt, self.dtype)
            dt_min = float(dt)
        else:
            dt_j = jnp.asarray(dt, self.dtype)
            dt_min = float(jnp.where(dt_j > 0, dt_j, jnp.inf).min()) \
                if dt_j.ndim else float(dt_j)
        ua = self.u_avg if self.u_avg is not None \
            else jnp.zeros((), self.dtype)
        state = self._step_jit(
            (self.u, self.reg, self._iter_k, self._ti_state,
             self._mdot_old, self._t_sim, ua), dt_j,
            n_steps, self.geo, self.tabs, self.send_idx, self.bcP,
            self.tiP)
        (self.u, self.reg, self._iter_k, self._ti_state,
         self._mdot_old, self._t_sim, ua) = state
        if self._avg:
            self.u_avg = ua
        self.time += dt_min * n_steps
        return self.u

    def gather_u(self) -> np.ndarray:
        """Solution in the original element ordering (E, U, F), padding
        clones dropped."""
        u = np.asarray(self.u).reshape(self.n_shards * self.El, -1,
                                       self.n_fields)
        real = self.pad_mask.reshape(-1) > 0
        out = np.empty((self.n_eles,) + u.shape[1:], dtype=u.dtype)
        out[self.owner.reshape(-1)[real]] = u[real]
        return out

    def gather_u_avg(self) -> np.ndarray | None:
        """Time-averaged fields (E, U, K) in original element order
        (None unless the deck sets average_fields)."""
        if self.u_avg is None:
            return None
        ua = np.asarray(self.u_avg).reshape(
            self.n_shards * self.El, *self.u_avg.shape[2:])
        real = self.pad_mask.reshape(-1) > 0
        out = np.empty((self.n_eles,) + ua.shape[1:], dtype=ua.dtype)
        out[self.owner.reshape(-1)[real]] = ua[real]
        return out

    def scatter_u(self, u_global) -> None:
        """Inverse of gather_u: distribute a global (E, U, F) solution
        onto the owner-sharded device layout (padding clones replicate
        their shard's first element, as at init)."""
        u = np.asarray(u_global)
        self.u = jax.device_put(
            jnp.asarray(u[self.owner.reshape(-1)].reshape(self.u.shape),
                        self.dtype),
            self.u.sharding)

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
        out = write_restart(directory, _View(), step=step)
        if self.turb_inlet is not None and self.turb_inlet.inlet_type == 2:
            from ..io.restart import write_sem_restart
            write_sem_restart(directory, step, self.turb_inlet,
                              self._ti_state, self.p)
        return out

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
            jnp.asarray(u[self.owner.reshape(-1)].reshape(self.u.shape),
                        self.dtype),
            self.u.sharding)
        self.time = t
        return t
