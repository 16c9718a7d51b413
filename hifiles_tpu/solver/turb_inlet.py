"""Turbulent inflow generation: white noise and the synthetic eddy method.

TPU-native reformulation of the reference's LES inlet machinery
(ref:src/bdy_inters.cpp:1140-2320, ref:include/turbinlet.h): the eddy state
(positions, signs, PRNG key) lives in the jitted time-loop carry and every
update — advection, out-of-box recycling, the tent-form-function fluctuation
field, Reynolds-stress rescaling and mass-flux correction — is traced jax
code, so the whole LES run stays one fused ``lax.scan`` on device (the
reference regenerates eddies on the host rank 0 and broadcasts via MPI each
step, ref::1635-1766).

Geometry conventions follow the reference: in 3-D the eddy bounding box
lives in cylindrical coordinates (r, theta, x-axial), cart2cyl = (sqrt(y^2 +
z^2), atan2(y, z), x) (ref:src/funcs.cpp:2937-2958) — built for x-normal
round/annular inlets; in 2-D a Cartesian (y, x) box is used.

The reference's Cholesky rescale (ref::1861-1889) is computed per flux point
but applied with the LAST point's factor (the apply block sits outside the
point loop — a latent bug); since r_ij is always diagonal in both modes
(ref::2029-2057 fills only the diagonal), the intended rescale is
fluc_i *= sqrt(r_ii) per point, which is what we implement.

Sharded runs (parallel/sharding.py) reuse ``inlet_host_setup`` +
``make_fluc_core`` with per-shard face tables and a psum axis: the eddy
state is replicated across shards and the two inlet-plane reductions
(convection speed, mass-flux correction — the reference's MPI_Allreduce,
ref::2059-2101, :1891-1990) become lax.psum, so every shard advances the
identical eddy field.
"""

from __future__ import annotations

import dataclasses
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from ..config.params import SUB_IN_CHAR, SUB_IN_SIMP, SUP_IN

INFLOW_FLAGS = (SUB_IN_SIMP, SUB_IN_CHAR, SUP_IN)
C_MU = 0.09  # k-eps constant (ref:include/turbinlet.h:8)


@dataclasses.dataclass
class TurbInlet:
    """Jit-friendly turbulent inlet; state travels in the scan carry."""
    inlet_type: int                 # 1 white noise, 2 SEM (ref::1405-1412)
    n_eddy: int
    update: callable                # (state, u_bl_inlet) -> (state, fluc_full)
    init_state: tuple               # (eddy_pos (N,3), sgn (N,3), key)
    in_faces: np.ndarray            # inlet rows of the bdy tables


def _cyl_of(pos):
    """cart -> (r, theta, x) (ref:src/funcs.cpp:2937-2947)."""
    return jnp.stack([jnp.sqrt(pos[..., 1] ** 2 + pos[..., 2] ** 2),
                      jnp.arctan2(pos[..., 1], pos[..., 2]),
                      pos[..., 0]], axis=-1)


def _cart_of(cyl):
    """(r, theta, x) -> cart (ref:src/funcs.cpp:2948-2958)."""
    return jnp.stack([cyl[..., 2],
                      cyl[..., 0] * jnp.sin(cyl[..., 1]),
                      cyl[..., 0] * jnp.cos(cyl[..., 1])], axis=-1)


def inlet_host_setup(run_input, block, seed: int = 0):
    """Host-side inlet constants: eddy box geometry, length scale, area
    weights, initial eddies.  Everything here is a *global* quantity
    (computed over the whole inlet plane), shared verbatim by sharded runs.

    Returns None when no boundary group requests a turbulent inlet
    (inlet_type 0 everywhere) — mirroring ref:src/solver.cpp:111-118 which
    only updates inlets with inlet.type != 0."""
    bcs = run_input.bc_list
    inlet_bcs = [b for b in bcs
                 if b.flag in INFLOW_FLAGS and b.inlet_type != 0]
    if not inlet_bcs:
        return None
    c = SimpleNamespace()
    c.itype = inlet_bcs[0].inlet_type
    c.mode = inlet_bcs[0].mode
    vis_y = inlet_bcs[0].vis_y
    c.turb_1 = inlet_bcs[0].turb_1
    c.turb_2 = inlet_bcs[0].turb_2
    c.n_eddy = n_eddy = max(int(inlet_bcs[0].n_eddy), 1)

    d = c.d = block.ops.n_dims
    Pf = block.ops.n_fpts
    inlet_ids = {i for i, b in enumerate(bcs)
                 if b.flag in INFLOW_FLAGS and b.inlet_type != 0}
    c.in_faces = np.array([f for f, bid in enumerate(block.bdy_bcid)
                           if int(bid) in inlet_ids], dtype=np.int64)
    slots = c.slots = block.bdy_slot[c.in_faces]          # (Fin, nfp)
    mask = c.mask = block.bdy_mask[c.in_faces] \
        if block.bdy_mask is not None else np.ones(slots.shape)
    pos = block.pos_fpts[slots]                           # (Fin, nfp, d)
    c.norm = block.norm_fpts[slots]
    # mixed meshes pass a facade with PER-SLOT weight / cell-size tables
    # (the global slot space has no uniform Pf; see multiblock._TIFacade)
    if getattr(block, "slot_wq", None) is not None:
        wq = block.slot_wq[slots]
    else:
        wq = block.ops.fpt_weights[slots % Pf]
    c.wdA = wq * block.tdA_fpts[slots] * mask             # (Fin, nfp)
    c.total_area = float(c.wdA.sum())                     # ref::2103-2131

    # --- eddy length scale (ref:src/eles.cpp:6023-6070): the largest
    # inflow-element cell size, floor for the k-eps scale
    if getattr(block, "slot_ls", None) is not None:
        ls_min = float(block.slot_ls[slots[mask > 0]].max()) \
            if mask.any() else 0.0
    else:
        in_eles = np.unique(slots[mask > 0] // Pf)
        ref_vol = {1: 4.0, 4: 8.0, 0: 2.0, 2: 4.0 / 3.0, 3: 4.0}[
            block.ops.ele_type]
        max_detjac = float(block.detjac_upts[in_eles].max()) \
            if in_eles.size else 0.0
        ls_min = (run_input.filter_ratio
                  * (ref_vol * max_detjac) ** (1.0 / d)
                  / (run_input.order + 1.0))
    if c.mode == 0 and c.turb_2 > 0:
        ls = max(ls_min, C_MU ** 0.75 * c.turb_1 ** 1.5 / c.turb_2)
    else:
        ls = ls_min        # mode 1 wall-distance scale: reference stub
    c.ls = max(ls, 1e-12)

    # --- bounding box in generator coordinates (ref::1519-1627)
    pos3 = np.zeros(pos.shape[:-1] + (3,))
    pos3[..., :d] = pos
    c.pos3 = pos3
    pflat = pos3[mask > 0]
    if d == 3:
        gen = np.stack([np.sqrt(pflat[:, 1]**2 + pflat[:, 2]**2),
                        np.arctan2(pflat[:, 1], pflat[:, 2]),
                        pflat[:, 0]], axis=-1)
    else:
        # 2-D: (y tangential, 0, x axial)
        gen = np.stack([pflat[:, 1], np.zeros(pflat.shape[0]),
                        pflat[:, 0]], axis=-1)
    box_min = gen.min(axis=0)
    box_max = gen.max(axis=0)
    box_min[2] -= c.ls
    box_max[2] += c.ls
    box_min[0] += vis_y          # no eddies in the viscous sublayer
    box_max[0] -= vis_y
    if d == 2:
        box_min[1], box_max[1] = -0.5, 0.5   # unit depth
    box_dim = np.maximum(box_max - box_min, 1e-12)
    if d == 3:
        box_vol = ((box_max[0]**2 - box_min[0]**2) * box_dim[1] / 2
                   * box_dim[2])              # cyl volume (ref::1622-1624)
    else:
        box_vol = box_dim[0] * box_dim[2]
    c.box_min, c.box_max, c.box_dim = box_min, box_max, box_dim
    c.alpha = float(np.sqrt(max(box_vol, 1e-30) / n_eddy))  # ref::1771

    c.uvw_ref = run_input.uvw_ref if np.isfinite(
        getattr(run_input, "uvw_ref", np.nan)) and run_input.uvw_ref > 0 \
        else 1.0

    # initial eddies: uniform in the box, random signs (ref::1629-1666)
    rng = np.random.default_rng(seed)
    gen0 = box_min + rng.random((n_eddy, 3)) * box_dim
    if d == 3:
        eddy0 = np.stack([gen0[:, 2], gen0[:, 0] * np.sin(gen0[:, 1]),
                          gen0[:, 0] * np.cos(gen0[:, 1])], axis=-1)
    else:
        eddy0 = np.stack([gen0[:, 2], gen0[:, 0],
                          np.zeros(n_eddy)], axis=-1)
    c.eddy0 = eddy0
    c.sgn0 = np.where(rng.random((n_eddy, 3)) < 0.5, -1.0, 1.0)
    c.seed = seed
    return c


def make_fluc_core(c, bc_fns, dtype, psum_axis: str | None = None):
    """The per-step inlet update on a subset of inlet faces.

    Returns ``core(state, u_in, norm_in, dt, pos3, wdA, mask, P)`` ->
    (new_state, fl (Fin, nfp, d)).  The two inlet-plane reductions go
    through lax.psum when ``psum_axis`` is given (the reference's
    MPI_Allreduce); the eddy state is then replicated across shards and
    advances identically everywhere."""
    d = c.d
    itype, mode = c.itype, c.mode
    n_eddy = c.n_eddy
    Fin_g, nfp_g = c.wdA.shape      # global inlet-plane row count
    total_area = c.total_area
    alpha, uvw_ref = c.alpha, c.uvw_ref
    turb_1 = c.turb_1
    f = lambda a: jnp.asarray(a, dtype=dtype)
    box_min_j, box_max_j = f(c.box_min), f(c.box_max)
    box_dim_j = f(c.box_dim)
    box_dim = c.box_dim
    ls_j = jnp.full((3,), c.ls, dtype=dtype)

    def allsum(x):
        return jax.lax.psum(x, psum_axis) if psum_axis else x

    def to_gen(cart):
        if d == 3:
            return _cyl_of(cart)
        return jnp.stack([cart[..., 1], jnp.zeros_like(cart[..., 0]),
                          cart[..., 0]], axis=-1)

    def from_gen(gen):
        if d == 3:
            return _cart_of(gen)
        return jnp.stack([gen[..., 2], gen[..., 0],
                          jnp.zeros_like(gen[..., 0])], axis=-1)

    def tent(dist):
        """Product tent form function (ref::2198-2214)."""
        inside = jnp.all(dist < ls_j[:d], axis=-1)
        form = jnp.prod((1.0 - dist / ls_j[:d])
                        / jnp.sqrt(2.0 / 3.0 * ls_j[:d]), axis=-1)
        return jnp.where(inside, form, 0.0)

    def core(state, u_in, norm_in, dt, pos3, wdA, mask, P=None,
             gidx=None):
        """One per-step inlet update (ref::1351-1444 update_les_inlet).

        u_in: (Fin, nfp, F) inlet-point solution; pos3/wdA/mask: this
        subset's geometry rows; P: this subset's BC parameter rows;
        gidx: global inlet-row index per local row (sharded runs) so the
        white-noise field is drawn once for the whole plane and sliced —
        keeping shard count out of the random stream."""
        eddy_pos, sgn, key = state
        # mean inlet state from the inviscid ghost (ref::1993-2027)
        u_r = bc_fns.ghost_state(u_in, norm_in, sol_spec=0, P=P)
        rou = u_r[..., 0]
        vel = u_r[..., 1:1 + d] / rou[..., None]

        if itype == 1:
            # white-noise inlet (ref::1460-1477); drawn over the global
            # inlet plane so every shard sees the same stream
            key, sub = jax.random.split(key)
            fl_g = jax.random.normal(sub, (Fin_g, nfp_g, d), dtype=dtype)
            fl = fl_g if gidx is None else fl_g[gidx]
            new_state = (eddy_pos, sgn, key)
        else:
            # convection speed = area-averaged inlet velocity (ref::2059-2101)
            vel_c = allsum(jnp.einsum("fq,fqk->k", wdA, vel)) / total_area
            vel_c3 = jnp.zeros(3, dtype).at[:d].set(vel_c)
            eddy_pos = eddy_pos + vel_c3 * dt             # ref::1677-1694
            # wrap + recycle (ref::1697-1757): wrapped coords keep their
            # wrapped value, the others re-randomize; signs re-randomize
            g = to_gen(eddy_pos)                       # (N, 3)
            below = g < box_min_j
            above = g > box_max_j
            wrapped = jnp.where(below, g + box_dim_j,
                                jnp.where(above, g - box_dim_j, g))
            out = jnp.any(below | above, axis=-1)      # (N,)
            key, k1, k2 = jax.random.split(key, 3)
            rand_g = box_min_j + jax.random.uniform(
                k1, (n_eddy, 3), dtype=dtype) * box_dim_j
            g_new = jnp.where((below | above), wrapped,
                              jnp.where(out[:, None], rand_g, g))
            rand_sgn = jnp.where(
                jax.random.uniform(k2, (n_eddy, 3), dtype=dtype) < 0.5,
                -1.0, 1.0).astype(dtype)
            sgn = jnp.where(out[:, None], rand_sgn, sgn)
            eddy_pos = from_gen(g_new)
            new_state = (eddy_pos, sgn, key)

            # tent-function fluctuations, theta-periodic images in 3-D;
            # nearest image chosen by distance MAGNITUDE like the reference
            # (ref::2134-2219 cal_fluc)
            imgs = [eddy_pos]
            if d == 3:
                gc = to_gen(eddy_pos)
                for s in (1.0, -1.0):
                    imgs.append(from_gen(gc + s * jnp.array(
                        [0.0, box_dim[1], 0.0], dtype=dtype)))
            dists = jnp.stack(
                [jnp.abs(pos3[:, :, None, :] - img[None, None, :, :])
                 for img in imgs])                     # (I, Fin, nfp, N, 3)
            mags = jnp.sum(dists * dists, axis=-1)     # (I, Fin, nfp, N)
            best = jnp.argmin(mags, axis=0)
            dist = jnp.take_along_axis(
                dists, best[None, ..., None], axis=0)[0]
            form = tent(dist[..., :d])                 # (Fin, nfp, N)
            fl = jnp.einsum("fqn,nk->fqk", form, sgn[:, :d]) * alpha

        fl = fl / uvw_ref                              # ref::1396-1401
        # diagonal Reynolds-stress rescale (ref::1861-1889, :2029-2057)
        if mode == 0:
            rii = jnp.full_like(rou, 2.0 / 3.0 * turb_1)[..., None]
        else:
            ubar = jnp.sqrt(jnp.sum(vel * vel, axis=-1))
            rii = ((turb_1 * ubar) ** 2)[..., None]
        fl = fl * jnp.sqrt(rii)
        # zero mean mass flux (ref::1891-1990 correct_mass)
        mf = allsum(jnp.sum(wdA * fl[..., 0] * rou))
        fl = fl.at[..., 0].add(-mf / (total_area * rou))
        fl = fl * mask[..., None]
        return new_state, fl

    return core


def build_turb_inlet(run_input, block, bc_flags, bc_fns, dtype,
                     seed: int = 0):
    """Single-device inlet: host setup + core over the full inlet plane."""
    c = inlet_host_setup(run_input, block, seed)
    if c is None:
        return None
    d = c.d
    Fb, nfp = block.bdy_slot.shape
    f = lambda a: jnp.asarray(a, dtype=dtype)
    pos3_j, wdA_j, mask_j = f(c.pos3), f(c.wdA), f(c.mask)
    norm_in_j = f(c.norm)
    in_faces_j = jnp.asarray(c.in_faces, dtype=jnp.int32)
    init_state = (f(c.eddy0), f(c.sgn0), jax.random.PRNGKey(c.seed))
    core = make_fluc_core(c, bc_fns, dtype)

    # inlet rows of the full-boundary BC parameter tables
    from .bc import _pack_params
    bcid_in = np.repeat(block.bdy_bcid[c.in_faces][:, None], nfp, axis=1)
    P_in = {k: jnp.asarray(v, dtype=dtype if k != "flag" else jnp.int32)
            for k, v in _pack_params(run_input, bcid_in, d).items()}

    def update(state, u_bl, dt):
        """u_bl: (Fb, nfp, F) boundary-point solution; returns the new
        state and fluc (Fb, nfp, d) ready for the BC ghost states."""
        new_state, fl = core(state, u_bl[in_faces_j], norm_in_j, dt,
                             pos3_j, wdA_j, mask_j, P=P_in)
        fluc_full = jnp.zeros((Fb, nfp, d), dtype).at[in_faces_j].set(fl)
        return new_state, fluc_full

    return TurbInlet(inlet_type=c.itype, n_eddy=c.n_eddy, update=update,
                     init_state=init_state, in_faces=c.in_faces)
