"""Mixed-element-type solver: per-type tensor blocks, one global face space.

The reference couples tris/quads/tets/prisms/hexes through shared inters
objects holding pointers into each eles object's storage
(ref:src/geometry.cpp:250-420, ref:src/int_inters.cpp:67-121).  The
TPU-native formulation instead concatenates every type's flux-point data
into ONE flat slot vector: each type runs its own batched volume GEMMs
(different U/Pf per type), the face exchange is a single pair of gathers
over global slot tables, and the common flux returns to each block by
slicing the global norm_tconf at the block's slot offset.  No pointers, no
per-pairing kernels — XLA sees a handful of dense einsums plus gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import HEX, PRISM, QUAD, TET, TRI
from ..config.params import RunInput
from ..mesh.core import MeshData, build_faces
from ..models.euler import inviscid_flux, max_wavespeed
from ..models.viscous import adv_diff_viscous_flux, viscous_flux
from ..ops import riemann
from .elements import MixedMeshTables, build_mixed_blocks
from .ics import initial_condition
from .kernels import adj_apply_cat, adjT_apply, opmat, opmat_md
from .residual import BlockArrays, ResidualConfig
from .step import N_STAGES, make_step_fn


class _BCBlockFacade:
    """Duck-typed 'block' for bc.make_bc_functions on the global slot space.

    pos_upts is None: wall-model input tables are built per block by
    build_mixed_wm_tables and the gathered ``wm_state`` is passed to
    visc_common_flux instead (see bc.py has_wm)."""

    def __init__(self, mt: MixedMeshTables):
        self.ops = mt.blocks[mt.cts[0]].ops
        self.bdy_slot = mt.bdy_slot
        self.bdy_bcid = mt.bdy_bcid
        self.bdy_mask = mt.bdy_mask
        self.pos_fpts = mt.pos_fpts
        self.norm_fpts = mt.norm_fpts
        self.pos_upts = None


class _TIFacade:
    """Duck-typed block for turb_inlet.inlet_host_setup on the mixed
    GLOBAL slot space: per-slot quadrature weights and owning-cell size
    replace the single-type ``slots % Pf`` arithmetic."""

    _REF_VOL = {TRI: 2.0, QUAD: 4.0, TET: 4.0 / 3.0, PRISM: 4.0, HEX: 8.0}

    def __init__(self, mt: MixedMeshTables, run_input: RunInput):
        self.ops = mt.blocks[mt.cts[0]].ops       # n_dims only
        self.bdy_slot = mt.bdy_slot
        self.bdy_bcid = mt.bdy_bcid
        self.bdy_mask = mt.bdy_mask
        self.pos_fpts = mt.pos_fpts
        self.norm_fpts = mt.norm_fpts
        self.tdA_fpts = mt.tdA_fpts
        wq, ls = [], []
        for ct in mt.cts:
            b = mt.blocks[ct]
            o = b.ops
            wq.append(np.tile(o.fpt_weights, b.n_eles))
            # per-element cell-size metric (ref:src/eles.cpp:6023-6070)
            cell = (run_input.filter_ratio
                    * (self._REF_VOL[ct]
                       * b.detjac_upts.max(axis=1)) ** (1.0 / o.n_dims)
                    / (run_input.order + 1.0))
            ls.append(np.repeat(cell, o.n_fpts))
        self.slot_wq = np.concatenate(wq)
        self.slot_ls = np.concatenate(ls)


def _build_ops(run_input: RunInput, ct: int):
    """Per-type operator factory (same dispatch as solver.Solver)."""
    from ..ops.operators import (build_pri_ops, build_tensor_ops,
                                 build_tet_ops, build_tri_ops)
    if ct == QUAD:
        return build_tensor_ops(QUAD, run_input.order,
                                run_input.upts_type_quad,
                                run_input.vcjh_scheme_quad, run_input.eta_quad)
    if ct == HEX:
        return build_tensor_ops(HEX, run_input.order,
                                run_input.upts_type_hexa,
                                run_input.vcjh_scheme_hexa, run_input.eta_hexa)
    if ct == TRI:
        return build_tri_ops(run_input.order, run_input.upts_type_tri,
                             run_input.fpts_type_tri,
                             run_input.vcjh_scheme_tri, run_input.c_tri)
    if ct == TET:
        return build_tet_ops(run_input.order, run_input.upts_type_tet,
                             run_input.fpts_type_tet,
                             run_input.vcjh_scheme_tet, run_input.c_tet)
    if ct == PRISM:
        return build_pri_ops(run_input.order, run_input.upts_type_pri_tri,
                             run_input.upts_type_pri_1d,
                             run_input.vcjh_scheme_pri_1d, run_input.eta_pri,
                             run_input.vcjh_scheme_tri, run_input.c_tri)
    raise NotImplementedError(f"ctype {ct}")


def build_mixed_wm_tables(mt: MixedMeshTables, use_wm_face: np.ndarray):
    """Wall-model input points on a mixed mesh: per wall-modeled boundary
    face, the owning block, local element, and the solution point of that
    element farthest (min-over-fpts normal distance) from the face
    (ref:src/eles.cpp:4873-4903 calc_wm_upts_dist; the reference wall-models
    any boundary face regardless of element type,
    ref:src/bdy_inters.cpp:1095-1131).

    Returns (per_ct, wm_dist): ``per_ct[ct] = (faces, ele, upt)`` int
    arrays over this block's wall-modeled faces; ``wm_dist`` (Fb,)."""
    Fb = mt.bdy_bcid.size
    wm_dist = np.ones(Fb)
    per_ct = {ct: ([], [], []) for ct in mt.cts}
    seg = {ct: (mt.slot_off[ct],
                mt.slot_off[ct] + mt.blocks[ct].n_eles
                * mt.blocks[ct].ops.n_fpts) for ct in mt.cts}
    for fi in range(Fb):
        if use_wm_face[fi] <= 0:
            continue
        slots = mt.bdy_slot[fi][mt.bdy_mask[fi] > 0]
        s0 = int(slots[0])
        ct = next(c for c in mt.cts if seg[c][0] <= s0 < seg[c][1])
        blk = mt.blocks[ct]
        e = (s0 - seg[ct][0]) // blk.ops.n_fpts
        fpt_pos = mt.pos_fpts[slots]
        fpt_nrm = mt.norm_fpts[slots]
        dvec = fpt_pos[None, :, :] - blk.pos_upts[e][:, None, :]
        dist = np.einsum("ufd,fd->uf", dvec, fpt_nrm).min(axis=1)
        per_ct[ct][0].append(fi)
        per_ct[ct][1].append(int(e))
        per_ct[ct][2].append(int(np.argmax(dist)))
        wm_dist[fi] = float(dist.max())
    per_ct = {ct: tuple(np.asarray(x, dtype=np.int64) for x in v)
              for ct, v in per_ct.items()}
    return per_ct, wm_dist


def make_mixed_residual_fn(mt: MixedMeshTables, cfg: ResidualConfig, dtype,
                           bc_fns=None, wm_tables=None):
    """residual(u_tuple) -> rhs_tuple over the mixed mesh.

    Same pipeline as residual.make_residual_fn (see its stage comments /
    reference citations); volume stages run per block, face stages run once
    in the global slot space."""
    use_similarity = cfg.les and cfg.sgs_model in (2, 4)
    cts = mt.cts
    d = mt.blocks[cts[0]].ops.n_dims
    nF = cfg.n_fields
    prec = jax.lax.Precision[cfg.precision.upper()]
    has_bdy = mt.bdy_slot.size > 0

    B = {ct: BlockArrays(mt.blocks[ct], dtype) for ct in cts}
    f = lambda a: jnp.asarray(a, dtype=dtype)
    i32 = lambda a: jnp.asarray(a, dtype=jnp.int32)
    g_tdA = f(mt.tdA_fpts)
    g_slot_src = i32(mt.slot_src)
    g_slot_sign = f(mt.slot_sign)
    g_int_l = i32(mt.int_slot_l)
    g_int_r = i32(mt.int_slot_r)
    g_bdy = i32(mt.bdy_slot)
    g_norm_int_l = f(mt.norm_fpts[mt.int_slot_l])
    g_norm_bdy = f(mt.norm_fpts[mt.bdy_slot])
    g_jginv_f = f(mt.jginv_fpts)
    g_inv_detjac_f = f(1.0 / mt.detjac_fpts)
    # slot ranges of each block inside the global flat arrays
    seg = {ct: (mt.slot_off[ct],
                mt.slot_off[ct] + mt.blocks[ct].n_eles
                * mt.blocks[ct].ops.n_fpts) for ct in cts}

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
        return riemann.lax_friedrichs_flux(u_l, u_r, norm, ws, cfg.lambda_lf)

    def phys_visc_flux(u, grad, delta=None, wdist=None):
        if cfg.equation == 0:
            fv = viscous_flux(
                u, grad, gamma=cfg.gamma, prandtl=cfg.prandtl,
                mu_inf=cfg.mu_inf, rt_inf=cfg.rt_inf, c_sth=cfg.c_sth,
                fix_vis=cfg.fix_vis, n_dims=d, rans=cfg.rans,
                prandtl_t=cfg.prandtl_t)
            # eddy-viscosity SGS models (ref:src/eles.cpp:2330-2361)
            if cfg.les and cfg.sgs_model in (0, 1, 2) and delta is not None:
                from ..models.sgs import sgs_flux
                fv = fv + sgs_flux(
                    u, grad, cfg.filter_ratio * delta, wdist,
                    sgs_model=cfg.sgs_model, C_s=cfg.C_s, gamma=cfg.gamma,
                    prandtl_t=cfg.prandtl_t, n_dims=d, kappa=cfg.kappa)
            return fv
        return adv_diff_viscous_flux(grad, cfg.diff_coeff)

    # LES cutoff lengths / wall distances (global slot concat per block)
    if cfg.les:
        g_delta_slot = jnp.concatenate([B[ct].delta_slot for ct in cts])
        g_wdist_slot = jnp.concatenate([B[ct].wdist_slot for ct in cts])

    # wall-model input gather tables (build_mixed_wm_tables)
    if wm_tables is not None:
        wm_per_ct, wm_dist_np = wm_tables
        wm_idx = {ct: tuple(i32(x) for x in wm_per_ct[ct]) for ct in cts}
        wm_dist_j = f(wm_dist_np)
        Fb_wm = mt.bdy_bcid.size
    if use_similarity:
        from ..ops.les_filter import build_les_filter
        les_filter = {ct: jnp.asarray(
            build_les_filter(mt.blocks[ct].ops, cfg.filter_type,
                             cfg.filter_ratio), dtype=dtype) for ct in cts}

    def residual(u_tuple, fluc=None, ramp=None):
        us = dict(zip(cts, u_tuple))

        # 1. extrapolate to flux points, per block, concat into global slots
        disu_f_flat = jnp.concatenate([
            jnp.einsum("pu,euf->epf", B[ct].opp_0, us[ct],
                       preferred_element_type=dtype,
                       precision=prec).reshape(-1, nF)
            for ct in cts])

        # 2. face gathers (global)
        u_l = disu_f_flat[g_int_l]
        u_r = disu_f_flat[g_int_r]
        if has_bdy:
            u_bl = disu_f_flat[g_bdy]

        # similarity-model Leonard tensors per block, extrapolated to the
        # global slots (ref:src/eles.cpp:2091-2218, :2615-2644)
        if use_similarity:
            from ..models.sgs import similarity_flux, similarity_terms
            simf_upts = {}
            parts = []
            for ct in cts:
                Lu, Le = similarity_terms(us[ct], les_filter[ct], d)
                simf_upts[ct] = similarity_flux(us[ct], Lu, Le, cfg.gamma, d)
                parts.append(opmat_md(B[ct].opp_0, simf_upts[ct], dtype,
                                      prec).reshape(-1, nF, d))
            simf_fpts = jnp.concatenate(parts)

        # 3. viscous gradient path
        if cfg.viscous:
            u_c_int = riemann.ldg_common_solution(u_l, u_r, g_norm_int_l,
                                                  cfg.ldg_beta)
            if has_bdy:
                u_c_bdy = bc_fns.ldg_solution(u_bl, g_norm_bdy,
                                              fluc=fluc, ramp=ramp)
                u_c_all = jnp.concatenate(
                    [u_c_int.reshape(-1, nF), u_c_bdy.reshape(-1, nF)])
            else:
                u_c_all = u_c_int.reshape(-1, nF)
            delta_flat = u_c_all[g_slot_src] - disu_f_flat   # (S, F)
            grad_u = {}
            tgrad_f_parts = []
            for ct in cts:
                b = B[ct]
                E, U, Pf = b.n_eles, b.n_upts, b.n_fpts
                lo, hi = seg[ct]
                tgrad = jnp.stack([opmat(b.opp_2_stack[g], us[ct], dtype,
                                         prec) for g in range(d)], axis=-1)
                delta = delta_flat[lo:hi].reshape(E, Pf, nF)
                tgrad = tgrad + jnp.stack(
                    [opmat(b.opp_5_stack[g], delta, dtype, prec)
                     for g in range(d)], axis=-1)
                grad_u[ct] = adjT_apply(b.jginv_upts, tgrad,
                                        b.inv_detjac_upts)
                tgrad_f_parts.append(opmat_md(b.opp_0, tgrad, dtype,
                                              prec).reshape(-1, nF, d))
            tgrad_f_flat = jnp.concatenate(tgrad_f_parts)
            grad_f_flat = adjT_apply(g_jginv_f, tgrad_f_flat,
                                     g_inv_detjac_f)

        # 4+5. common interface fluxes (global)
        fn_int = common_inv_flux(u_l, u_r, g_norm_int_l)
        if cfg.viscous:
            if cfg.les:
                fv_l = phys_visc_flux(u_l, grad_f_flat[g_int_l],
                                      g_delta_slot[g_int_l],
                                      g_wdist_slot[g_int_l])
                fv_r = phys_visc_flux(u_r, grad_f_flat[g_int_r],
                                      g_delta_slot[g_int_r],
                                      g_wdist_slot[g_int_r])
            else:
                fv_l = phys_visc_flux(u_l, grad_f_flat[g_int_l])
                fv_r = phys_visc_flux(u_r, grad_f_flat[g_int_r])
            if use_similarity:
                fv_l = fv_l + simf_fpts[g_int_l]
                fv_r = fv_r + simf_fpts[g_int_r]
            fn_int = fn_int + riemann.ldg_common_flux(
                u_l, u_r, fv_l, fv_r, g_norm_int_l, cfg.ldg_tau,
                cfg.ldg_beta)
        if has_bdy:
            fn_bdy = bc_fns.inv_common_flux(u_bl, g_norm_bdy, fluc=fluc,
                                            ramp=ramp)
            if cfg.viscous:
                wm_kw = {}
                if wm_tables is not None:
                    # gather the wall-model input state from each owning
                    # block's solution (ref:src/eles.cpp:4873-4903)
                    wm_state = jnp.zeros((Fb_wm, nF), dtype)
                    for ct in cts:
                        fidx, ele, upt = wm_idx[ct]
                        if fidx.size:
                            wm_state = wm_state.at[fidx].set(
                                us[ct][ele, upt])
                    wm_kw = dict(wm_state=wm_state, wm_dist=wm_dist_j)
                fn_bdy = fn_bdy + bc_fns.visc_common_flux(
                    u_bl, grad_f_flat[g_bdy], g_norm_bdy, None, fluc=fluc,
                    ramp=ramp, **wm_kw)
            fn_all = jnp.concatenate([fn_int.reshape(-1, nF),
                                      fn_bdy.reshape(-1, nF)])
        else:
            fn_all = fn_int.reshape(-1, nF)

        # 6. slot-level normal transformed continuous flux (global)
        norm_tconf_flat = (fn_all[g_slot_src]
                           * (g_slot_sign * g_tdA)[:, None])

        # 4/7. per-block volume flux + merged divergence GEMM
        out = []
        for ct in cts:
            b = B[ct]
            E, U, Pf = b.n_eles, b.n_upts, b.n_fpts
            lo, hi = seg[ct]
            if cfg.over_int:
                # de-aliased inviscid flux (ref:src/eles.cpp:1480-1545)
                from .kernels import adj_apply
                u_over = opmat(b.opp_over, us[ct], dtype, prec)
                f_over = phys_flux(u_over)
                tdisf = opmat_md(b.over_filter,
                                 adj_apply(b.jginv_over, f_over),
                                 dtype, prec)
                if cfg.viscous:
                    fv = phys_visc_flux(us[ct], grad_u[ct],
                                        b.delta_upts if cfg.les else None,
                                        b.wdist_upts if cfg.les else None)
                    tdisf = tdisf + adj_apply(b.jginv_upts, fv)
                tdisf_cat = jnp.concatenate(
                    [tdisf[..., l] for l in range(d)], axis=1)
            else:
                fl = phys_flux(us[ct])
                if cfg.viscous:
                    fl = fl + phys_visc_flux(
                        us[ct], grad_u[ct],
                        b.delta_upts if cfg.les else None,
                        b.wdist_upts if cfg.les else None)
                    if use_similarity:
                        fl = fl + simf_upts[ct]
                tdisf_cat = adj_apply_cat(b.jginv_upts, fl)
            norm_tconf = norm_tconf_flat[lo:hi].reshape(E, Pf, nF)
            rhs_cat = jnp.concatenate([tdisf_cat, norm_tconf], axis=1)
            div = opmat(b.opp_div_all, rhs_cat, dtype, prec)
            rhs = -div * b.inv_detjac_upts[..., None]
            if cfg.rans:
                # SA source per block (ref:src/source.cpp:33-105)
                from ..models.sa import sa_source
                src = sa_source(
                    us[ct], grad_u[ct], b.wdist_upts, gamma=cfg.gamma,
                    mu_inf=cfg.mu_inf, rt_inf=cfg.rt_inf, c_sth=cfg.c_sth,
                    fix_vis=cfg.fix_vis, kappa=cfg.kappa, c_v1=cfg.c_v1,
                    c_v2=cfg.c_v2, c_v3=cfg.c_v3, c_b1=cfg.c_b1,
                    c_b2=cfg.c_b2, c_w2=cfg.c_w2, c_w3=cfg.c_w3,
                    omega=cfg.omega, n_dims=d)
                rhs = rhs.at[..., d + 2].add(src)
            out.append(rhs)
        return tuple(out)

    return residual


class MixedSolver:
    """Driver for meshes with more than one element type; mirrors
    solver.Solver's interface (run/compute_dt/residual_norm)."""

    def __init__(self, run_input: RunInput, mesh: MeshData,
                 dtype=jnp.float64):
        from ..utils import enable_persistent_cache
        enable_persistent_cache()
        self.p = run_input
        self.mesh = mesh
        self.dtype = dtype
        self.n_dims = mesh.n_dims
        self.n_fields = run_input.n_fields_for(self.n_dims)

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
        self.conn = build_faces(mesh, bc_flags, delta_cyclic)

        cts = sorted(int(c) for c in np.unique(mesh.ctype))
        ops_by_ct = {ct: _build_ops(run_input, ct) for ct in cts}
        self.mt = build_mixed_blocks(
            mesh, self.conn, ops_by_ct,
            over_int_order=(run_input.over_int_order if run_input.over_int
                            else None))
        self.cts = cts
        self.blocks = self.mt.blocks

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
            n_fields=self.n_fields, over_int=bool(run_input.over_int),
            les=bool(run_input.LES), sgs_model=run_input.SGS_model,
            C_s=run_input.C_s, filter_ratio=run_input.filter_ratio,
            filter_type=run_input.filter_type, kappa=run_input.Kappa,
            rans=bool(run_input.RANS),
            c_v1=run_input.c_v1, c_v2=run_input.c_v2, c_v3=run_input.c_v3,
            c_b1=run_input.c_b1, c_b2=run_input.c_b2, c_w2=run_input.c_w2,
            c_w3=run_input.c_w3, omega=run_input.omega)

        # wall distance per block (ref:src/geometry.cpp:708-894) for SA /
        # wall-damped Smagorinsky
        if (run_input.RANS or run_input.wall_model
                or (run_input.LES and run_input.SGS_model == 0)):
            from ..config.params import ADIABAT_WALL, ISOTHERM_WALL
            wall_slots = []
            for fi, bcid in enumerate(self.mt.bdy_bcid):
                if bc_flags.get(int(bcid), -1) in (ISOTHERM_WALL,
                                                   ADIABAT_WALL):
                    sl = self.mt.bdy_slot[fi][self.mt.bdy_mask[fi] > 0]
                    wall_slots.append(sl)
            wall_pts = (self.mt.pos_fpts[np.concatenate(wall_slots)]
                        if wall_slots else np.empty((0, self.n_dims)))
            for ct in cts:
                self.blocks[ct].compute_wall_distance(wall_pts)

        bc_fns = None
        if self.mt.bdy_slot.size:
            from .bc import make_bc_functions
            bc_fns = make_bc_functions(run_input, _BCBlockFacade(self.mt),
                                       self.rcfg, dtype)

        # turbulent inlet (white noise / SEM) on the mixed global slot
        # space (ref:src/bdy_inters.cpp:1478-1920; the reference's inlet
        # machinery is element-type agnostic, keyed on boundary faces)
        self.turb_inlet = None
        self._ti_state = None
        if run_input.LES and bc_fns is not None:
            from .turb_inlet import build_turb_inlet
            ti = build_turb_inlet(run_input, _TIFacade(self.mt, run_input),
                                  bc_flags, bc_fns, dtype)
            if ti is not None:
                self.turb_inlet = ti
                self._ti_state = ti.init_state

        # wall models on mixed meshes (ref:src/bdy_inters.cpp:1095-1131
        # wall-models any boundary face regardless of element type)
        wm_tables = None
        if run_input.wall_model and run_input.bc_list:
            use_wm_face = np.array(
                [run_input.bc_list[int(b)].use_wm for b in self.mt.bdy_bcid])
            if np.any(use_wm_face > 0):
                wm_tables = build_mixed_wm_tables(self.mt, use_wm_face)
        self._wm_tables = wm_tables

        self.residual_fn = make_mixed_residual_fn(self.mt, self.rcfg, dtype,
                                                  bc_fns, wm_tables=wm_tables)

        # mixed SoA (U_t, F, E_t) fast path (residual_mixed_soa.py):
        # numerically identical (tests/test_mixed_soa.py), default for the
        # time loop; opt out with HIFILES_NO_SOA=1
        import os as _os
        self.residual_soa = None
        if not _os.environ.get("HIFILES_NO_SOA"):
            from .residual_mixed_soa import make_mixed_residual_soa
            self.residual_soa = make_mixed_residual_soa(
                self.mt, self.rcfg, dtype, bc_fns, wm_tables=wm_tables)
        from ..utils import log_residual_path
        self.run_path = ("mixed-SoA (fast)" if self.residual_soa is not None
                         else "slot (fallback, up to 20x slower)")
        log_residual_path("MixedSolver", self.run_path)

        # per-block shock capture / SVV (ref:src/HiFiLES.cpp:211-218,
        # ref:src/eles.cpp:2087-2089)
        post_stage = None
        self._post_stage_soa = None
        self.sensor_fns = None
        if run_input.shock_cap:
            from ..ops.stabilization import (make_shock_capture_fn,
                                             make_shock_capture_soa)
            caps = {}
            caps_soa = {}
            for ct in cts:
                caps[ct] = make_shock_capture_fn(
                    ops_by_ct[ct], run_input.s0, run_input.expf_fac,
                    run_input.expf_order, run_input.expf_cutoff,
                    run_input.shock_det_field, self.n_dims, dtype)
                caps_soa[ct] = make_shock_capture_soa(
                    ops_by_ct[ct], run_input.s0, run_input.expf_fac,
                    run_input.expf_order, run_input.expf_cutoff,
                    run_input.shock_det_field, self.n_dims, dtype)
            post_stage = lambda ut: tuple(
                caps[ct](u)[0] for ct, u in zip(cts, ut))
            self._post_stage_soa = lambda ut: tuple(
                caps_soa[ct](u) for ct, u in zip(cts, ut))
            self.sensor_fns = {ct: (lambda u, c=caps[ct]: c(u)[1])
                               for ct in cts}
        self._pre_step = None
        self._pre_step_soa = None
        if run_input.LES and run_input.SGS_model == 3:
            from ..ops.les_filter import build_les_filter
            svv = {ct: jnp.asarray(build_les_filter(
                ops_by_ct[ct], run_input.filter_type,
                run_input.filter_ratio), dtype=dtype) for ct in cts}
            self._pre_step = lambda ut: tuple(
                jnp.einsum("ku,euf->ekf", svv[ct], u)
                for ct, u in zip(cts, ut))
            self._pre_step_soa = lambda ut: tuple(
                jax.lax.dot_general(svv[ct], u, (((1,), (0,)), ((), ())),
                                    preferred_element_type=dtype)
                for ct, u in zip(cts, ut))
        self._step = make_step_fn(self.residual_fn, run_input.adv_type,
                                  post_stage=post_stage)
        self.n_stages = N_STAGES[run_input.adv_type]

        self.u = tuple(
            jnp.asarray(initial_condition(run_input,
                                          self.blocks[ct].pos_upts,
                                          self.n_fields), dtype=dtype)
            for ct in cts)
        self.reg = jax.tree.map(jnp.zeros_like, self.u)
        self.time = 0.0

        # ---- featured runs on mixed meshes: body forcing + running time
        # averages ride both chunk paths (the reference treats every
        # element type uniformly, ref:src/eles.cpp:5281-5484, :5630-5700).
        self._forcing = bool(run_input.forcing) and run_input.equation == 0
        self._mdot_old = jnp.asarray(run_input.body_force_mdot0
                                     if self._forcing else 0.0, dtype)
        self._force_slots = None
        if self._forcing:
            # inflow plane = cyclic faces with normal -x, per type block
            # (ref:src/eles.cpp:5313-5337, the reference's inlet hack)
            from ..config.params import CYCLIC as _CYC
            from ..mesh.core import NUM_F_PER_C
            loc_of = np.zeros(mesh.n_cells, dtype=np.int64)
            for ct in cts:
                loc_of[self.mt.sels[ct]] = np.arange(self.mt.sels[ct].size)
            fslots = {ct: [] for ct in cts}
            for c in range(mesh.n_cells):
                ct = int(mesh.ctype[c])
                o = ops_by_ct[ct]
                foff = np.concatenate([[0], np.cumsum(o.n_fpts_per_face)])
                for k in range(NUM_F_PER_C[ct]):
                    bid = int(mesh.bc_id[c, k])
                    if bid < 0 or bc_flags.get(bid, -1) != _CYC:
                        continue
                    sl = (loc_of[c] * o.n_fpts + foff[k]
                          + np.arange(int(o.n_fpts_per_face[k])))
                    if self.blocks[ct].norm_fpts[sl[0], 0] < -0.99:
                        fslots[ct].append(sl)
            if not any(fslots[ct] for ct in cts):
                raise ValueError("body forcing: no -x cyclic inflow plane")
            self._force_slots = {}
            self._force_wdA = {}
            for ct in cts:
                if fslots[ct]:
                    fs = np.concatenate(fslots[ct])
                    self._force_slots[ct] = fs
                    o = ops_by_ct[ct]
                    self._force_wdA[ct] = (o.fpt_weights[fs % o.n_fpts]
                                           * self.blocks[ct].tdA_fpts[fs])
        self._avg = bool(run_input.average_fields)
        self.u_avg = None
        if self._avg:
            for f_ in run_input.average_fields:
                if f_ not in ("rho_average", "u_average", "v_average",
                              "w_average", "e_average"):
                    raise ValueError(f"unknown average field '{f_}'")
            self.u_avg = tuple(
                jnp.zeros((self.blocks[ct].n_eles, ops_by_ct[ct].n_upts,
                           len(run_input.average_fields)), dtype)
                for ct in cts)
        self._t_sim = jnp.asarray(0.0, dtype)
        # BC ramping (ref:src/bdy_inters.cpp:482-509): traced iteration
        # counter threaded into the bc closures of both mixed residuals
        self._has_ramp = any(getattr(b, "pressure_ramp", 0)
                             for b in run_input.bc_list) \
            if run_input.bc_list else False
        self._iter_k = jnp.asarray(1, jnp.int32)  # ref:src/input.cpp:377
        self._featured = (self._forcing or self._avg or self._has_ramp
                          or self.turb_inlet is not None)
        self._opp0_by_ct = {ct: jnp.asarray(ops_by_ct[ct].opp_0, dtype)
                            for ct in cts}

        nF = self.n_fields
        d = self.n_dims
        forcing = self._forcing
        avg = self._avg
        has_ramp = self._has_ramp
        ti = self.turb_inlet
        bdy_idx = (jnp.asarray(self.mt.bdy_slot, jnp.int32)
                   if ti is not None else None)
        adv = run_input.adv_type
        prec = jax.lax.Precision[
            getattr(self.rcfg, "precision", "highest").upper()]
        if forcing:
            bf_area = run_input.body_force_area
            bf_mdot0 = run_input.body_force_mdot0
            bf_type = run_input.body_force_type
            f_tabs = []          # (block idx, slots, rows_rho/mom, cols, w)
            for i, ct in enumerate(cts):
                if ct in self._force_slots:
                    fs = self._force_slots[ct]
                    Pf_ = ops_by_ct[ct].n_fpts
                    f_tabs.append((
                        i,
                        jnp.asarray(fs, jnp.int32),
                        jnp.asarray((fs % Pf_) * nF, jnp.int32),
                        jnp.asarray((fs % Pf_) * nF + 1, jnp.int32),
                        jnp.asarray(fs // Pf_, jnp.int32),
                        jnp.asarray(self._force_wdA[ct], dtype), Pf_))
        if avg:
            avg_fields = list(run_input.average_fields)
            spinup = run_input.spinup_time
        opp0 = self._opp0_by_ct

        def bdy_u(u, soa):
            """Boundary-point solution (Fb, nfp, F) from the per-type
            state: per-block opp_0 extrapolation concatenated into the
            global flat slot order, gathered at the bdy table."""
            parts = []
            for i, ct in enumerate(cts):
                if soa:
                    d2 = jax.lax.dot_general(
                        opp0[ct], u[i], (((1,), (0,)), ((), ())),
                        precision=prec,
                        preferred_element_type=u[i].dtype)   # (Pf, F, E)
                    parts.append(jnp.transpose(d2, (2, 0, 1)).reshape(
                        -1, nF))
                else:
                    parts.append(jnp.einsum(
                        "pu,euf->epf", opp0[ct], u[i], precision=prec,
                        preferred_element_type=u[i].dtype).reshape(-1, nF))
            return jnp.concatenate(parts)[bdy_idx]

        def body_force(u, mdot_old, dt_s, soa):
            """bf (nF,) from the psum-free global inflow integrals; u in
            the layout the chunk runs ((U,F,E_t) tuples when soa)."""
            z = jnp.zeros((), u[0].dtype)
            mflux, rho_int = z, z
            for (i, sl, r0_, r1_, cc, w_, Pf_) in f_tabs:
                if soa:
                    d2 = jax.lax.dot_general(
                        opp0[cts[i]], u[i], (((1,), (0,)), ((), ())),
                        precision=prec,
                        preferred_element_type=u[i].dtype).reshape(
                            Pf_ * nF, -1)
                    mflux = mflux + jnp.sum(w_ * d2[r1_, cc])
                    rho_int = rho_int + jnp.sum(w_ * d2[r0_, cc])
                else:
                    d2 = jnp.einsum("pu,euf->epf", opp0[cts[i]], u[i],
                                    precision=prec,
                                    preferred_element_type=u[i].dtype
                                    ).reshape(-1, nF)
                    uf = d2[sl]
                    mflux = mflux + jnp.sum(w_ * uf[:, 1])
                    rho_int = rho_int + jnp.sum(w_ * uf[:, 0])
            ubulk = jnp.where(rho_int == 0, 0.0, mflux / rho_int)
            if bf_type == 1:
                bf1 = (bf_mdot0 - mflux) / (bf_area * dt_s)
            else:
                bf1 = (bf_mdot0 - 2.0 * mflux + mdot_old) \
                    / (bf_area * dt_s)
            bf = jnp.zeros((nF,), u[0].dtype).at[1].set(bf1)
            return bf.at[d + 1].set(bf1 * ubulk), mflux

        def avg_update(u, ua, t_sim, dt_s, soa):
            """Running average per block (ref:src/eles.cpp:5676-5698);
            field axis is 1 in the (U, F, E) layout, -1 in (E, U, F)."""
            ax = 1 if soa else -1
            sel = (lambda a, k: a[:, k] if soa else a[..., k])
            out = []
            for ub, uab in zip(u, ua):
                rho = sel(ub, 0)
                cols = []
                for f_ in avg_fields:
                    if f_ == "rho_average":
                        cols.append(rho)
                    elif f_ == "u_average":
                        cols.append(sel(ub, 1) / rho)
                    elif f_ == "v_average":
                        cols.append(sel(ub, 2) / rho)
                    elif f_ == "w_average":
                        cols.append(sel(ub, 3) / rho)
                    else:  # e_average
                        cols.append(sel(ub, d + 1) / rho)
                cur = jnp.stack(cols, axis=ax)
                t_rel = t_sim - spinup
                a = (t_rel - dt_s) / t_rel
                b = dt_s / t_rel
                out.append(jnp.where(t_rel <= dt_s, cur,
                                     a * uab + b * cur))
            return tuple(out)

        if self.residual_soa is not None:
            step_soa = make_step_fn(self.residual_soa, run_input.adv_type,
                                    post_stage=self._post_stage_soa)
            pre_soa = self._pre_step_soa
            residual_soa = self.residual_soa
            post_soa = self._post_stage_soa

            def run_chunk(state, dt, n_steps):
                # transpose each block to elements-minor once per chunk;
                # the whole scan runs on (U_t, F, E_t) state.  Local dt
                # arrives as an (E_t, 1, 1) tuple for the (E, U, F)
                # layout; re-lay it out along the minor element axis.
                tr = lambda t: tuple(jnp.transpose(a, (1, 2, 0)) for a in t)
                bk = lambda t: tuple(jnp.transpose(a, (2, 0, 1)) for a in t)
                dt_c = (tuple(jnp.reshape(a, (1, 1, -1)) for a in dt)
                        if isinstance(dt, tuple) else dt)
                u0, r0 = state[0], state[1]
                us, rs = tr(u0), tr(r0)
                if not self._featured:
                    def body(carry, _):
                        u = carry[0]
                        if pre_soa is not None:
                            u = pre_soa(u)
                        return step_soa(u, carry[1], dt_c), None
                    import os as _os
                    unroll = int(_os.environ.get("HIFILES_UNROLL", "1"))
                    (us, rs), _ = jax.lax.scan(body, (us, rs), None,
                                               length=n_steps,
                                               unroll=unroll)
                    return bk(us), bk(rs)

                (k0, ti0, mdot0_, tsim0, ua0) = (state[2], state[3],
                                                 state[4], state[5],
                                                 state[6])
                uas = tr(ua0) if avg else ua0
                dt_s0 = (jnp.min(jnp.stack([jnp.min(a) for a in dt_c]))
                         if isinstance(dt_c, tuple) else dt_c)

                def body(carry, _):
                    u, r, k, ti_state, mdot_old, t_sim, uav = carry
                    if pre_soa is not None:
                        u = pre_soa(u)
                    ramp = k.astype(u[0].dtype) if has_ramp else None
                    fluc = None
                    if ti is not None:
                        ti_state, fluc = ti.update(ti_state,
                                                   bdy_u(u, soa=True),
                                                   dt_s0)
                    source = None
                    if forcing:
                        bf, mdot_old = body_force(u, mdot_old, dt_s0,
                                                  soa=True)
                        bf2 = bf[:, None]       # broadcasts (U, F, E_t)
                        source = lambda uu: tuple(bf2 for _ in uu)
                    inner = make_step_fn(
                        lambda uu: residual_soa(uu, fluc=fluc, ramp=ramp),
                        adv, source_fn=source, post_stage=post_soa)
                    u, r = inner(u, r, dt_c)
                    t_sim = t_sim + dt_s0
                    if avg:
                        uav = avg_update(u, uav, t_sim, dt_s0, soa=True)
                    return (u, r, k + 1, ti_state, mdot_old, t_sim,
                            uav), None

                carry = (us, rs, k0, ti0, mdot0_, tsim0, uas)
                carry, _ = jax.lax.scan(body, carry, None, length=n_steps)
                us, rs, k0, ti0, mdot0_, tsim0, uas = carry
                return (bk(us), bk(rs), k0, ti0, mdot0_, tsim0,
                        bk(uas) if avg else uas)
        else:
            residual_fn = self.residual_fn
            post_slot = post_stage

            def run_chunk(state, dt, n_steps):
                if not self._featured:
                    def body(carry, _):
                        u, r = carry
                        if self._pre_step is not None:
                            u = self._pre_step(u)
                        return self._step(u, r, dt), None
                    state, _ = jax.lax.scan(body, state, None,
                                            length=n_steps)
                    return state

                dt_s0 = (jnp.min(jnp.stack([jnp.min(a) for a in dt]))
                         if isinstance(dt, tuple) else dt)

                def body(carry, _):
                    u, r, k, ti_state, mdot_old, t_sim, uav = carry
                    if self._pre_step is not None:
                        u = self._pre_step(u)
                    ramp = k.astype(u[0].dtype) if has_ramp else None
                    fluc = None
                    if ti is not None:
                        ti_state, fluc = ti.update(ti_state,
                                                   bdy_u(u, soa=False),
                                                   dt_s0)
                    source = None
                    if forcing:
                        bf, mdot_old = body_force(u, mdot_old, dt_s0,
                                                  soa=False)
                        source = lambda uu: tuple(bf for _ in uu)
                    inner = make_step_fn(
                        lambda uu: residual_fn(uu, fluc=fluc, ramp=ramp),
                        adv, source_fn=source, post_stage=post_slot)
                    u, r = inner(u, r, dt)
                    t_sim = t_sim + dt_s0
                    if avg:
                        uav = avg_update(u, uav, t_sim, dt_s0, soa=False)
                    return (u, r, k + 1, ti_state, mdot_old, t_sim,
                            uav), None

                state, _ = jax.lax.scan(body, state, None, length=n_steps)
                return state

        self._run_chunk = jax.jit(run_chunk, static_argnums=2,
                                  donate_argnums=0)

    # ------------------------------------------------------------------
    def compute_dt(self) -> float:
        p = self.p
        if p.dt_type == 0:
            return p.dt
        dts = []
        for ct, u in zip(self.cts, self.u):
            lam = np.asarray(max_wavespeed(u, p.gamma, self.n_dims))
            dt_ele = (p.CFL * self.blocks[ct].h_ref / lam.max(axis=1)
                      / (2 * p.order + 1))
            dts.append(dt_ele.min())
        return float(min(dts))

    def run(self, n_steps: int, dt: float | None = None):
        if dt is None:
            dt = self.compute_dt()
        if self._featured:
            ua = self.u_avg if self.u_avg is not None \
                else jnp.zeros((), self.dtype)
            state = self._run_chunk(
                (self.u, self.reg, self._iter_k, self._ti_state,
                 self._mdot_old, self._t_sim, ua),
                jnp.asarray(dt, self.dtype), n_steps)
            (self.u, self.reg, self._iter_k, self._ti_state,
             self._mdot_old, self._t_sim, ua) = state
            if self._avg:
                self.u_avg = ua
        else:
            state = self._run_chunk((self.u, self.reg),
                                    jnp.asarray(dt, self.dtype), n_steps)
            self.u, self.reg = state
        self.time += dt * n_steps
        return self.u

    def inflow_massflux(self):
        """(mass_flux, ubulk, next body force) through the -x cyclic
        inflow plane, summed over type blocks, host-side — the rows of
        the reference's massflux.dat (ref:src/eles.cpp:5430-5453)."""
        if not self._forcing:
            return None
        tot_m = tot_r = 0.0
        for i, ct in enumerate(self.cts):
            if ct not in self._force_slots:
                continue
            fs = self._force_slots[ct]
            w = np.asarray(self._force_wdA[ct], dtype=np.float64)
            u = np.asarray(self.u[i], dtype=np.float64)
            d2 = np.einsum("pu,euf->epf", self.blocks[ct].ops.opp_0,
                           u).reshape(-1, self.n_fields)
            uf = d2[fs]
            tot_m += (w * uf[:, 1]).sum()
            tot_r += (w * uf[:, 0]).sum()
        ubulk = 0.0 if tot_r == 0 else tot_m / tot_r
        p = self.p
        if p.body_force_type == 1:
            bf1 = (p.body_force_mdot0 - tot_m) / (p.body_force_area * p.dt)
        else:
            bf1 = (p.body_force_mdot0 - 2.0 * tot_m
                   + float(self._mdot_old)) / (p.body_force_area * p.dt)
        return tot_m, ubulk, bf1

    def _monitor_residual(self):
        """Per-block device residual for the monitor row; SoA fast path
        when engaged (same rationale as Solver._monitor_residual)."""
        if self.residual_soa is None:
            return self.residual_fn(self.u)
        if getattr(self, "_res_soa_jit", None) is None:
            rsoa = self.residual_soa

            def f(u):
                tr = lambda t: tuple(jnp.transpose(a, (1, 2, 0)) for a in t)
                bk = lambda t: tuple(jnp.transpose(a, (2, 0, 1)) for a in t)
                return bk(rsoa(tr(u)))
            self._res_soa_jit = jax.jit(f)
        return self._res_soa_jit(self.u)

    def residual_norm(self, norm_type: int = 2) -> np.ndarray:
        rs = [np.asarray(r, dtype=np.float64)
              for r in self._monitor_residual()]
        n_pts = sum(r.shape[0] * r.shape[1] for r in rs)
        if norm_type == 1:
            return sum(np.abs(r).sum(axis=(0, 1)) for r in rs) / n_pts
        if norm_type == 2:
            return np.sqrt(sum((r * r).sum(axis=(0, 1))
                               for r in rs)) / n_pts
        return np.max([np.abs(r).max(axis=(0, 1)) for r in rs], axis=0)

    def compute_error(self, norm_type: int | None = None) -> np.ndarray:
        """Volume-cubature error vs the analytic test case, summed over all
        blocks (ref:src/eles.cpp:5076-5136; the reference likewise reduces
        over every eles object)."""
        from .ics import analytic_solution
        p = self.p
        norm_type = norm_type if norm_type is not None else p.error_norm_type
        out = np.zeros((2, self.n_fields))
        for ct, u in zip(self.cts, self.u):
            b = self.blocks[ct]
            disu = np.einsum("cu,euf->ecf", b.ops.opp_vol_cubpts,
                             np.asarray(u, dtype=np.float64))
            sol_a, _ = analytic_solution(p, b.pos_vol_cubpts, self.time,
                                         self.n_fields)
            err = disu - sol_a
            w = b.ops.w_vol_cubpts[None, :] * b.detjac_vol_cubpts
            if norm_type == 1:
                out[0] += np.einsum("ec,ecf->f", w, np.abs(err))
            else:
                out[0] += np.einsum("ec,ecf->f", w, err * err)
        return out

    def total_mass_energy(self) -> np.ndarray:
        """Volume integrals of the conserved fields (conservation check)."""
        tot = np.zeros(self.n_fields)
        for ct, u in zip(self.cts, self.u):
            b = self.blocks[ct]
            disu = np.einsum("cu,euf->ecf", b.ops.opp_vol_cubpts,
                             np.asarray(u, dtype=np.float64))
            w = b.ops.w_vol_cubpts[None, :] * b.detjac_vol_cubpts
            tot += np.einsum("ec,ecf->f", w, disu)
        return tot
