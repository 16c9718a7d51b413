"""The jitted FR residual: one RK-stage spatial operator.

TPU-native reformulation of CalcResidual (ref:src/solver.cpp:50-223): every
stage is a batched tensor contraction over all elements of a type, face
exchange is a pair of gathers over precomputed slot tables, and the common
flux returns to element storage through a single inverse gather — no
scatters, no pointers, fully fusable by XLA.

Fast path (default): the discontinuous normal flux never visits the flux
points; it is folded into ``opp_div_fused`` (see ops/operators.py).  Parity
path (``fused=False``) applies opp_1/opp_2/opp_3 in the reference's exact
order for bit-level comparisons.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..models.euler import inviscid_flux
from ..models.viscous import adv_diff_viscous_flux, viscous_flux
from ..ops import riemann
from .elements import ElementBlock
from .kernels import adj_apply, adj_apply_cat, adjT_apply, opmat, opmat_md


@dataclasses.dataclass(frozen=True)
class ResidualConfig:
    """Static numeric parameters closed over by the jitted residual."""
    equation: int = 0
    viscous: bool = False
    riemann_solve_type: int = 0
    gamma: float = 1.4
    prandtl: float = 0.72
    prandtl_t: float = 0.9
    mu_inf: float = 0.0
    rt_inf: float = 1.0
    c_sth: float = 0.0
    fix_vis: int = 1
    ldg_tau: float = 0.0
    ldg_beta: float = 0.5
    rans: bool = False
    wave_speed: tuple = (0.0, 0.0, 0.0)
    lambda_lf: float = 1.0
    diff_coeff: float = 0.0
    fused: bool = True
    n_fields: int = 4
    # TPU matmul precision: f32 dots default to one bf16 MXU pass, which is
    # far too coarse for FR operators (observed ~6e-4 error per RK step).
    # HIGHEST uses enough bf16 passes for full f32 accuracy.
    precision: str = "highest"
    over_int: bool = False
    # LES (ref:src/eles.cpp:2395-2646)
    les: bool = False
    sgs_model: int = 0
    C_s: float = 0.0
    filter_ratio: float = 2.0
    filter_type: int = 2
    kappa: float = 0.41
    # SA constants (ref:src/input.cpp:669-681)
    c_v1: float = 7.1
    c_v2: float = 0.7
    c_v3: float = 0.9
    c_b1: float = 0.1355
    c_b2: float = 0.622
    c_w2: float = 0.3
    c_w3: float = 2.0
    omega: float = 2.0 / 3.0


class BlockArrays:
    """ElementBlock constants cast to the compute dtype as jnp arrays."""

    def __init__(self, block: ElementBlock, dtype):
        ops = block.ops
        f = lambda a: jnp.asarray(a, dtype=dtype)
        i = lambda a: jnp.asarray(a, dtype=jnp.int32)
        self.n_eles = block.n_eles
        self.n_upts = ops.n_upts
        self.n_fpts = ops.n_fpts
        self.n_dims = ops.n_dims
        self.opp_0 = f(ops.opp_0)
        self.opp_1_cat = f(ops.opp_1_cat)
        self.opp_2_cat = f(ops.opp_2_cat)
        self.opp_3 = f(ops.opp_3)
        self.opp_div_fused = f(ops.opp_div_fused)
        self.tnorm = f(ops.tnorm_fpts)
        self.detjac_upts = f(block.detjac_upts)
        self.inv_detjac_upts = f(1.0 / block.detjac_upts)
        self.jginv_upts = f(block.jginv_upts)
        self.tdA = f(block.tdA_fpts)
        self.norm = f(block.norm_fpts)
        self.inv_detjac_fpts = f(1.0 / block.detjac_fpts)
        self.jginv_fpts = f(block.jginv_fpts)
        self.int_slot_l = i(block.int_slot_l)
        self.int_slot_r = i(block.int_slot_r)
        self.bdy_slot = i(block.bdy_slot)
        self.slot_src = i(block.slot_src)
        self.slot_sign = f(block.slot_sign)
        # face geometry pre-gathered at setup (constant across calls)
        self.norm_int_l = f(block.norm_fpts[block.int_slot_l])
        self.norm_bdy = f(block.norm_fpts[block.bdy_slot])
        self.opp_2_stack = f(np.stack([ops.opp_2[g]
                                       for g in range(ops.n_dims)]))
        self.opp_5_stack = f(np.stack(
            [ops.opp_3 * ops.tnorm_fpts[None, :, g]
             for g in range(ops.n_dims)]))
        # single fused divergence operator: [opp_div_fused | opp_3] applied
        # to [tdisf_cat ; norm_tconf]
        self.opp_div_all = f(np.concatenate([ops.opp_div_fused, ops.opp_3],
                                            axis=1))
        if block.jginv_over is not None:
            self.jginv_over = f(block.jginv_over)
            self.opp_over = f(block.opp_over)
            self.over_filter = f(block.over_filter)
        # LES geometric quantities: Deardorff cutoff length per point
        # (ref:src/eles.cpp:2480-2481) and wall distance
        ref_vol = {1: 4.0, 4: 8.0, 0: 2.0, 2: 4.0 / 3.0, 3: 4.0}[ops.ele_type]
        vol = block.detjac_upts * ref_vol                    # (E, U)
        self.delta_upts = f(vol ** (1.0 / ops.n_dims) / (ops.order + 1))
        vol_f = block.detjac_fpts * ref_vol                  # (S,)
        self.delta_slot = f(vol_f ** (1.0 / ops.n_dims) / (ops.order + 1))
        if getattr(block, "wall_dist_upts", None) is not None:
            self.wdist_upts = f(block.wall_dist_upts)
            self.wdist_slot = f(block.wall_dist_fpts)
        else:
            self.wdist_upts = jnp.full_like(self.delta_upts, 1e10)
            self.wdist_slot = jnp.full_like(self.delta_slot, 1e10)
        self.les_filter = None

        # --- face-major fast-path tables.  Slots are face-contiguous, so
        # when every face has the same fpt count the per-slot gathers can be
        # replaced by face-ROW gathers of (nfp*F)-wide rows — full TPU lane
        # tiles instead of 5-wide rows (measured 4-10x faster) — plus
        # one-hot batched matmuls for the within-face partner rotation
        # (bit-exact at HIGHEST precision, 2x faster than take_along_axis).
        self.uniform = bool(np.all(ops.n_fpts_per_face
                                   == ops.n_fpts_per_face[0]))
        if self.uniform and block.int_slot_l.size:
            nfp = int(ops.n_fpts_per_face[0])
            nf = ops.n_faces
            Bk = block.n_eles * nf
            Fi = block.int_slot_l.shape[0]
            Fb = block.bdy_slot.shape[0] if block.bdy_slot.size else 0
            self.nfp, self.nfaces, self.n_blocks = nfp, nf, Bk
            self.n_int_faces, self.n_bdy_faces = Fi, Fb
            fidx_l = block.int_slot_l[:, 0] // nfp
            fidx_r = block.int_slot_r[:, 0] // nfp
            perm_r = block.int_slot_r % nfp           # (Fi, nfp)
            P = np.zeros((Fi, nfp, nfp), dtype=np.float64)
            P[np.arange(Fi)[:, None], np.arange(nfp)[None, :], perm_r] = 1.0
            src_face = -np.ones(Bk, dtype=np.int64)
            src_face[fidx_l] = np.arange(Fi)
            src_face[fidx_r] = Fi + np.arange(Fi)
            if Fb:
                bidx = block.bdy_slot[:, 0] // nfp
                src_face[bidx] = 2 * Fi + np.arange(Fb)
                self.bidx = i(bidx)
            if np.any(src_face < 0):
                self.uniform = False   # unexpected coverage hole: slot path
            else:
                self.fidx_l = i(fidx_l)
                self.fidx_r = i(fidx_r)
                self.perm_onehot = f(P)
                self.src_face = i(src_face)
                self.tdA_b = f(block.tdA_fpts.reshape(Bk, nfp))
                # per-side face geometry for gather-then-transform
                # (int_slot_r rows are already in partner order)
                self.jginv_int_l = f(block.jginv_fpts[block.int_slot_l])
                self.jginv_int_r = f(block.jginv_fpts[block.int_slot_r])
                self.inv_detjac_int_l = f(
                    1.0 / block.detjac_fpts[block.int_slot_l])
                self.inv_detjac_int_r = f(
                    1.0 / block.detjac_fpts[block.int_slot_r])
                if Fb:
                    self.jginv_bdy = f(block.jginv_fpts[block.bdy_slot])
                    self.inv_detjac_bdy = f(
                        1.0 / block.detjac_fpts[block.bdy_slot])
        else:
            self.uniform = False


def make_residual_fn(block: ElementBlock, cfg: ResidualConfig, dtype,
                     bc_fns=None, face_path: bool | None = None):
    """Build residual(u, fluc=None) -> rhs with u (E, U, F),
    rhs = -div_tconf/detjac.

    ``bc_fns`` is a bc.BCFunctions supplying the boundary common fluxes and
    LDG common solutions (None when the mesh is fully periodic).
    ``fluc`` (Fb, nfp, d): turbulent-inlet velocity fluctuations forwarded
    to the boundary ghost states (ref:src/bdy_inters.cpp:250-254).
    ``face_path`` overrides the automatic face-major fast-path selection
    (for equivalence tests).
    """
    B = BlockArrays(block, dtype)
    d = B.n_dims
    E, U, Pf = B.n_eles, B.n_upts, B.n_fpts
    nF = cfg.n_fields
    has_bdy = block.bdy_slot.size > 0
    prec = jax.lax.Precision[cfg.precision.upper()]
    use_similarity = cfg.les and cfg.sgs_model in (2, 4)
    if use_similarity:
        from ..ops.les_filter import build_les_filter
        les_filter = jnp.asarray(
            build_les_filter(block.ops, cfg.filter_type, cfg.filter_ratio),
            dtype=dtype)

    def phys_flux(u):
        """(E, U, F, d) physical inviscid flux."""
        if cfg.equation == 0:
            return inviscid_flux(u, cfg.gamma, d)
        ws = jnp.asarray(cfg.wave_speed[:d], dtype=u.dtype)
        return u[..., None] * ws  # (E,U,1,d)

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
            # eddy-viscosity SGS models add to the viscous flux
            # (ref:src/eles.cpp:2330-2361)
            if cfg.les and cfg.sgs_model in (0, 1, 2) and delta is not None:
                from ..models.sgs import sgs_flux
                fv = fv + sgs_flux(
                    u, grad, cfg.filter_ratio * delta, wdist,
                    sgs_model=cfg.sgs_model, C_s=cfg.C_s, gamma=cfg.gamma,
                    prandtl_t=cfg.prandtl_t, n_dims=d, kappa=cfg.kappa)
            return fv
        return adv_diff_viscous_flux(grad, cfg.diff_coeff)

    # ------------------------------------------------------------------
    # face-major fast path: face-ROW gathers + one-hot partner rotation
    # (see BlockArrays.uniform).  Same math as the slot path below, laid
    # out for the TPU's 128-lane tiles.
    use_face_path = (B.uniform and not cfg.les) if face_path is None \
        else (face_path and B.uniform)

    def perm_apply(x):
        """r-block rows -> partner (l) order; x (Fi, nfp, W)."""
        return jnp.einsum("fjk,fkw->fjw", B.perm_onehot, x,
                          preferred_element_type=dtype, precision=prec)

    def perm_T_apply(x):
        """partner (l) order -> r-block rows; x (Fi, nfp, W)."""
        return jnp.einsum("fjk,fjw->fkw", B.perm_onehot, x,
                          preferred_element_type=dtype, precision=prec)

    def residual_face(u, fluc=None, ramp=None):
        Fi, Fb = B.n_int_faces, B.n_bdy_faces
        nfp, Bk = B.nfp, B.n_blocks
        disu_f = jnp.einsum("pu,euf->epf", B.opp_0, u,
                            preferred_element_type=dtype, precision=prec)
        fb = disu_f.reshape(Bk, nfp * nF)
        u_l = fb[B.fidx_l].reshape(Fi, nfp, nF)
        u_r = perm_apply(fb[B.fidx_r].reshape(Fi, nfp, nF))
        norm_l = B.norm_int_l
        if has_bdy:
            u_bl = fb[B.bidx].reshape(Fb, nfp, nF)
            norm_b = B.norm_bdy

        if cfg.viscous:
            tgrad = jnp.stack([opmat(B.opp_2_stack[g], u, dtype, prec)
                               for g in range(d)], axis=-1)
            u_c_int = riemann.ldg_common_solution(u_l, u_r, norm_l,
                                                  cfg.ldg_beta)
            rows = [u_c_int.reshape(Fi, nfp * nF),
                    perm_T_apply(u_c_int).reshape(Fi, nfp * nF)]
            if has_bdy:
                u_c_bdy = bc_fns.ldg_solution(u_bl, norm_b, fluc=fluc, ramp=ramp)
                rows.append(u_c_bdy.reshape(Fb, nfp * nF))
            u_c_cat = jnp.concatenate(rows)
            delta = (u_c_cat[B.src_face] - fb).reshape(E, Pf, nF)
            tgrad = tgrad + jnp.stack(
                [opmat(B.opp_5_stack[g], delta, dtype, prec)
                 for g in range(d)], axis=-1)
            grad_u = adjT_apply(B.jginv_upts, tgrad, B.inv_detjac_upts)
            # gather the TRANSFORMED gradient's face rows first and apply
            # the adjugate after, with per-side pre-gathered jginv: the
            # (S, F, d) physical gradient otherwise forces XLA into a
            # layout-change copy + reshape pair costing ~7 ms/stage
            # (half the residual) on TPU v5e
            tb = opmat(B.opp_0, tgrad.reshape(E, U, nF * d), dtype,
                       prec).reshape(Bk, nfp * nF * d)
            tg_l = tb[B.fidx_l].reshape(Fi, nfp, nF, d)
            g_l = adjT_apply(B.jginv_int_l, tg_l, B.inv_detjac_int_l)
            tg_r = perm_apply(tb[B.fidx_r].reshape(Fi, nfp, nF * d)
                              ).reshape(Fi, nfp, nF, d)
            g_r = adjT_apply(B.jginv_int_r, tg_r, B.inv_detjac_int_r)

        if cfg.over_int:
            u_over = opmat(B.opp_over, u, dtype, prec)
            f_over = phys_flux(u_over)
            tdisf_over = adj_apply(B.jginv_over, f_over)
            tdisf = opmat_md(B.over_filter, tdisf_over, dtype, prec)
            if cfg.viscous:
                fv = phys_visc_flux(u, grad_u, B.delta_upts, B.wdist_upts)
                tdisf = tdisf + adj_apply(B.jginv_upts, fv)
            tdisf_cat = jnp.concatenate(
                [tdisf[..., l] for l in range(d)], axis=1)
        else:
            f = phys_flux(u)
            if cfg.viscous:
                f = f + phys_visc_flux(u, grad_u, B.delta_upts,
                                       B.wdist_upts)
            tdisf_cat = adj_apply_cat(B.jginv_upts, f)

        fn_int = common_inv_flux(u_l, u_r, norm_l)
        if cfg.viscous:
            fv_l = phys_visc_flux(u_l, g_l)
            fv_r = phys_visc_flux(u_r, g_r)
            fn_int = fn_int + riemann.ldg_common_flux(
                u_l, u_r, fv_l, fv_r, norm_l, cfg.ldg_tau, cfg.ldg_beta)
        fn_rows = [fn_int.reshape(Fi, nfp * nF),
                   -perm_T_apply(fn_int).reshape(Fi, nfp * nF)]
        if has_bdy:
            fn_bdy = bc_fns.inv_common_flux(u_bl, norm_b, fluc=fluc, ramp=ramp)
            if cfg.viscous:
                g_b = adjT_apply(B.jginv_bdy,
                                 tb[B.bidx].reshape(Fb, nfp, nF, d),
                                 B.inv_detjac_bdy)
                fn_bdy = fn_bdy + bc_fns.visc_common_flux(
                    u_bl, g_b, norm_b, u, fluc=fluc, ramp=ramp)
            fn_rows.append(fn_bdy.reshape(Fb, nfp * nF))
        fn_cat = jnp.concatenate(fn_rows)
        norm_tconf = (fn_cat[B.src_face].reshape(Bk, nfp, nF)
                      * B.tdA_b[..., None]).reshape(E, Pf, nF)

        if cfg.fused:
            rhs_cat = jnp.concatenate([tdisf_cat, norm_tconf], axis=1)
            div = opmat(B.opp_div_all, rhs_cat, dtype, prec)
        else:
            div = jnp.einsum("ku,euf->ekf", B.opp_2_cat, tdisf_cat,
                             preferred_element_type=dtype, precision=prec)
            norm_tdisf = jnp.einsum("pu,euf->epf", B.opp_1_cat, tdisf_cat,
                                    preferred_element_type=dtype,
                                    precision=prec)
            div = div + jnp.einsum("kp,epf->ekf", B.opp_3,
                                   norm_tconf - norm_tdisf,
                                   preferred_element_type=dtype,
                                   precision=prec)
        rhs = -div * B.inv_detjac_upts[..., None]
        if cfg.rans:
            from ..models.sa import sa_source
            src = sa_source(
                u, grad_u, B.wdist_upts, gamma=cfg.gamma, mu_inf=cfg.mu_inf,
                rt_inf=cfg.rt_inf, c_sth=cfg.c_sth, fix_vis=cfg.fix_vis,
                kappa=cfg.kappa, c_v1=cfg.c_v1, c_v2=cfg.c_v2, c_v3=cfg.c_v3,
                c_b1=cfg.c_b1, c_b2=cfg.c_b2, c_w2=cfg.c_w2, c_w3=cfg.c_w3,
                omega=cfg.omega, n_dims=d)
            rhs = rhs.at[..., d + 2].add(src)
        return rhs

    def residual(u, fluc=None, ramp=None):
        # 1. extrapolate solution to flux points (opp_0 GEMM,
        #    ref:src/eles.cpp:1360-1411)
        disu_f = jnp.einsum("pu,euf->epf", B.opp_0, u,
                            preferred_element_type=dtype, precision=prec)
        disu_f_flat = disu_f.reshape(E * Pf, nF)

        # 2. face gathers
        u_l = disu_f_flat[B.int_slot_l]            # (Fi, nfp, F)
        u_r = disu_f_flat[B.int_slot_r]
        norm_l = B.norm_int_l                      # (Fi, nfp, d) constant
        if has_bdy:
            u_bl = disu_f_flat[B.bdy_slot]
            norm_b = B.norm_bdy

        # similarity-model Leonard tensors and their extrapolated SGS flux
        # (ref:src/eles.cpp:2091-2218, :2615-2644, extrapolate_sgsFlux
        # ref:src/eles.cpp:2817)
        if use_similarity:
            from ..models.sgs import similarity_flux, similarity_terms
            Lu, Le = similarity_terms(u, les_filter, d)
            simf_upts = similarity_flux(u, Lu, Le, cfg.gamma, d)  # (E,U,F,d)
            simf_fpts = opmat_md(B.opp_0, simf_upts, dtype,
                                 prec).reshape(E * Pf, nF, d)

        # 3. viscous gradient path (opp_4/opp_5/opp_6,
        #    ref:src/eles.cpp:1823-2052)
        if cfg.viscous:
            # uncorrected transformed gradient (opp_4 == opp_2), one GEMM
            # per reference dim (clean (U,U)x(U,E*F) contractions)
            tgrad = jnp.stack([opmat(B.opp_2_stack[g], u, dtype, prec)
                               for g in range(d)], axis=-1)
            # LDG common solution & delta at every slot
            u_c_int = riemann.ldg_common_solution(u_l, u_r, norm_l,
                                                  cfg.ldg_beta)
            if has_bdy:
                u_c_bdy = bc_fns.ldg_solution(u_bl, norm_b, fluc=fluc, ramp=ramp)
                u_c_all = jnp.concatenate(
                    [u_c_int.reshape(-1, nF), u_c_bdy.reshape(-1, nF)])
            else:
                u_c_all = u_c_int.reshape(-1, nF)
            delta_flat = u_c_all[B.slot_src] - disu_f_flat     # (S, F)
            delta = delta_flat.reshape(E, Pf, nF)
            # gradient correction: opp_5[g] = opp_3 * tnorm[:, g]
            tgrad = tgrad + jnp.stack(
                [opmat(B.opp_5_stack[g], delta, dtype, prec)
                 for g in range(d)], axis=-1)
            # physical gradient at upts: (1/det) JGinv^T . tgrad
            grad_u = adjT_apply(B.jginv_upts, tgrad, B.inv_detjac_upts)
            # extrapolate corrected transformed gradient to fpts (opp_6)
            tgrad_f = opmat_md(B.opp_0, tgrad, dtype, prec).reshape(
                E * Pf, nF, d)
            # jginv_fpts/detjac_fpts are stored flat over slots (S, d, d)
            grad_f_flat = adjT_apply(B.jginv_fpts, tgrad_f,
                                     B.inv_detjac_fpts)

        # 4. physical total flux at upts -> transformed flux.
        # With de-aliasing on, the inviscid flux is evaluated at a richer
        # cubature set and L2-projected back (ref:src/eles.cpp:1480-1545).
        if cfg.over_int:
            u_over = opmat(B.opp_over, u, dtype, prec)
            f_over = phys_flux(u_over)
            tdisf_over = adj_apply(B.jginv_over, f_over)
            tdisf = opmat_md(B.over_filter, tdisf_over, dtype, prec)
            if cfg.viscous:
                fv = phys_visc_flux(u, grad_u, B.delta_upts, B.wdist_upts)
                tdisf = tdisf + adj_apply(B.jginv_upts, fv)
            tdisf_cat = jnp.concatenate(
                [tdisf[..., l] for l in range(d)], axis=1)
        else:
            f = phys_flux(u)                       # (E, U, F, d)
            if cfg.viscous:
                f = f + phys_visc_flux(u, grad_u, B.delta_upts, B.wdist_upts)
                if use_similarity:
                    f = f + simf_upts
            tdisf_cat = adj_apply_cat(B.jginv_upts, f)

        # 5. common interface fluxes (Riemann / LDG,
        #    ref:src/int_inters.cpp:160-344)
        fn_int = common_inv_flux(u_l, u_r, norm_l)
        if cfg.viscous:
            gl = grad_f_flat[B.int_slot_l]
            gr = grad_f_flat[B.int_slot_r]
            fv_l = phys_visc_flux(u_l, gl, B.delta_slot[B.int_slot_l],
                                  B.wdist_slot[B.int_slot_l])
            fv_r = phys_visc_flux(u_r, gr, B.delta_slot[B.int_slot_r],
                                  B.wdist_slot[B.int_slot_r])
            if use_similarity:
                fv_l = fv_l + simf_fpts[B.int_slot_l]
                fv_r = fv_r + simf_fpts[B.int_slot_r]
            fn_int = fn_int + riemann.ldg_common_flux(
                u_l, u_r, fv_l, fv_r, norm_l, cfg.ldg_tau, cfg.ldg_beta)
        if has_bdy:
            fn_bdy = bc_fns.inv_common_flux(u_bl, norm_b, fluc=fluc, ramp=ramp)
            if cfg.viscous:
                fn_bdy = fn_bdy + bc_fns.visc_common_flux(
                    u_bl, grad_f_flat[B.bdy_slot], norm_b, u, fluc=fluc,
                    ramp=ramp)
            fn_all = jnp.concatenate([fn_int.reshape(-1, nF),
                                      fn_bdy.reshape(-1, nF)])
        else:
            fn_all = fn_int.reshape(-1, nF)

        # 6. slot-level normal transformed continuous flux
        #    (sign * tdA * fn, ref:src/int_inters.cpp:217-220)
        norm_tconf_flat = (fn_all[B.slot_src]
                           * (B.slot_sign * B.tdA)[:, None])
        norm_tconf = norm_tconf_flat.reshape(E, Pf, nF)

        # 7. divergence (+ correction lift), one merged GEMM
        if cfg.fused:
            rhs_cat = jnp.concatenate([tdisf_cat, norm_tconf], axis=1)
            div = opmat(B.opp_div_all, rhs_cat, dtype, prec)
        else:
            div = jnp.einsum("ku,euf->ekf", B.opp_2_cat, tdisf_cat,
                             preferred_element_type=dtype, precision=prec)
            norm_tdisf = jnp.einsum("pu,euf->epf", B.opp_1_cat, tdisf_cat,
                                    preferred_element_type=dtype, precision=prec)
            div = div + jnp.einsum("kp,epf->ekf", B.opp_3,
                                   norm_tconf - norm_tdisf,
                                   preferred_element_type=dtype, precision=prec)

        rhs = -div * B.inv_detjac_upts[..., None]

        # SA-RANS source term (ref:src/eles.cpp:2650 calc_src_upts_SA,
        # ref:src/source.cpp:33-105); enters the update as +src
        # (ref:src/eles.cpp:1102: disu -= dt*(div/detjac - src))
        if cfg.rans:
            from ..models.sa import sa_source
            src = sa_source(
                u, grad_u, B.wdist_upts, gamma=cfg.gamma, mu_inf=cfg.mu_inf,
                rt_inf=cfg.rt_inf, c_sth=cfg.c_sth, fix_vis=cfg.fix_vis,
                kappa=cfg.kappa, c_v1=cfg.c_v1, c_v2=cfg.c_v2, c_v3=cfg.c_v3,
                c_b1=cfg.c_b1, c_b2=cfg.c_b2, c_w2=cfg.c_w2, c_w3=cfg.c_w3,
                omega=cfg.omega, n_dims=d)
            rhs = rhs.at[..., d + 2].add(src)
        return rhs

    return residual_face if use_face_path else residual


def make_gradient_fn(block: ElementBlock, cfg: ResidualConfig, dtype,
                     bc_fns=None):
    """Build gradient(u) -> corrected physical gradient at upts (E, U, F, d).

    The same LDG-corrected gradient the viscous residual uses — what the
    reference leaves in ``grad_disu_upts`` after CalcResidual and feeds to
    its force/diagnostic routines (ref:src/eles.cpp:1823-2052,
    compute_wall_forces ref:src/eles.cpp:5824-5838)."""
    B = BlockArrays(block, dtype)
    d = B.n_dims
    E, U, Pf = B.n_eles, B.n_upts, B.n_fpts
    nF = cfg.n_fields
    has_bdy = block.bdy_slot.size > 0
    prec = jax.lax.Precision[cfg.precision.upper()]

    def gradient(u, fluc=None, ramp=None):
        disu_f = jnp.einsum("pu,euf->epf", B.opp_0, u,
                            preferred_element_type=dtype, precision=prec)
        disu_f_flat = disu_f.reshape(E * Pf, nF)
        u_l = disu_f_flat[B.int_slot_l]
        u_r = disu_f_flat[B.int_slot_r]
        tgrad = jnp.stack([opmat(B.opp_2_stack[g], u, dtype, prec)
                           for g in range(d)], axis=-1)
        u_c_int = riemann.ldg_common_solution(u_l, u_r, B.norm_int_l,
                                              cfg.ldg_beta)
        if has_bdy:
            u_bl = disu_f_flat[B.bdy_slot]
            u_c_bdy = bc_fns.ldg_solution(u_bl, B.norm_bdy, fluc=fluc,
                                          ramp=ramp)
            u_c_all = jnp.concatenate(
                [u_c_int.reshape(-1, nF), u_c_bdy.reshape(-1, nF)])
        else:
            u_c_all = u_c_int.reshape(-1, nF)
        delta = (u_c_all[B.slot_src] - disu_f_flat).reshape(E, Pf, nF)
        tgrad = tgrad + jnp.stack(
            [opmat(B.opp_5_stack[g], delta, dtype, prec)
             for g in range(d)], axis=-1)
        return adjT_apply(B.jginv_upts, tgrad, B.inv_detjac_upts)

    return gradient


def make_residual_fm(block: ElementBlock, cfg: ResidualConfig, dtype,
                     bc_fns=None):
    """Field-major residual: state (E, F, U) with the solution-point axis
    minor.

    The (E, U, F) layout keeps F=5 on the minor axis, which the TPU tiles
    to (8, 128) — a 25x padded HBM footprint that showed up in profiles as
    layout-change copies eating half of every stage.  Here every persistent
    volume tensor is (E, F, U) (minor U ≈ 125, a full lane tile), volume
    GEMMs are dot_generals contracting the minor axis, and the only
    AoS data are the small per-face row blocks the face stage always needed.

    Returns residual_fm(u_fm, fluc=None, ramp=None) -> rhs (E, F, U), or
    None when this configuration isn't supported (LES/RANS/over-int/
    non-fused fall back to the face/slot paths)."""
    B = BlockArrays(block, dtype)
    if not B.uniform or cfg.les or cfg.rans or cfg.over_int or not cfg.fused:
        return None
    d = B.n_dims
    E, U, Pf = B.n_eles, B.n_upts, B.n_fpts
    nF = cfg.n_fields
    if nF != d + 2 and cfg.equation == 0:
        return None                      # SA field handled by face path
    Fi, Fb = B.n_int_faces, B.n_bdy_faces
    nfp, nf, Bk = B.nfp, B.nfaces, B.n_blocks
    has_bdy = block.bdy_slot.size > 0
    prec = jax.lax.Precision[cfg.precision.upper()]

    def dg(x, A):
        """(E, C, U') contract minor with A (K, U') -> (E, C, K)."""
        return jax.lax.dot_general(
            x, A, (((2,), (1,)), ((), ())), precision=prec,
            preferred_element_type=dtype)

    f32 = lambda a: jnp.asarray(a, dtype=dtype)
    # jginv planes (E, 1, U) for broadcast against (E, F, U)
    jg_u = [[f32(block.jginv_upts[:, :, l, m])[:, None, :]
             for m in range(d)] for l in range(d)]
    inv_det_u = f32(1.0 / block.detjac_upts)[:, None, :]

    def to_rows(x, C):
        """(E, C, Pf) -> (Bk, nfp*C) face rows, point-major within a row."""
        return jnp.transpose(x.reshape(E, C, nf, nfp),
                             (0, 2, 3, 1)).reshape(Bk, nfp * C)

    def from_rows(r, C):
        """(Bk, nfp*C) -> (E, C, Pf)."""
        return jnp.transpose(r.reshape(E, nf, nfp, C),
                             (0, 3, 1, 2)).reshape(E, C, Pf)

    def perm_apply(x):
        return jnp.einsum("fjk,fkw->fjw", B.perm_onehot, x,
                          preferred_element_type=dtype, precision=prec)

    def perm_T_apply(x):
        return jnp.einsum("fjk,fjw->fkw", B.perm_onehot, x,
                          preferred_element_type=dtype, precision=prec)

    # --- field-plane physics ------------------------------------------
    gamma, mu0, Pr = cfg.gamma, cfg.mu_inf, cfg.prandtl

    def planes_flux(u):
        """Per-dim inviscid flux planes: [d] of (E, F, U)
        (ref:src/flux.cpp:33-125)."""
        if cfg.equation == 1:
            return [u * cfg.wave_speed[m] for m in range(d)]
        rho = u[:, 0]
        m_ = [u[:, 1 + i] for i in range(d)]
        en = u[:, d + 1]
        inv_rho = 1.0 / rho
        v = [mi * inv_rho for mi in m_]
        q2 = sum(vi * vi for vi in v)
        p = (gamma - 1.0) * (en - 0.5 * rho * q2)
        hp = en + p
        out = []
        for mm in range(d):
            rows = [m_[mm]]
            for i in range(d):
                r = m_[i] * v[mm]
                if i == mm:
                    r = r + p
                rows.append(r)
            rows.append(hp * v[mm])
            out.append(jnp.stack(rows, axis=1))
        return out

    def planes_visc_flux(u, gr):
        """Viscous flux planes from gradient planes gr[l] (E, F, U)
        (same algebra as models/viscous.py; fix_vis=1 or Sutherland)."""
        if cfg.equation == 1:
            return [-cfg.diff_coeff * gr[m] for m in range(d)]
        rho = u[:, 0]
        m_ = [u[:, 1 + i] for i in range(d)]
        en = u[:, d + 1]
        inv_rho = 1.0 / rho
        v = [mi * inv_rho for mi in m_]
        q2 = sum(vi * vi for vi in v)
        inte = en * inv_rho - 0.5 * q2
        if cfg.fix_vis:
            mu = mu0
        else:
            rt_ratio = (gamma - 1.0) * inte / cfg.rt_inf
            mu = (mu0 * rt_ratio ** 1.5 * (1.0 + cfg.c_sth)
                  / (rt_ratio + cfg.c_sth))
        gr_rho = [gr[l][:, 0] for l in range(d)]
        gr_m = [[gr[l][:, 1 + i] for l in range(d)] for i in range(d)]
        gr_e = [gr[l][:, d + 1] for l in range(d)]
        dv = [[(gr_m[i][l] - v[i] * gr_rho[l]) * inv_rho for l in range(d)]
              for i in range(d)]
        dint = [(gr_e[l] - (0.5 * q2 + inte) * gr_rho[l]) * inv_rho
                - sum(v[i] * dv[i][l] for i in range(d)) for l in range(d)]
        div = sum(dv[i][i] for i in range(d))
        tau = [[mu * (dv[i][l] + dv[l][i]) for l in range(d)]
               for i in range(d)]
        for i in range(d):
            tau[i][i] = tau[i][i] - 2.0 / 3.0 * mu * div
        kth = mu * gamma / Pr
        out = []
        zero = jnp.zeros_like(rho)
        for mm in range(d):
            rows = [zero]
            for i in range(d):
                rows.append(-tau[i][mm])
            rows.append(-(sum(v[i] * tau[i][mm] for i in range(d))
                          + kth * dint[mm]))
            out.append(jnp.stack(rows, axis=1))
        return out

    def common_inv_flux(u_l, u_r, norm):
        if cfg.equation == 0:
            return riemann.solve(cfg.riemann_solve_type, u_l, u_r, norm,
                                 gamma=cfg.gamma, n_dims=d)
        ws = jnp.asarray(cfg.wave_speed[:d], dtype=u_l.dtype)
        return riemann.lax_friedrichs_flux(u_l, u_r, norm, ws, cfg.lambda_lf)

    def face_visc_flux(u, grad):
        """AoS viscous flux at face points (small arrays)."""
        if cfg.equation == 0:
            return viscous_flux(
                u, grad, gamma=cfg.gamma, prandtl=cfg.prandtl,
                mu_inf=cfg.mu_inf, rt_inf=cfg.rt_inf, c_sth=cfg.c_sth,
                fix_vis=cfg.fix_vis, n_dims=d, rans=False,
                prandtl_t=cfg.prandtl_t)
        return adv_diff_viscous_flux(grad, cfg.diff_coeff)

    def residual_fm(u, fluc=None, ramp=None):
        # 1. extrapolate + face rows
        disu_f = dg(u, B.opp_0)               # (E, F, Pf)
        fb = to_rows(disu_f, nF)              # (Bk, nfp*F)
        u_l = fb[B.fidx_l].reshape(Fi, nfp, nF)
        u_r = perm_apply(fb[B.fidx_r].reshape(Fi, nfp, nF))
        norm_l = B.norm_int_l
        if has_bdy:
            u_bl = fb[B.bidx].reshape(Fb, nfp, nF)
            norm_b = B.norm_bdy

        if cfg.viscous:
            # LDG common solution & per-slot delta (face rows)
            u_c_int = riemann.ldg_common_solution(u_l, u_r, norm_l,
                                                  cfg.ldg_beta)
            rows = [u_c_int.reshape(Fi, nfp * nF),
                    perm_T_apply(u_c_int).reshape(Fi, nfp * nF)]
            if has_bdy:
                u_c_bdy = bc_fns.ldg_solution(u_bl, norm_b, fluc=fluc,
                                              ramp=ramp)
                rows.append(u_c_bdy.reshape(Fb, nfp * nF))
            delta_rows = jnp.concatenate(rows)[B.src_face] - fb
            delta = from_rows(delta_rows, nF)          # (E, F, Pf)
            # corrected transformed gradient planes
            tg = [dg(u, B.opp_2_stack[g]) + dg(delta, B.opp_5_stack[g])
                  for g in range(d)]
            # physical gradient planes at upts
            gr = [sum(jg_u[m][l] * tg[m] for m in range(d)) * inv_det_u
                  for l in range(d)]
            # transformed gradient to face rows (order (F, d) per point)
            tgf = dg(jnp.concatenate(tg, axis=1), B.opp_0)  # (E, d*F, Pf)
            tgfr = jnp.transpose(
                tgf.reshape(E, d, nF, nf, nfp),
                (0, 3, 4, 2, 1)).reshape(Bk, nfp * nF * d)
            tg_l = tgfr[B.fidx_l].reshape(Fi, nfp, nF, d)
            g_l = adjT_apply(B.jginv_int_l, tg_l, B.inv_detjac_int_l)
            tg_r = perm_apply(tgfr[B.fidx_r].reshape(Fi, nfp, nF * d)
                              ).reshape(Fi, nfp, nF, d)
            g_r = adjT_apply(B.jginv_int_r, tg_r, B.inv_detjac_int_r)

        # 2. volume transformed flux planes -> (E, F, d*U)
        fl = planes_flux(u)
        if cfg.viscous:
            fv = planes_visc_flux(u, gr)
            fl = [fl[m] + fv[m] for m in range(d)]
        tdisf = jnp.concatenate(
            [sum(jg_u[l][m] * fl[m] for m in range(d)) for l in range(d)],
            axis=2)                                     # (E, F, d*U)

        # 3. common interface fluxes (AoS face rows)
        fn_int = common_inv_flux(u_l, u_r, norm_l)
        if cfg.viscous:
            fn_int = fn_int + riemann.ldg_common_flux(
                u_l, u_r, face_visc_flux(u_l, g_l), face_visc_flux(u_r, g_r),
                norm_l, cfg.ldg_tau, cfg.ldg_beta)
        fn_rows = [fn_int.reshape(Fi, nfp * nF),
                   -perm_T_apply(fn_int).reshape(Fi, nfp * nF)]
        if has_bdy:
            fn_bdy = bc_fns.inv_common_flux(u_bl, norm_b, fluc=fluc,
                                            ramp=ramp)
            if cfg.viscous:
                g_b = adjT_apply(B.jginv_bdy,
                                 tgfr[B.bidx].reshape(Fb, nfp, nF, d),
                                 B.inv_detjac_bdy)
                fn_bdy = fn_bdy + bc_fns.visc_common_flux(
                    u_bl, g_b, norm_b, None, fluc=fluc, ramp=ramp)
            fn_rows.append(fn_bdy.reshape(Fb, nfp * nF))
        ntc_rows = (jnp.concatenate(fn_rows)[B.src_face].reshape(Bk, nfp, nF)
                    * B.tdA_b[..., None]).reshape(Bk, nfp * nF)
        ntc = from_rows(ntc_rows, nF)                   # (E, F, Pf)

        # 4. merged divergence GEMM on the minor axis
        div = dg(jnp.concatenate([tdisf, ntc], axis=2), B.opp_div_all)
        return -div * inv_det_u

    return residual_fm
