"""Boundary conditions: vectorized ghost-state construction for all 13
BCFLAG kinds (ref:src/bdy_inters.cpp:340-1019 set_boundary_conditions,
:1138-1188 set_boundary_gradients).

Each boundary flux point carries its group's flag and parameters; candidate
ghost states are evaluated for every flag *present in the mesh* and combined
with masks — no data-dependent branching under jit.

``sol_spec`` semantics from the reference:
  0 = inviscid ghost state (mirror walls) for the Riemann solve
  1 = viscous/no-slip state used by the LDG common solution & viscous flux
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp
import numpy as np

from ..config.params import (AD_WALL, ADIABAT_WALL, CHAR, ISOTHERM_WALL,
                             SLIP_WALL, SLIP_WALL_DUAL, SUB_IN_CHAR,
                             SUB_IN_SIMP, SUB_OUT_CHAR, SUB_OUT_SIMP, SUP_IN,
                             SUP_OUT, RunInput)
from ..models.euler import inviscid_flux
from ..models.viscous import adv_diff_viscous_flux, viscous_flux
from ..ops import riemann


@dataclasses.dataclass
class BCFunctions:
    """Closures the residual uses at boundary flux points.

    Every closure takes an optional ``fluc`` — per-boundary-point velocity
    fluctuations from the turbulent inlet (solver/turb_inlet.py); inflow
    ghost states add rho_r * fluc to momentum
    (ref:src/bdy_inters.cpp:250-254, :1060-1117)."""
    inv_common_flux: Callable   # (u_l, norm, fluc=None) -> fn
    ldg_solution: Callable      # (u_l, norm, fluc=None) -> u_c
    visc_common_flux: Callable  # (u_l, grad_l, norm, u_full, fluc) -> fn_v
    ghost_state: Callable = None  # (u_l, norm, sol_spec) -> u_r
    # (wm_ele, wm_upt, wm_dist) numpy tables over boundary faces when wall
    # models are active — lets SoA/sharded callers gather the wall-model
    # input state themselves and pass it via ``wm_state``
    wm_tables: tuple = None


def _pack_params(run_input: RunInput, bcid: np.ndarray, n_dims: int):
    """Per-boundary-face-point parameter arrays gathered by group id."""
    bcs = run_input.bc_list
    def arr(get):
        return np.array([get(b) for b in bcs], dtype=np.float64)[bcid]
    P = {
        "flag": np.array([b.flag for b in bcs], dtype=np.int64)[bcid],
        "rho": arr(lambda b: b.rho),
        "vel": np.stack([arr(lambda b, i=i: b.velocity[i])
                         for i in range(n_dims)], axis=-1),
        "p_static": arr(lambda b: b.p_static),
        "T_static": arr(lambda b: b.T_static),
        "p_total": arr(lambda b: b.p_total),
        "T_total": arr(lambda b: b.T_total),
        "nfs": np.stack([arr(lambda b, i=i: (b.nx, b.ny, b.nz)[i])
                         for i in range(n_dims)], axis=-1),
        "use_wm": arr(lambda b: b.use_wm),
        # pressure/temperature ramping (ref:src/bdy_inters.cpp:482-509)
        "pressure_ramp": arr(lambda b: b.pressure_ramp),
        "p_ramp_coeff": arr(lambda b: b.p_ramp_coeff),
        "T_ramp_coeff": arr(lambda b: b.T_ramp_coeff),
        "p_total_old": arr(lambda b: b.p_total_old),
        "T_total_old": arr(lambda b: b.T_total_old),
    }
    return P


def make_bc_functions(run_input: RunInput, block, rcfg, dtype) -> tuple:
    """Build the three BC closures for one element block.

    Returns (bc_fns.ldg_solution-compatible ghost fn, visc flux fn) wrapped
    in a BCFunctions; see residual.py for usage.
    """
    n_dims = block.ops.n_dims
    nfp = block.bdy_slot.shape[1]
    bcid = np.repeat(block.bdy_bcid[:, None], nfp, axis=1)  # (Fb, nfp)
    P_np = _pack_params(run_input, bcid, n_dims)
    flags_present = sorted(set(int(f) for f in np.unique(P_np["flag"])))
    P_default = {k: jnp.asarray(v,
                                dtype=dtype if k != "flag" else jnp.int32)
                 for k, v in P_np.items()}
    gamma = rcfg.gamma
    # inviscid runs use the dimensional gas constant
    # (ref:src/bdy_inters.cpp:368-371)
    R_ref = run_input.R_gas if not rcfg.viscous else run_input.R_ref
    if np.isnan(R_ref):
        R_ref = run_input.R_gas
    mu_tilde_inf = run_input.mu_tilde_inf

    def prims(u):
        rho = u[..., 0]
        v = u[..., 1:1 + n_dims] / rho[..., None]
        vsq = jnp.sum(v * v, axis=-1)
        p = (gamma - 1.0) * (u[..., n_dims + 1] - 0.5 * rho[..., 0:1].squeeze(-1)
                             * vsq) if False else \
            (gamma - 1.0) * (u[..., n_dims + 1] - 0.5 * rho * vsq)
        return rho, v, vsq, p

    def pack(rho, v, e, u_l):
        out = jnp.concatenate([rho[..., None], rho[..., None] * v,
                               e[..., None]], axis=-1)
        if rcfg.n_fields > n_dims + 2:
            out = jnp.concatenate([out, u_l[..., n_dims + 2:]], axis=-1)
        return out

    def energy(rho, v, p):
        return p / (gamma - 1.0) + 0.5 * rho * jnp.sum(v * v, axis=-1)

    # ------------------------------------------------------------------
    has_ramp = any(getattr(b, "pressure_ramp", 0)
                   for b in run_input.bc_list)

    def ghost_state(u_l, norm, sol_spec, fluc=None, ramp=None, P=None):
        """Vectorized set_boundary_conditions
        (ref:src/bdy_inters.cpp:340-1019).  ``fluc``: turbulent-inlet
        velocity fluctuations added to inflow momentum
        (ref:src/bdy_inters.cpp:250-254).  ``ramp``: traced iteration
        counter for pressure/temperature ramping (ref::482-509).  ``P``:
        per-point BC parameter tables; sharded runs pass their shard's
        rows, otherwise the block's tables are used."""
        P = P if P is not None else P_default
        if rcfg.equation == 1:
            # AD_WALL: trivial Dirichlet (ref:src/bdy_inters.cpp:1011-1018)
            return jnp.zeros_like(u_l)

        rho_l, v_l, vsq_l, p_l = prims(u_l)
        e_l = u_l[..., n_dims + 1]
        vn_l = jnp.sum(v_l * norm, axis=-1)
        c_l = jnp.sqrt(gamma * p_l / rho_l)
        flag = P["flag"]
        u_r = u_l  # default: extrapolate (SUP_OUT)

        def sel(f, cand):
            return jnp.where((flag == f)[..., None], cand, u_r)

        for f in flags_present:
            if f == SUB_IN_SIMP:
                # fixed rho & velocity, free pressure
                # (ref:src/bdy_inters.cpp:374-395)
                rho_r = P["rho"]
                v_r = P["vel"]
                e_r = energy(rho_r, v_r, p_l)
                cand = pack(rho_r, v_r, e_r, u_l)
                if rcfg.rans:
                    cand = cand.at[..., n_dims + 2].set(mu_tilde_inf)
                u_r = sel(f, cand)
            elif f == SUB_OUT_SIMP:
                # FUN3D-style fixed back pressure with reverse-flow guard
                # (ref:src/bdy_inters.cpp:399-464)
                machn_l = jnp.abs(vn_l) / c_l
                # reverse flow branch
                v_rev = vn_l[..., None] * norm
                vsq_rev = vn_l * vn_l
                T_rev = P["T_total"] - 0.5 * vsq_rev * (gamma - 1.0) / (R_ref * gamma)
                p_rev = P["p_static"] * (1.0 + 0.5 * (gamma - 1.0)
                                         * vsq_rev / (gamma * R_ref * T_rev)
                                         ) ** (-gamma / (gamma - 1.0))
                rho_rev = p_rev / (R_ref * T_rev)
                cand_rev = pack(rho_rev, v_rev, energy(rho_rev, v_rev, p_rev),
                                u_l)
                # subsonic outflow branch
                cand_sub = pack(rho_l, v_l, energy(rho_l, v_l, P["p_static"]),
                                u_l)
                cand = jnp.where((vn_l < 0)[..., None], cand_rev,
                                 jnp.where((machn_l >= 1)[..., None], u_l,
                                           cand_sub))
                u_r = sel(f, cand)
            elif f == SUB_IN_CHAR:
                # SU2-style total-state inflow (ref:src/bdy_inters.cpp:471-585)
                p_tot, T_tot = P["p_total"], P["T_total"]
                if has_ramp and ramp is not None:
                    # linear ramp toward the target totals, capped at the
                    # target; T_ramp_coeff < 0 = isentropic relation from
                    # the local state (ref:src/bdy_inters.cpp:482-509)
                    on = P["pressure_ramp"] > 0
                    p_r = jnp.minimum(
                        p_tot, P["p_total_old"]
                        + (p_tot - P["p_total_old"])
                        * P["p_ramp_coeff"] * ramp)
                    p_tot = jnp.where(on & (P["p_ramp_coeff"] > 0), p_r,
                                      p_tot)
                    T_lin = jnp.minimum(
                        T_tot, P["T_total_old"]
                        + (T_tot - P["T_total_old"])
                        * P["T_ramp_coeff"] * ramp)
                    T_l = p_l / (rho_l * R_ref)
                    T_isen = T_l * (p_tot / p_l) ** ((gamma - 1.0) / gamma)
                    T_tot = jnp.where(
                        on & (P["T_ramp_coeff"] > 0), T_lin,
                        jnp.where(on & (P["T_ramp_coeff"] < 0), T_isen,
                                  T_tot))
                R_plus = vn_l + 2.0 * c_l / (gamma - 1.0)
                c_tot_sq = gamma * R_ref * T_tot
                alpha = jnp.sum(norm * P["nfs"], axis=-1)
                aa = 1.0 + 0.5 * (gamma - 1.0) * alpha * alpha
                bb = -(gamma - 1.0) * alpha * R_plus
                cc = (0.5 * (gamma - 1.0) * R_plus * R_plus
                      - 2.0 * c_tot_sq / (gamma - 1.0))
                dd = jnp.sqrt(jnp.maximum(bb * bb - 4.0 * aa * cc, 0.0))
                V_r = jnp.maximum((-bb + dd) / (2.0 * aa), 0.0)
                vsq = V_r * V_r
                c_r_sq = c_tot_sq - 0.5 * (gamma - 1.0) * vsq
                Mach_sq = jnp.minimum(vsq / c_r_sq, 1.0)
                vsq = Mach_sq * c_r_sq
                V_r = jnp.sqrt(vsq)
                c_r_sq = c_tot_sq - 0.5 * (gamma - 1.0) * vsq
                v_r = V_r[..., None] * P["nfs"]
                T_r = c_r_sq / (gamma * R_ref)
                p_r = p_tot * (T_r / T_tot) ** (gamma / (gamma - 1.0))
                rho_r = p_r / (R_ref * T_r)
                cand = pack(rho_r, v_r, energy(rho_r, v_r, p_r), u_l)
                if rcfg.rans:
                    cand = cand.at[..., n_dims + 2].set(mu_tilde_inf)
                u_r = sel(f, cand)
            elif f == SUB_OUT_CHAR:
                # characteristic outflow (ref:src/bdy_inters.cpp:593-641)
                R_plus = vn_l + 2.0 * c_l / (gamma - 1.0)
                s = p_l / rho_l**gamma
                p_r = P["p_static"]
                rho_r = (p_r / s) ** (1.0 / gamma)
                c_r = jnp.sqrt(gamma * p_r / rho_r)
                vn_r = R_plus - 2.0 * c_r / (gamma - 1.0)
                v_r = v_l + (vn_r - vn_l)[..., None] * norm
                u_r = sel(f, pack(rho_r, v_r, energy(rho_r, v_r, p_r), u_l))
            elif f == SUP_IN:
                rho_r = P["rho"]
                v_r = P["vel"]
                p_r = P["p_static"]
                u_r = sel(f, pack(rho_r, v_r, energy(rho_r, v_r, p_r), u_l))
            elif f == SUP_OUT:
                u_r = sel(f, u_l)
            elif f in (SLIP_WALL, SLIP_WALL_DUAL):
                # (ref:src/bdy_inters.cpp:674-702, 976-994)
                fac = 2.0 if (sol_spec == 0 or f == SLIP_WALL_DUAL) else 1.0
                v_r = v_l - fac * vn_l[..., None] * norm
                if f == SLIP_WALL_DUAL:
                    e_r = e_l
                else:
                    e_r = energy(rho_l, v_r, p_l)
                u_r = sel(f, pack(rho_l, v_r, e_r, u_l))
            elif f in (ISOTHERM_WALL, ADIABAT_WALL):
                # (ref:src/bdy_inters.cpp:705-863).  With a wall model the
                # inviscid/LDG states use slip logic (sol_spec 0/1) and the
                # no-slip wall state is sol_spec 2 (ref::713-762, :802-830).
                wm = P["use_wm"] > 0
                if sol_spec == 0:
                    v_plain = 2.0 * P["vel"] - v_l
                    v_wm = v_l - 2.0 * vn_l[..., None] * norm
                elif sol_spec == 1:
                    v_plain = P["vel"] * jnp.ones_like(v_l)
                    v_wm = v_l - vn_l[..., None] * norm
                else:  # sol_spec == 2: no-slip wall state for the wall model
                    v_plain = P["vel"] * jnp.ones_like(v_l)
                    v_wm = v_plain
                v_r = jnp.where(wm[..., None], v_wm, v_plain)
                if f == ISOTHERM_WALL:
                    # wall-temperature energy, except wm slip states
                    # extrapolate temperature (ref::726-731, :744-749)
                    e_iso = rho_l * (R_ref / (gamma - 1.0) * P["T_static"]) \
                        + 0.5 * rho_l * jnp.sum(v_r * v_r, axis=-1)
                    e_ext = energy(rho_l, v_r, p_l)
                    use_ext = wm & (sol_spec in (0, 1))
                    e_r = jnp.where(use_ext, e_ext, e_iso)
                else:
                    e_r = energy(rho_l, v_r, p_l)
                cand = pack(rho_l, v_r, e_r, u_l)
                if rcfg.rans:
                    cand = cand.at[..., n_dims + 2].set(0.0)
                u_r = sel(f, cand)
            elif f == CHAR:
                # far-field Riemann (ref:src/bdy_inters.cpp:867-973)
                vn_r = jnp.sum(P["vel"] * norm, axis=-1)
                c_r = jnp.sqrt(gamma * P["p_static"] / P["rho"])
                mach = jnp.abs(vn_l) / c_l
                inflow = vn_l < 0
                sup = mach >= 1.0
                r_plus = jnp.where(
                    inflow & sup, vn_r + 2.0 / (gamma - 1.0) * c_r,
                    vn_l + 2.0 / (gamma - 1.0) * c_l)
                r_minus = jnp.where(
                    ~inflow & sup, vn_l - 2.0 / (gamma - 1.0) * c_l,
                    vn_r - 2.0 / (gamma - 1.0) * c_r)
                c_star = 0.25 * (gamma - 1.0) * (r_plus - r_minus)
                vn_star = 0.5 * (r_plus + r_minus)
                one_over_s = jnp.where(inflow,
                                       P["rho"]**gamma / P["p_static"],
                                       rho_l**gamma / p_l)
                rho_r = (one_over_s * c_star * c_star / gamma
                         ) ** (1.0 / (gamma - 1.0))
                v_tang = jnp.where(inflow[..., None],
                                   P["vel"] - vn_r[..., None] * norm,
                                   v_l - vn_l[..., None] * norm)
                v_r = vn_star[..., None] * norm + v_tang
                p_r = rho_r / gamma * c_star * c_star
                cand = pack(rho_r, v_r, energy(rho_r, v_r, p_r), u_l)
                if rcfg.rans:
                    cand = cand.at[..., n_dims + 2].set(
                        jnp.where(inflow, mu_tilde_inf,
                                  u_l[..., n_dims + 2]))
                u_r = sel(f, cand)
            elif f == AD_WALL:
                u_r = sel(f, jnp.zeros_like(u_l))
            else:
                raise NotImplementedError(f"BC flag {f}")
        if fluc is not None:
            # inflow momentum bump; the reference leaves energy unchanged
            # (ref:src/bdy_inters.cpp:250-254, :1060-1117)
            is_in = jnp.isin(P["flag"],
                             jnp.asarray((SUB_IN_SIMP, SUB_IN_CHAR, SUP_IN)))
            bump = u_r[..., 0:1] * fluc[..., :n_dims]
            u_r = u_r.at[..., 1:1 + n_dims].add(
                jnp.where(is_in[..., None], bump, 0.0))
        return u_r

    # ------------------------------------------------------------------
    WALL_FLAGS = (SLIP_WALL, ISOTHERM_WALL, ADIABAT_WALL, AD_WALL,
                  SLIP_WALL_DUAL)

    def inv_common_flux(u_l, norm, fluc=None, ramp=None, P=None):
        """(ref:src/bdy_inters.cpp:230-307): Riemann solve against the
        inviscid ghost state; dual-consistent walls use the left flux."""
        P = P if P is not None else P_default
        u_r = ghost_state(u_l, norm, sol_spec=0, fluc=fluc, ramp=ramp, P=P)
        if rcfg.equation == 1:
            ws = jnp.asarray(rcfg.wave_speed[:n_dims], dtype=u_l.dtype)
            fn = riemann.lax_friedrichs_flux(u_l, u_r, norm, ws,
                                             rcfg.lambda_lf)
        else:
            fn = riemann.solve(rcfg.riemann_solve_type, u_l, u_r, norm,
                               gamma=gamma, n_dims=n_dims)
            if SLIP_WALL_DUAL in flags_present:
                f_l = inviscid_flux(u_l, gamma, n_dims)
                fn_l = jnp.einsum("...fd,...d->...f", f_l, norm)
                fn = jnp.where((P["flag"] == SLIP_WALL_DUAL)[..., None],
                               fn_l, fn)
        return fn

    def ldg_solution(u_l, norm, fluc=None, ramp=None, P=None):
        """Boundary LDG common solution u_c = u_r(sol_spec=1 for walls,
        else the inviscid ghost) (ref:src/bdy_inters.cpp:309-324,
        ref:src/inters.cpp:640-643)."""
        P = P if P is not None else P_default
        u_r0 = ghost_state(u_l, norm, sol_spec=0, fluc=fluc, ramp=ramp, P=P)
        if any(f in flags_present for f in WALL_FLAGS):
            u_r1 = ghost_state(u_l, norm, sol_spec=1, fluc=fluc, ramp=ramp,
                               P=P)
            is_wall = jnp.isin(P["flag"], jnp.asarray(WALL_FLAGS))
            return jnp.where(is_wall[..., None], u_r1, u_r0)
        return u_r0

    def boundary_gradients(u_r, grad_l, norm, P=None):
        """(ref:src/bdy_inters.cpp:1138-1188)."""
        P = P if P is not None else P_default
        flag = P["flag"]
        zero_flags = (CHAR, SUP_IN, SUB_IN_SIMP, SUB_OUT_SIMP)
        zero = jnp.isin(flag, jnp.asarray(zero_flags))
        grad_r = jnp.where(zero[..., None, None], 0.0, grad_l)
        if ADIABAT_WALL in flags_present:
            rho = u_r[..., 0]
            mom = u_r[..., 1:1 + n_dims]
            vsq = jnp.sum(mom * mom, axis=-1)
            inte = (u_r[..., n_dims + 1] - 0.5 * vsq / rho) / rho
            grad_rho = grad_r[..., 0, :]
            grad_mom = grad_r[..., 1:1 + n_dims, :]
            grad_vel = (grad_mom - grad_rho[..., None, :]
                        * (mom / rho[..., None])[..., :, None]) / rho[..., None, None]
            gE = grad_r[..., n_dims + 1, :]
            grad_inte = gE - (inte[..., None] * grad_rho
                              + 0.5 * (vsq / rho**2)[..., None] * grad_rho
                              + jnp.einsum("...i,...ij->...j", mom, grad_vel))
            gn = jnp.sum(grad_inte * norm, axis=-1)
            corr = gn[..., None] * norm
            gE_fix = gE - corr
            grad_r = jnp.where((flag == ADIABAT_WALL)[..., None, None],
                               grad_r.at[..., n_dims + 1, :].set(gE_fix),
                               grad_r)
        return grad_r

    # --- wall-model input points (global boundary-face tables).  Mixed /
    # sharded facades have no pos_upts: they build their own tables and
    # pass ``wm_state``/``wm_dist`` to visc_common_flux instead.
    has_wm = (bool(np.any(P_np["use_wm"] > 0)) and run_input.wall_model > 0
              and getattr(block, "pos_upts", None) is not None)
    if has_wm:
        wm_ele, wm_upt, wm_dist = build_wm_tables(block,
                                                  P_np["use_wm"][:, 0])
        wm_ele_j = jnp.asarray(wm_ele, dtype=jnp.int32)
        wm_upt_j = jnp.asarray(wm_upt, dtype=jnp.int32)
        wm_dist_j = jnp.asarray(wm_dist, dtype=dtype)

    def visc_common_flux(u_l, grad_l, norm, u_full=None, fluc=None,
                         ramp=None, P=None, wm_state=None, wm_dist=None):
        P = P if P is not None else P_default
        """Boundary viscous common flux: f_r . n - tau (u_r - u_l)
        (ref:src/bdy_inters.cpp:1029-1093, ldg_flux flux_spec=1).
        Slip walls contribute no viscous flux; wall-modeled faces replace it
        with the modeled wall stress (ref::1095-1131).  Sharded runs pass
        ``wm_state`` (Fb, F) input states and ``wm_dist`` (Fb,) gathered
        from their shard-local tables instead of ``u_full``."""
        u_r = ldg_solution(u_l, norm, fluc=fluc, ramp=ramp, P=P)
        grad_r = boundary_gradients(u_r, grad_l, norm, P=P)
        if rcfg.equation == 1:
            f_r = adv_diff_viscous_flux(grad_r, rcfg.diff_coeff)
        else:
            f_r = viscous_flux(
                u_r, grad_r, gamma=gamma, prandtl=rcfg.prandtl,
                mu_inf=rcfg.mu_inf, rt_inf=rcfg.rt_inf, c_sth=rcfg.c_sth,
                fix_vis=rcfg.fix_vis, n_dims=n_dims, rans=rcfg.rans,
                prandtl_t=rcfg.prandtl_t)
        fn = jnp.einsum("...fd,...d->...f", f_r, norm) \
            - rcfg.ldg_tau * (u_r - u_l)
        no_visc = P["flag"] == SLIP_WALL
        fn = jnp.where(no_visc[..., None], 0.0, fn)
        if run_input.wall_model > 0 and (
                wm_state is not None
                or (has_wm and u_full is not None)):
            from ..models.wall_model import wall_stress_flux
            if wm_state is not None:
                u_wm, dist = wm_state, wm_dist
            else:
                u_wm, dist = u_full[wm_ele_j, wm_upt_j], wm_dist_j
            u_w = ghost_state(u_l, norm, sol_spec=2, P=P)  # no-slip state
            fn_wm = wall_stress_flux(
                jnp.broadcast_to(u_wm[:, None, :], u_l.shape), u_w,
                dist[:, None], norm, wall_model=run_input.wall_model,
                gamma=gamma, prandtl=rcfg.prandtl, prandtl_t=rcfg.prandtl_t,
                mu_inf=rcfg.mu_inf, rt_inf=rcfg.rt_inf, c_sth=rcfg.c_sth,
                fix_vis=rcfg.fix_vis, kappa=rcfg.kappa, n_dims=n_dims)
            fn = jnp.where((P["use_wm"] > 0)[..., None], fn_wm, fn)
        return fn

    return BCFunctions(inv_common_flux=inv_common_flux,
                       ldg_solution=ldg_solution,
                       visc_common_flux=visc_common_flux,
                       ghost_state=ghost_state,
                       wm_tables=((wm_ele, wm_upt, wm_dist) if has_wm
                                  else None))


def solver_pos_upts(block, e):
    return block.pos_upts[e]


def build_wm_tables(block, use_wm_face: np.ndarray):
    """Wall-model input points: per wall-modeled boundary face, the
    solution point of the adjacent element with the largest min-distance
    to the face (ref:src/eles.cpp:4873-4903 calc_wm_upts_dist).

    ``use_wm_face``: (Fb,) per-face use_wm.  Returns (wm_ele, wm_upt,
    wm_dist) over the block's boundary faces; the input element is always
    the face's own element, so these tables stay shard-local under domain
    decomposition."""
    Pf = block.ops.n_fpts
    Fb = block.bdy_bcid.size
    wm_ele = np.zeros(Fb, dtype=np.int64)
    wm_upt = np.zeros(Fb, dtype=np.int64)
    wm_dist = np.ones(Fb)
    for fi in range(Fb):
        if use_wm_face[fi] <= 0:
            continue
        slots = block.bdy_slot[fi][block.bdy_mask[fi] > 0]
        e = int(slots[0] // Pf)
        fpt_pos = block.pos_fpts[slots]           # (nfp, d)
        fpt_nrm = block.norm_fpts[slots]
        # distance of each upt: min over face fpts of (x_f - x_u).n
        dvec = fpt_pos[None, :, :] - solver_pos_upts(block, e)[:, None, :]
        dist = np.einsum("ufd,fd->uf", dvec, fpt_nrm).min(axis=1)
        wm_upt[fi] = int(np.argmax(dist))
        wm_dist[fi] = float(dist.max())
        wm_ele[fi] = e
    return wm_ele, wm_upt, wm_dist
