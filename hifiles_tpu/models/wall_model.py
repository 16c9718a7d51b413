"""Wall models (ref:src/wall_model_funcs.cpp:13-119 calc_wall_stress).

wall_model 1 = Werner-Wengle power law; 2 = compressible log law with
Van Driest transformation (adiabatic, NASA-TM-112910), whose Newton
iteration becomes a fixed-iteration vectorized solve (the reference iterates
to 1e-6; 25 Newton steps exceed that for all realistic states).

Returns the wall-normal flux [0, tau_w, -q_w + v_w . tau_w] to be applied as
the boundary common viscous flux (ref:src/bdy_inters.cpp:1095-1131).
"""

from __future__ import annotations

import jax.numpy as jnp

from .viscous import sutherland_mu


def wall_stress_flux(u_wm, u_w, dist, norm, *, wall_model, gamma, prandtl,
                     prandtl_t, mu_inf, rt_inf, c_sth, fix_vis, kappa,
                     n_dims):
    """(..., F) wall flux from input state u_wm at distance ``dist`` and
    wall state u_w (the no-slip BC state)."""
    rho_wm = u_wm[..., 0]
    rho_w = u_w[..., 0]
    v_wm_full = u_wm[..., 1:1 + n_dims] / rho_wm[..., None]
    vw = u_w[..., 1:1 + n_dims] / rho_w[..., None]
    v_n = jnp.sum(v_wm_full * norm, axis=-1)
    v_wm = v_wm_full - norm * v_n[..., None]          # wall-parallel
    v_rel = v_wm - vw
    v_rel_mag = jnp.maximum(jnp.linalg.norm(v_rel, axis=-1), 1e-30)

    ke_wm = 0.5 * jnp.sum(v_wm_full**2, axis=-1)
    ke_w = 0.5 * jnp.sum(vw**2, axis=-1)
    inte_wm = u_wm[..., n_dims + 1] / rho_wm - ke_wm
    inte_w = u_w[..., n_dims + 1] / rho_w - ke_w

    if wall_model == 1:     # Werner-Wengle (ref:wall_model_funcs.cpp:52-79)
        mu_wm = sutherland_mu(inte_wm, gamma, mu_inf, rt_inf, c_sth, fix_vis)
        Rey_c = 11.81**2
        Rey = rho_wm * v_rel_mag * dist / mu_wm
        uplus = jnp.where(Rey < Rey_c, jnp.sqrt(Rey),
                          8.3**0.875 * Rey**0.125)
        utau = v_rel_mag / jnp.maximum(uplus, 1e-30)
        tw_mag = rho_wm * utau * utau
        qw = jnp.where(
            Rey < Rey_c,
            (inte_w - inte_wm) * gamma * tw_mag / (prandtl * v_rel_mag),
            (inte_w - inte_wm) * gamma * tw_mag
            / (prandtl_t * (v_rel_mag
                            + utau * 11.81 * (prandtl / prandtl_t - 1.0))))
    elif wall_model == 2:   # log law + Van Driest (ref::80-103)
        B = jnp.sqrt(2.0 * gamma * inte_w / prandtl_t)
        C = 5.2
        ueq = B * jnp.arcsin(jnp.clip(v_rel_mag / B, -1.0, 1.0))
        mu_w = sutherland_mu(inte_w, gamma, mu_inf, rt_inf, c_sth, fix_vis)
        utau = jnp.ones_like(v_rel_mag)
        for _ in range(25):
            logterm = jnp.log(rho_w * dist * utau / mu_w)
            dutau = -(utau * (logterm / kappa + C) - ueq) \
                / ((logterm + 1.0) / kappa + C)
            utau = utau + dutau
        tw_mag = rho_w * utau * utau
        qw = jnp.zeros_like(tw_mag)
    else:
        raise ValueError(f"wall model {wall_model} not implemented")

    tw = tw_mag[..., None] * v_rel / v_rel_mag[..., None]
    vw_tw = jnp.sum(vw * tw, axis=-1)
    zero = jnp.zeros_like(tw_mag)
    parts = [zero[..., None], tw, (-qw + vw_tw)[..., None]]
    if u_wm.shape[-1] > n_dims + 2:
        parts.append(jnp.zeros_like(u_wm[..., n_dims + 2:]))
    return jnp.concatenate(parts, axis=-1)
