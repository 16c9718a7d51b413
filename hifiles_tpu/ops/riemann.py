"""Riemann solvers, vectorized over face points (ref:src/inters.cpp:264-646).

All functions take left/right conservative states (..., F), the unit face
normal (..., d) pointing from left to right, and return the common normal
flux (..., F).  ``riemann_solve_type`` codes: 0=Rusanov, 1=Lax-Friedrichs,
2=RoeM, 3=HLLC (ref:src/input.cpp:138, dispatch ref:src/int_inters.cpp:187-214).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.euler import inviscid_flux

RUSANOV = 0
LAX_FRIEDRICHS = 1
ROEM = 2
HLLC = 3


def _normal_flux(u, norm, gamma, n_dims):
    f = inviscid_flux(u, gamma, n_dims)          # (..., F, d)
    return jnp.einsum("...fd,...d->...f", f, norm)


def _prims(u, norm, n_dims, gamma):
    rho = u[..., 0]
    vel = u[..., 1:1 + n_dims] / rho[..., None]
    vn = jnp.sum(vel * norm, axis=-1)
    vsq = jnp.sum(vel * vel, axis=-1)
    p = (gamma - 1.0) * (u[..., n_dims + 1] - 0.5 * rho * vsq)
    return rho, vel, vn, vsq, p


def rusanov_flux(u_l, u_r, norm, gamma, n_dims):
    """ref:src/inters.cpp:277-324."""
    fn_l = _normal_flux(u_l, norm, gamma, n_dims)
    fn_r = _normal_flux(u_r, norm, gamma, n_dims)
    rho_l, _, vn_l, _, p_l = _prims(u_l, norm, n_dims, gamma)
    rho_r, _, vn_r, _, p_r = _prims(u_r, norm, n_dims, gamma)
    eig = (jnp.sqrt(gamma * (p_l + p_r) / (rho_l + rho_r))
           + 0.5 * jnp.abs(vn_l + vn_r))
    return 0.5 * ((fn_l + fn_r) - eig[..., None] * (u_r - u_l))


def hllc_flux(u_l, u_r, norm, gamma, n_dims):
    """HLLC with Roe-average wavespeeds (ref:src/inters.cpp:439-532)."""
    fn_l = _normal_flux(u_l, norm, gamma, n_dims)
    fn_r = _normal_flux(u_r, norm, gamma, n_dims)
    rho_l, _, vn_l, _, p_l = _prims(u_l, norm, n_dims, gamma)
    rho_r, _, vn_r, _, p_r = _prims(u_r, norm, n_dims, gamma)
    E_l = u_l[..., n_dims + 1]
    E_r = u_r[..., n_dims + 1]
    h_l = (E_l + p_l) / rho_l
    h_r = (E_r + p_r) / rho_r

    sq_rho = jnp.sqrt(rho_r / rho_l)
    rrho = 1.0 / (sq_rho + 1.0)
    vn_m = rrho * (vn_l + sq_rho * vn_r)
    h_m = rrho * (h_l + sq_rho * h_r)
    a_m = jnp.sqrt((gamma - 1.0) * (h_m - 0.5 * vn_m * vn_m))

    S_R = vn_m + a_m
    S_L = vn_m - a_m
    S_star = ((p_r - p_l + rho_l * vn_l * (S_L - vn_l)
               - rho_r * vn_r * (S_R - vn_r))
              / (rho_l * (S_L - vn_l) - rho_r * (S_R - vn_r)))

    def star_flux(S, u, fn, rho, vn, p):
        """Star-region flux on one side (ref:src/inters.cpp:508-525)."""
        rcp = S - S_star
        pre = p + rho * (S - vn) * (S_star - vn)
        f0 = S_star * (S * u[..., 0] - fn[..., 0]) / rcp
        fm = (S_star[..., None] * (S[..., None] * u[..., 1:1 + n_dims]
                                   - fn[..., 1:1 + n_dims])
              + (S * pre)[..., None] * norm) / rcp[..., None]
        fE = (S_star * (S * u[..., n_dims + 1] - fn[..., n_dims + 1])
              + S * pre * S_star) / rcp
        return jnp.concatenate([f0[..., None], fm, fE[..., None]], axis=-1)

    f_star_l = star_flux(S_L, u_l, fn_l, rho_l, vn_l, p_l)
    f_star_r = star_flux(S_R, u_r, fn_r, rho_r, vn_r, p_r)

    fn = jnp.where((S_L >= 0)[..., None], fn_l,
                   jnp.where((S_star >= 0)[..., None], f_star_l,
                             jnp.where((S_R >= 0)[..., None], f_star_r, fn_r)))
    return fn


def roem_flux(u_l, u_r, norm, gamma, n_dims):
    """RoeM scheme, JCP 185(2):342-374 (ref:src/inters.cpp:327-437)."""
    n_fields = u_l.shape[-1]
    fn_l = _normal_flux(u_l, norm, gamma, n_dims)
    fn_r = _normal_flux(u_r, norm, gamma, n_dims)
    rho_l, v_l, vn_l, _, p_l = _prims(u_l, norm, n_dims, gamma)
    rho_r, v_r, vn_r, _, p_r = _prims(u_r, norm, n_dims, gamma)
    E_l = u_l[..., n_dims + 1]
    E_r = u_r[..., n_dims + 1]
    h_l = (E_l + p_l) / rho_l
    h_r = (E_r + p_r) / rho_r

    drho = rho_r - rho_l
    dp = p_r - p_l
    dh = h_r - h_l
    dvn = vn_r - vn_l
    dv = v_r - v_l

    sq_rho = jnp.sqrt(rho_r / rho_l)
    rrho = 1.0 / (1.0 + sq_rho)
    ratr = sq_rho * rrho
    ra = sq_rho * rho_l
    ha = h_l * rrho + h_r * ratr
    va = v_l * rrho[..., None] + v_r * ratr[..., None]
    qq = jnp.sum(va * va, axis=-1)
    va_n = jnp.sum(va * norm, axis=-1)
    aa = jnp.sqrt((gamma - 1.0) * (ha - 0.5 * qq))
    rcp_aa = 1.0 / aa

    abs_ma = jnp.abs(va_n * rcp_aa)
    b1 = jnp.maximum(0.0, jnp.maximum(va_n + aa, vn_r + aa))
    b2 = jnp.minimum(0.0, jnp.minimum(va_n - aa, vn_l - aa))
    b1b2 = b1 * b2
    rcp_b1_b2 = 1.0 / (b1 - b2)
    b1 = b1 * rcp_b1_b2
    b2 = b2 * rcp_b1_b2
    b1b2 = b1b2 * rcp_b1_b2

    h = 1.0 - jnp.minimum(p_l / p_r, p_r / p_l)
    f = jnp.where(abs_ma != 0.0, abs_ma**h, 1.0)
    g = f / (1.0 + abs_ma)

    du = u_r - u_l
    du = du.at[..., n_dims + 1].set(rho_r * h_r - rho_l * h_l)

    bdq0 = drho - f * dp * rcp_aa * rcp_aa
    bdq_m = (bdq0[..., None] * va
             + ra[..., None] * (dv - norm * dvn[..., None]))
    bdqE = bdq0 * ha + ra * dh
    parts = [bdq0[..., None], bdq_m, bdqE[..., None]]
    if n_fields > n_dims + 2:
        parts.append(jnp.zeros_like(u_l[..., n_dims + 2:]))
    bdq = jnp.concatenate(parts, axis=-1)

    return (b1[..., None] * fn_l - b2[..., None] * fn_r
            + b1b2[..., None] * (du - g[..., None] * bdq))


def lax_friedrichs_flux(u_l, u_r, norm, wave_speed, lam):
    """Scalar advection LF flux (ref:src/inters.cpp:535-557)."""
    u_av = 0.5 * (u_l[..., 0] + u_r[..., 0])
    u_diff = u_l[..., 0] - u_r[..., 0]
    norm_speed = jnp.sum(wave_speed * norm, axis=-1)
    fn0 = norm_speed * u_av + 0.5 * lam * jnp.abs(norm_speed) * u_diff
    return fn0[..., None]


def ldg_beta_switch(norm, beta, tol=1e-10):
    """Sign-consistent beta (ref:src/inters.cpp:566-582): flip beta when the
    normal points 'backwards' against the fixed test vectors e_x, e_x+e_y,
    e_x+e_z.  Vectorized with nested where.

    The reference compares against exact zeros; that breaks two-sided
    consistency when a nominally-zero normal component carries O(1e-17) mesh
    roundoff with the *same* sign on both sides of a face (each side
    evaluates the switch with its own normal in halo/MPI mode — the silent
    asymmetry SURVEY.md §7(d) warns about).  Components within ``tol`` of
    zero are treated as exactly zero; genuine components are O(1), so the
    threshold is unambiguous."""
    n0 = norm[..., 0]
    n01 = n0 + norm[..., 1]
    if norm.shape[-1] == 3:
        n02 = n0 + norm[..., 2]
    else:
        n02 = jnp.ones_like(n0)
    sign = jnp.where(
        n0 < -tol, -1.0,
        jnp.where(n0 > tol, 1.0,
                  jnp.where(n01 < -tol, -1.0,
                            jnp.where(n01 > tol, 1.0,
                                      jnp.where(n02 < -tol, -1.0, 1.0)))))
    return beta * sign


def ldg_common_solution(u_l, u_r, norm, beta):
    """LDG common interface solution (ref:src/inters.cpp:615-646)."""
    b = ldg_beta_switch(norm, beta)[..., None]
    return 0.5 * (u_l + u_r) - b * (u_l - u_r)


def ldg_common_flux(u_l, u_r, f_l, f_r, norm, tau, beta):
    """LDG common normal viscous flux (ref:src/inters.cpp:561-611).

    f_l/f_r are physical viscous fluxes (..., F, d)."""
    b = ldg_beta_switch(norm, beta)[..., None, None]
    f_c = (0.5 + b) * f_l + (0.5 - b) * f_r
    fn = jnp.einsum("...fd,...d->...f", f_c, norm)
    return fn - tau * (u_r - u_l)


def solve(riemann_type: int, u_l, u_r, norm, *, gamma, n_dims,
          wave_speed=None, lam=1.0):
    if riemann_type == RUSANOV:
        return rusanov_flux(u_l, u_r, norm, gamma, n_dims)
    if riemann_type == HLLC:
        return hllc_flux(u_l, u_r, norm, gamma, n_dims)
    if riemann_type == ROEM:
        return roem_flux(u_l, u_r, norm, gamma, n_dims)
    if riemann_type == LAX_FRIEDRICHS:
        return lax_friedrichs_flux(u_l, u_r, norm, wave_speed, lam)
    raise ValueError(f"unknown riemann_solve_type {riemann_type}")
