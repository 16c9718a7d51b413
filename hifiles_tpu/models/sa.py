"""Spalart-Allmaras source term, vectorized (ref:src/source.cpp:33-105).

2-D in the reference (3-D is an unimplemented stub there,
ref:src/source.cpp:107-112); here the vorticity magnitude generalizes to
3-D so both work.  Negative-nu_tilde regularization via psi
(Allmaras et al. 2012 style, matching the reference's formulation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .viscous import sutherland_mu


def sa_source(u, grad_u, wall_dist, *, gamma, mu_inf, rt_inf, c_sth, fix_vis,
              kappa, c_v1, c_v2, c_v3, c_b1, c_b2, c_w2, c_w3, omega,
              n_dims):
    """Source of the rho*nu_tilde equation (...,)."""
    rho = u[..., 0]
    vel = u[..., 1:1 + n_dims] / rho[..., None]
    E = u[..., n_dims + 1]
    nu_tilde_c = u[..., n_dims + 2]          # rho * nu_tilde
    nu_tilde = nu_tilde_c / rho
    inte = E / rho - 0.5 * jnp.sum(vel * vel, axis=-1)
    mu = sutherland_mu(inte, gamma, mu_inf, rt_inf, c_sth, fix_vis)

    rho_d = grad_u[..., 0, :]
    mom_d = grad_u[..., 1:1 + n_dims, :]
    dvel = (mom_d - vel[..., :, None] * rho_d[..., None, :]) / rho[..., None, None]
    dnu = (grad_u[..., n_dims + 2, :] - rho_d * nu_tilde[..., None]) / rho[..., None]

    # vorticity magnitude (2-D: |dv/dx - du/dy|, ref:src/source.cpp:75)
    if n_dims == 2:
        S = jnp.abs(dvel[..., 1, 0] - dvel[..., 0, 1])
    else:
        wx = dvel[..., 2, 1] - dvel[..., 1, 2]
        wy = dvel[..., 0, 2] - dvel[..., 2, 0]
        wz = dvel[..., 1, 0] - dvel[..., 0, 1]
        S = jnp.sqrt(wx * wx + wy * wy + wz * wz)

    chi = nu_tilde_c / mu
    psi = jnp.where(chi <= 10.0, 0.05 * jax.nn.softplus(20.0 * chi), chi)
    f_v1 = chi**3 / (chi**3 + c_v1**3)
    f_v2 = 1.0 - psi / (1.0 + psi * f_v1)
    kd2 = kappa**2 * wall_dist**2
    S_bar = (mu * psi / rho) ** 2 * f_v2 / kd2
    S_tilde = jnp.where(
        S_bar >= -c_v2 * S, S + S_bar,
        S + S * (c_v2**2 * S + c_v3 * S_bar)
        / ((c_v3 - 2.0 * c_v2) * S - S_bar))

    prod = c_b1 * S_tilde * mu * psi
    diff = (1.0 / omega) * c_b2 * rho * jnp.sum(dnu * dnu, axis=-1)
    c_w1 = c_b1 / kappa**2 + (1.0 / omega) * (1.0 + c_b2)
    r = jnp.minimum((mu * psi / rho) / (S_tilde * kd2), 10.0)
    g = r + c_w2 * (r**6 - r)
    f_w = g * ((1.0 + c_w3**6) / (g**6 + c_w3**6)) ** (1.0 / 6.0)
    dest = -c_w1 * rho * f_w * ((mu * psi / rho) / wall_dist) ** 2
    return prod + diff + dest
