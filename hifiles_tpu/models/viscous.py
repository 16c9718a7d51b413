"""Navier-Stokes viscous flux, vectorized (ref:src/flux.cpp:129-422).

Takes conservative state u (..., F) and its *physical* gradient
grad_u (..., F, d); returns the viscous flux contribution (..., F, d) with
the reference's sign convention (viscous flux is *added* to the inviscid
flux, so entries carry the minus sign already).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sutherland_mu(inte, gamma, mu_inf, rt_inf, c_sth, fix_vis):
    """Dynamic viscosity (ref:src/flux.cpp:172-174); fix_vis=1 freezes mu."""
    rt_ratio = (gamma - 1.0) * inte / rt_inf
    mu = mu_inf * rt_ratio**1.5 * (1.0 + c_sth) / (rt_ratio + c_sth)
    return mu + fix_vis * (mu_inf - mu)


def viscous_flux(u, grad_u, *, gamma, prandtl, mu_inf, rt_inf, c_sth,
                 fix_vis, n_dims, rans=False, prandtl_t=0.9, c_v1=7.1,
                 omega=2.0 / 3.0):
    """(..., F, d) viscous flux (ref:src/flux.cpp:129-252 2-D, :257-422 3-D)."""
    dtype = u.dtype
    rho = u[..., 0]
    mom = u[..., 1:1 + n_dims]
    E = u[..., n_dims + 1]
    vel = mom / rho[..., None]                       # (..., d)
    inte = E / rho - 0.5 * jnp.sum(vel * vel, axis=-1)

    rho_d = grad_u[..., 0, :]                        # (..., d)
    mom_d = grad_u[..., 1:1 + n_dims, :]             # (..., d_field, d_grad)
    ene_d = grad_u[..., n_dims + 1, :]

    mu = sutherland_mu(inte, gamma, mu_inf, rt_inf, c_sth, fix_vis)

    if rans:
        nu_tilde_c = u[..., n_dims + 2]
        chi = nu_tilde_c / mu
        f_v1 = chi**3 / (chi**3 + c_v1**3)
        mu_t = jnp.where(nu_tilde_c >= 0.0, nu_tilde_c * f_v1, 0.0)
    else:
        mu_t = jnp.zeros_like(mu)

    # velocity gradients du_i/dx_j = (d(rho u_i) - u_i d rho)/rho
    dvel = (mom_d - vel[..., :, None] * rho_d[..., None, :]) / rho[..., None, None]
    # internal energy gradient (ref:src/flux.cpp:201-205)
    ke = 0.5 * jnp.sum(vel * vel, axis=-1)
    dke = (ke[..., None] * rho_d
           + rho[..., None] * jnp.einsum("...i,...ij->...j", vel, dvel))
    de = (ene_d - dke - rho_d * inte[..., None]) / rho[..., None]

    mu_tot = mu + mu_t
    diag = jnp.trace(dvel, axis1=-2, axis2=-1) / 3.0
    tau = mu_tot[..., None, None] * (
        dvel + jnp.swapaxes(dvel, -1, -2)
        - 2.0 * diag[..., None, None] * jnp.eye(n_dims, dtype=dtype))

    heat_coef = (mu / prandtl + mu_t / prandtl_t) * gamma
    # energy row: -(u_i tau_ij + k dT/dx_j)
    work = jnp.einsum("...i,...ij->...j", vel, tau)
    ener_row = -(work + heat_coef[..., None] * de)

    zero_row = jnp.zeros_like(rho_d)
    rows = [zero_row[..., None, :], -tau, ener_row[..., None, :]]

    if rans:
        # SA diffusion (ref:src/flux.cpp:225-241)
        nu_tilde = nu_tilde_c / rho
        psi = jnp.where(chi <= 10.0, 0.05 * jax.nn.softplus(20.0 * chi), chi)
        dnu = (grad_u[..., n_dims + 2, :] - rho_d * nu_tilde[..., None]) / rho[..., None]
        sa_row = -(1.0 / omega) * (mu * (1.0 + psi))[..., None] * dnu
        rows.append(sa_row[..., None, :])

    return jnp.concatenate(rows, axis=-2)


def adv_diff_viscous_flux(grad_u, diff_coeff):
    """Advection-diffusion 'viscous' flux (ref:src/flux.cpp:243-247)."""
    return -diff_coeff * grad_u
