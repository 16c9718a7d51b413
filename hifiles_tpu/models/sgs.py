"""LES subgrid-scale models, vectorized (ref:src/eles.cpp:2395-2646
calc_sgsf_upts).

SGS_model codes (ref deck comments): 0 Smagorinsky (with van-Driest-style
wall limiting via wall distance), 1 WALE, 2 WALE-similarity, 3 SVV,
4 similarity.  Eddy-viscosity parts are evaluated pointwise from (u, grad);
similarity parts use the filtered Leonard tensors (models/les_filter.py).
SVV acts by filtering the solution itself each residual evaluation
(ref:src/eles.cpp:2087-2089).
"""

from __future__ import annotations

import jax.numpy as jnp

from .viscous import sutherland_mu


def eddy_viscosity(u, grad_u, delta, wall_dist, *, sgs_model, C_s, gamma,
                   kappa=0.41, n_dims=3):
    """mu_t (...,) from Smagorinsky (0) or WALE (1/2)
    (ref:src/eles.cpp:2470-2592)."""
    rho = u[..., 0]
    vel = u[..., 1:1 + n_dims] / rho[..., None]
    rho_d = grad_u[..., 0, :]
    mom_d = grad_u[..., 1:1 + n_dims, :]
    # du[i,j] = du_j/dx_i in the reference's storage; we use du[j,i]=du_j/dx_i
    # consistently as dvel[..., j, i_grad]
    dvel = (mom_d - vel[..., :, None] * rho_d[..., None, :]) / rho[..., None, None]
    S = 0.5 * (dvel + jnp.swapaxes(dvel, -1, -2))

    if sgs_model == 0:
        Smod = jnp.sqrt(2.0 * jnp.sum(S * S, axis=(-2, -1)))
        lim = jnp.minimum(wall_dist**2 * kappa**2, C_s**2 * delta**2)
        return rho * lim * Smod
    if sgs_model in (1, 2):
        # WALE (Nicoud & Ducros 1999), ref:src/eles.cpp:2548-2592
        eps = 1e-12
        g2 = jnp.einsum("...ik,...kj->...ij", dvel, dvel)
        Sq = 0.5 * (g2 + jnp.swapaxes(g2, -1, -2))
        diag = jnp.trace(g2, axis1=-2, axis2=-1) / 3.0
        Sq = Sq - diag[..., None, None] * jnp.eye(n_dims, dtype=u.dtype)
        num = jnp.sum(Sq * Sq, axis=(-2, -1))
        den = jnp.sum(S * S, axis=(-2, -1))
        den = den**2.5 + num**1.25
        return rho * C_s**2 * delta**2 * num**1.5 / (den + eps)
    raise ValueError(f"eddy viscosity undefined for SGS model {sgs_model}")


def sgs_flux(u, grad_u, delta, wall_dist, *, sgs_model, C_s, gamma, prandtl_t,
             n_dims, kappa=0.41):
    """Eddy-viscosity SGS flux (..., F, d), same sign convention as the
    viscous flux (added to it) (ref:src/eles.cpp:2594-2612)."""
    dtype = u.dtype
    rho = u[..., 0]
    vel = u[..., 1:1 + n_dims] / rho[..., None]
    E = u[..., n_dims + 1]
    inte = E / rho - 0.5 * jnp.sum(vel * vel, axis=-1)
    rho_d = grad_u[..., 0, :]
    mom_d = grad_u[..., 1:1 + n_dims, :]
    ene_d = grad_u[..., n_dims + 1, :]
    dvel = (mom_d - vel[..., :, None] * rho_d[..., None, :]) / rho[..., None, None]
    ke = 0.5 * jnp.sum(vel * vel, axis=-1)
    dke = (ke[..., None] * rho_d
           + rho[..., None] * jnp.einsum("...i,...ij->...j", vel, dvel))
    de = (ene_d - dke - rho_d * inte[..., None]) / rho[..., None]

    mu_t = eddy_viscosity(u, grad_u, delta, wall_dist, sgs_model=sgs_model,
                          C_s=C_s, gamma=gamma, kappa=kappa, n_dims=n_dims)

    S = 0.5 * (dvel + jnp.swapaxes(dvel, -1, -2))
    diag = jnp.trace(S, axis1=-2, axis2=-1) / 3.0
    S = S - diag[..., None, None] * jnp.eye(n_dims, dtype=dtype)

    mom_rows = -2.0 * mu_t[..., None, None] * S
    ener_row = -(gamma * mu_t / prandtl_t)[..., None] * de \
        + jnp.einsum("...k,...kj->...j", vel, mom_rows)
    zero_row = jnp.zeros_like(rho_d)
    rows = [zero_row[..., None, :], mom_rows, ener_row[..., None, :]]
    if u.shape[-1] > n_dims + 2:
        rows.append(jnp.zeros_like(u[..., n_dims + 2:, None])
                    * jnp.zeros_like(rho_d[..., None, :]))
    return jnp.concatenate(rows, axis=-2)


def similarity_terms(u, filter_mat, n_dims):
    """Leonard tensors Lu (..., U, dim3) and Le (..., U, d) from the
    modally-filtered solution (ref:src/eles.cpp:2091-2218).

    ``filter_mat`` (U, U) acts on the solution-point axis; u is (E, U, F).
    Lu is the traceless filtered-product tensor in symmetric storage
    [xx, yy, (zz,) xy, (xz, yz)]; Le the energy analog."""
    rho = u[..., 0]
    mom = u[..., 1:1 + n_dims]
    E = u[..., n_dims + 1]
    inte_r = E - 0.5 * jnp.sum(mom * mom, axis=-1) / rho   # rho * e
    rsq = rho * rho

    if n_dims == 2:
        pairs = [(0, 0), (1, 1), (0, 1)]
    else:
        pairs = [(0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2)]
    uu = jnp.stack([mom[..., a] * mom[..., b] / rsq for a, b in pairs],
                   axis=-1)
    ue = jnp.stack([mom[..., a] * inte_r / rsq for a in range(n_dims)],
                   axis=-1)

    filt = lambda x: jnp.einsum("ku,euf->ekf", filter_mat, x)
    uf = filt(u)
    Lu = filt(uu)
    Le = filt(ue)

    rho_f = uf[..., 0]
    mom_f = uf[..., 1:1 + n_dims]
    E_f = uf[..., n_dims + 1]
    inte_rf = E_f - 0.5 * jnp.sum(mom_f * mom_f, axis=-1) / rho_f
    rsq_f = rho_f * rho_f
    Lu = Lu - jnp.stack([mom_f[..., a] * mom_f[..., b] / rsq_f
                         for a, b in pairs], axis=-1)
    diag = jnp.sum(Lu[..., :n_dims], axis=-1) / 3.0
    Lu = Lu.at[..., :n_dims].add(-diag[..., None])
    Le = (Le - jnp.stack([mom_f[..., a] * inte_rf for a in range(n_dims)],
                         axis=-1)) / rsq_f[..., None]
    return Lu, Le


def similarity_flux(u, Lu, Le, gamma, n_dims):
    """Similarity SGS flux contribution (..., F, d)
    (ref:src/eles.cpp:2615-2644)."""
    rho = u[..., 0]
    if n_dims == 2:
        idx = [[0, 2], [2, 1]]
    else:
        idx = [[0, 3, 4], [3, 1, 5], [4, 5, 2]]
    mom_rows = jnp.stack(
        [jnp.stack([rho * Lu[..., idx[i][j]] for j in range(n_dims)],
                   axis=-1) for i in range(n_dims)], axis=-2)
    ener_row = gamma * rho[..., None] * Le
    zero_row = jnp.zeros_like(ener_row)
    rows = [zero_row[..., None, :], mom_rows, ener_row[..., None, :]]
    if u.shape[-1] > n_dims + 2:
        rows.append(jnp.zeros_like(u[..., n_dims + 2:, None] * ener_row[..., None, :1]))
    return jnp.concatenate(rows, axis=-2)
