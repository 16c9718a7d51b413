"""Compressible Euler fluxes, vectorized (ref:src/flux.cpp:33-125).

State layout (..., n_fields) = [rho, rho*u, rho*v, (rho*w,) E, (rho*nu_t)];
fluxes return (..., n_fields, n_dims).  Supports the SA transport field when
n_fields == n_dims + 3 (ref:src/flux.cpp:55-59,107-112).
"""

from __future__ import annotations

import jax.numpy as jnp


def pressure(u: jnp.ndarray, gamma: float, n_dims: int) -> jnp.ndarray:
    rho = u[..., 0]
    mom = u[..., 1:1 + n_dims]
    E = u[..., n_dims + 1]
    ke = 0.5 * jnp.sum(mom * mom, axis=-1) / rho
    return (gamma - 1.0) * (E - ke)


def cons_to_prim(u: jnp.ndarray, gamma: float, n_dims: int):
    """-> (rho, vel (...,d), p)."""
    rho = u[..., 0]
    vel = u[..., 1:1 + n_dims] / rho[..., None]
    p = pressure(u, gamma, n_dims)
    return rho, vel, p


def prim_to_cons(rho, vel, p, gamma: float):
    n_dims = vel.shape[-1]
    E = p / (gamma - 1.0) + 0.5 * rho * jnp.sum(vel * vel, axis=-1)
    return jnp.concatenate(
        [rho[..., None], rho[..., None] * vel, E[..., None]], axis=-1)


def inviscid_flux(u: jnp.ndarray, gamma: float, n_dims: int) -> jnp.ndarray:
    """F (..., n_fields, n_dims) (ref:src/flux.cpp:33-125)."""
    rho, vel, p = cons_to_prim(u, gamma, n_dims)
    E = u[..., n_dims + 1]
    n_fields = u.shape[-1]
    # mass flux: rho * v
    mass = u[..., 1:1 + n_dims]                                    # (..., d)
    # momentum flux: rho v_i v_j + p delta_ij
    mom = (u[..., 1:1 + n_dims, None] * vel[..., None, :]
           + p[..., None, None] * jnp.eye(n_dims, dtype=u.dtype))  # (...,d,d)
    ener = vel * (E + p)[..., None]                                # (..., d)
    rows = [mass[..., None, :], mom, ener[..., None, :]]
    if n_fields == n_dims + 3:  # SA working variable advection
        rows.append((u[..., n_dims + 2, None] * vel)[..., None, :])
    return jnp.concatenate(rows, axis=-2)


def max_wavespeed(u: jnp.ndarray, gamma: float, n_dims: int) -> jnp.ndarray:
    """|v| + c, the CFL wavespeed (ref:src/eles.cpp:1295,1333)."""
    rho, vel, p = cons_to_prim(u, gamma, n_dims)
    c = jnp.sqrt(gamma * p / rho)
    return jnp.sqrt(jnp.sum(vel * vel, axis=-1)) + c
