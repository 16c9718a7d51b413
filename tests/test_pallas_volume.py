"""Pallas fused volume kernel vs the XLA reference chain
(solver/pallas_kernels.py; runs in interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from hifiles_tpu.models.euler import inviscid_flux
from hifiles_tpu.models.viscous import viscous_flux
from hifiles_tpu.solver.kernels import adj_apply_cat
from hifiles_tpu.solver import pallas_kernels as pk


@pytest.mark.parametrize("viscous", [False, True])
def test_volume_kernel_matches_xla(viscous, monkeypatch):
    # interpret mode: run the kernel body with numpy semantics on CPU
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        lambda *a, **k: orig(*a, interpret=True, **k))
    rng = np.random.default_rng(0)
    E, U, F, d = 8, 125, 5, 3
    mu = 1e-3
    u = jnp.asarray(rng.random((E, U, F)) + 1.0, jnp.float32)
    # physically sane state: positive internal energy
    u = u.at[..., 4].set(10.0 + u[..., 4])
    g = jnp.asarray(rng.random((E, U, F, d)) * 1e-2, jnp.float32)
    if not viscous:
        g = g * 0.0
    jg = jnp.asarray(rng.random((E, U, d, d)), jnp.float32)

    u_fm = jnp.transpose(u, (2, 0, 1))
    g_fm = jnp.transpose(g, (2, 3, 0, 1)).reshape(15, E, U)
    jg_fm = jnp.transpose(jg, (2, 3, 0, 1)).reshape(9, E, U)
    out = pk.volume_tdisf_fm(u_fm, g_fm, jg_fm, gamma=1.4, mu=mu,
                             prandtl=0.72, viscous=viscous, tile=4)

    f = inviscid_flux(u, 1.4, 3)
    if viscous:
        f = f + viscous_flux(u, g, gamma=1.4, prandtl=0.72, mu_inf=mu,
                             rt_inf=1.0, c_sth=0.0, fix_vis=1, n_dims=3,
                             rans=False)
    ref = adj_apply_cat(jg, f)
    assert np.isfinite(np.asarray(ref)).all()
    for l in range(3):
        for i in range(5):
            np.testing.assert_allclose(
                np.asarray(out[l * 5 + i]),
                np.asarray(ref[:, l * U:(l + 1) * U, i]),
                rtol=2e-6, atol=2e-6)
