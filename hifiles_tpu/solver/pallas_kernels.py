"""Pallas TPU kernel for the fused volume stage of the FR residual.

The conserved state is logically (E, U, F) with F = 5 fields; elementwise
flux math on that layout works on 5-wide minor tiles, wasting 123 of the
TPU's 128 lanes.  This kernel takes FIELD-MAJOR inputs (F, E, U) — minor
dim U (125 for p=4 hexes ≈ one full lane tile) — so the entire inviscid +
viscous flux evaluation and the adjugate transform
  tdisf[l*F+i][e,u] = sum_m adj(J)[l,m][e,u] * flux_i_m[e,u]
run at full lane utilization in VMEM without materializing the physical
flux in HBM (ref:src/eles.cpp:1480-1545 evaluate_invFlux, :1823-2052 the
reference's per-point CUDA kernels).

f32, 3-D Navier-Stokes, fix_vis=1 (constant viscosity) — the flagship TGV
configuration.  The XLA path in kernels.py covers everything else.

STATUS — superseded by the SoA layout redesign (residual_soa.py), kept as
a reference kernel + test of the Pallas toolchain.  Profiling the (E,U,F)
residual on TPU v5e showed the stage cost was NOT in the fused volume
math this kernel accelerates, but in the ~0.5 ms relayout copies XLA
inserted around every face-row reshape (F=5 minor axis -> 25x lane
padding).  Rewriting the residual in the elements-minor (U, F, E) layout
removed those copies entirely and let XLA's own fusion cover the volume
stage at full VPU/lane occupancy — measured 3.9x end-to-end, more than
this kernel could deliver on its stage alone (the volume stage was ~15%
of the old residual).  Conclusion recorded per the round-2 review: with
the right layouts, XLA's automatic fusion wins over hand-written Pallas
for these shapes; Pallas remains the tool of choice for the future
cross-stage fusion (face exchange + flux in one kernel), which XLA
cannot express across gathers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _volume_kernel(u_ref, g_ref, jg_ref, o_ref, *, gamma, mu, prandtl,
                   viscous):
    """u (5, TE, U), grad (15, TE, U) [field*3+dim], jg (9, TE, U)
    [l*3+m] -> tdisf (15, TE, U) [l*5+field]."""
    rho = u_ref[0]
    mx, my, mz = u_ref[1], u_ref[2], u_ref[3]
    en = u_ref[4]
    inv_rho = 1.0 / rho
    vx, vy, vz = mx * inv_rho, my * inv_rho, mz * inv_rho
    q2 = vx * vx + vy * vy + vz * vz
    p = (gamma - 1.0) * (en - 0.5 * rho * q2)
    hp = en + p

    v = (vx, vy, vz)
    m = (mx, my, mz)
    # f[i][dd]: flux of field i along dim dd (ref:src/eles.cpp:1480-1545)
    f = [[m[dd] for dd in range(3)],
         [mx * v[dd] for dd in range(3)],
         [my * v[dd] for dd in range(3)],
         [mz * v[dd] for dd in range(3)],
         [hp * v[dd] for dd in range(3)]]
    f[1][0] = f[1][0] + p
    f[2][1] = f[2][1] + p
    f[3][2] = f[3][2] + p

    if viscous:
        gr = [g_ref[0 * 3 + dd] for dd in range(3)]
        gm = [[g_ref[(1 + i) * 3 + dd] for dd in range(3)] for i in range(3)]
        ge = [g_ref[4 * 3 + dd] for dd in range(3)]
        dv = [[(gm[i][dd] - v[i] * gr[dd]) * inv_rho for dd in range(3)]
              for i in range(3)]
        inte = en * inv_rho - 0.5 * q2
        # de_j = (dE_j - (ke + e_int) drho_j)/rho - sum_i v_i dv[i][j]
        # (identical algebra to models/viscous.py:46-52)
        dint = [(ge[dd] - (0.5 * q2 + inte) * gr[dd]) * inv_rho
                - (vx * dv[0][dd] + vy * dv[1][dd] + vz * dv[2][dd])
                for dd in range(3)]
        div = dv[0][0] + dv[1][1] + dv[2][2]
        lam = -2.0 / 3.0 * mu
        tau = [[mu * (dv[i][dd] + dv[dd][i]) for dd in range(3)]
               for i in range(3)]
        for i in range(3):
            tau[i][i] = tau[i][i] + lam * div
        kth = mu * gamma / prandtl
        for dd in range(3):
            f[1][dd] = f[1][dd] - tau[0][dd]
            f[2][dd] = f[2][dd] - tau[1][dd]
            f[3][dd] = f[3][dd] - tau[2][dd]
            f[4][dd] = f[4][dd] - (vx * tau[0][dd] + vy * tau[1][dd]
                                   + vz * tau[2][dd] + kth * dint[dd])

    for l in range(3):
        a = [jg_ref[l * 3 + mm] for mm in range(3)]
        for i in range(5):
            o_ref[l * 5 + i] = a[0] * f[i][0] + a[1] * f[i][1] \
                + a[2] * f[i][2]


@functools.partial(jax.jit, static_argnames=("gamma", "mu", "prandtl",
                                             "viscous", "tile"))
def volume_tdisf_fm(u_fm, grad_fm, jg_fm, *, gamma, mu, prandtl, viscous,
                    tile: int = 256):
    """Fused volume stage on field-major data.

    u_fm (5, E, U) f32, grad_fm (15, E, U) [field*3+dim] (pass zeros when
    viscous=False), jg_fm (9, E, U) [l*3+m] -> tdisf (15, E, U) [l*5+i]."""
    _, E, U = u_fm.shape
    if E % tile:
        raise ValueError(f"E={E} not divisible by tile={tile}")
    kern = functools.partial(_volume_kernel, gamma=gamma, mu=mu,
                             prandtl=prandtl, viscous=viscous)
    return pl.pallas_call(
        kern,
        grid=(E // tile,),
        in_specs=[
            pl.BlockSpec((5, tile, U), lambda i: (0, i, 0)),
            pl.BlockSpec((15, tile, U), lambda i: (0, i, 0)),
            pl.BlockSpec((9, tile, U), lambda i: (0, i, 0)),
        ],
        out_specs=pl.BlockSpec((15, tile, U), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((15, E, U), u_fm.dtype),
    )(u_fm, grad_fm, jg_fm)
