"""TPU-tuned building blocks for the residual.

Measured on TPU v5e (TGV p=4, 3375 hexes): XLA lowers per-point 3x3
Jacobian einsums ('eulm,eufm->eufl') to convolution fusions costing ~9 ms;
the same contraction written as explicit broadcast multiply-adds runs in
~1 ms because it compiles to pure VPU elementwise fusions.  Layout
transposes are likewise avoided by emitting concatenations in the operator
column order directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def adj_apply_cat(jg, f):
    """tdisf_cat (E, d*U, F) = concat_l sum_m adj[l,m] * f[..., m].

    jg: (E, U, d, d) adjugate; f: (E, U, F, d) physical flux.  Column order
    l*U+u matches opp_div_fused / opp_2_cat."""
    d = jg.shape[-1]
    parts = []
    for l in range(d):
        acc = jg[:, :, None, l, 0] * f[..., 0]
        for m in range(1, d):
            acc = acc + jg[:, :, None, l, m] * f[..., m]
        parts.append(acc)
    return jnp.concatenate(parts, axis=1)


def adj_apply(jg, f):
    """(..., F, d) transformed flux, same layout as f (for over-integration
    adds).  jg: (..., d, d), f: (..., F, d); leading dims must match."""
    d = jg.shape[-1]
    outs = []
    for l in range(d):
        acc = jg[..., None, l, 0] * f[..., 0]
        for m in range(1, d):
            acc = acc + jg[..., None, l, m] * f[..., m]
        outs.append(acc)
    return jnp.stack(outs, axis=-1)


def adjT_apply(jg, tg, inv_det):
    """Physical gradient: out[..., l] = inv_det * sum_m jg[..., m, l] tg[..., m]
    (the (1/det) JGinv^T transform, ref:src/eles.cpp:1954-2011)."""
    d = jg.shape[-1]
    outs = []
    for l in range(d):
        acc = jg[..., None, 0, l] * tg[..., 0]
        for m in range(1, d):
            acc = acc + jg[..., None, m, l] * tg[..., m]
        outs.append(acc)
    return jnp.stack(outs, axis=-1) * inv_det[..., None, None]


def opmat(A, x, dtype, prec):
    """One operator GEMM: (K, U) @ (E, U, F) -> (E, K, F)."""
    return jnp.einsum("ku,euf->ekf", A, x, preferred_element_type=dtype,
                      precision=prec)


def opmat_md(A, x, dtype, prec):
    """Operator GEMM over a multi-component trailing axis:
    (K, U) @ (E, U, F, d) -> (E, K, F, d) without transposes."""
    E, U, F, d = x.shape
    out = jnp.einsum("ku,euq->ekq", A, x.reshape(E, U, F * d),
                     preferred_element_type=dtype, precision=prec)
    return out.reshape(E, A.shape[0], F, d)
