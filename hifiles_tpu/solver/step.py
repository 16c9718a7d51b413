"""Low-storage time integrators (ref:src/eles.cpp:1080-1265,
ref:data/RK_coeff.dat).

adv_type codes: 0 forward Euler, 1 SSP-RK24(2N*), 2 SSP-RK34(2N),
3 RK45(2N) Carpenter-Kennedy, 4 SSP-RK414(2N) Niegemann.  All schemes use at
most two registers (u, r); each stage calls the spatial residual once.
"""

from __future__ import annotations

import numpy as np

# Carpenter-Kennedy RK45(2N) (ref:data/RK_coeff.dat adv_type==3)
RK45_A = np.array([
    0.0,
    -567301805773.0 / 1357537059087.0,
    -2404267990393.0 / 2016746695238.0,
    -3550918686646.0 / 2091501179385.0,
    -1275806237668.0 / 842570457699.0])
RK45_B = np.array([
    1432997174477.0 / 9575080441755.0,
    5161836677717.0 / 13612068292357.0,
    1720146321549.0 / 2090206949498.0,
    3134564353537.0 / 4481467310338.0,
    2277821191437.0 / 14882151754819.0])
RK45_C = np.array([
    0.0,
    1432997174477.0 / 9575080441755.0,
    2526269341429.0 / 6820363962896.0,
    2006345519317.0 / 3224310063776.0,
    2802321613138.0 / 2924317926251.0])

# Niegemann SSP-RK414(2N) (ref:data/RK_coeff.dat adv_type==4)
RK414_A = np.array([
    0.0, -0.7188012108672410, -0.7785331173421570, -0.0053282796654044,
    -0.8552979934029281, -3.9564138245774565, -1.5780575380587385,
    -2.0837094552574054, -0.7483334182761610, -0.7032861106563359,
    0.0013917096117681, -0.0932075369637460, -0.9514200470875948,
    -7.1151571693922548])
RK414_B = np.array([
    0.0367762454319673, 0.3136296607553959, 0.1531848691869027,
    0.0030097086818182, 0.3326293790646110, 0.2440251405350864,
    0.3718879239592277, 0.6204126221582444, 0.1524043173028741,
    0.0760894927419266, 0.0077604214040978, 0.0024647284755382,
    0.0780348340049386, 5.5059777270269628])
RK414_C = np.array([
    0.0, 0.0367762454319673, 0.1249685262725025, 0.2446177702277698,
    0.2476149531070420, 0.2969311120382472, 0.3978149645802642,
    0.5270854589440328, 0.6981269994175695, 0.8190890835352128,
    0.8527059887098624, 0.8604711817462826, 0.8627060376969976,
    0.8734213127600976])

N_STAGES = {0: 1, 1: 4, 2: 4, 3: 5, 4: 14}


def rk_stage_times(adv_type: int) -> np.ndarray:
    """c-coefficients: stage time offsets (ref:data/RK_coeff.dat)."""
    if adv_type == 0:
        return np.array([0.0])
    if adv_type == 1:
        return np.arange(4) / 3.0
    if adv_type == 2:
        return np.array([0.0, 0.5, 0.0, 0.5])
    if adv_type == 3:
        return RK45_C
    if adv_type == 4:
        return RK414_C
    raise ValueError(f"adv_type {adv_type} not implemented")


def make_step_fn(residual_fn, adv_type: int, source_fn=None,
                 post_stage=None):
    """Build step(u, reg, dt) -> (u, reg) advancing one full time step.

    ``residual_fn(u)`` returns -div_tconf/detjac; the RK function is
    F = div/detjac - src so rhs = -F = residual + src
    (ref:src/eles.cpp:1095-1247).  ``post_stage(u) -> u`` runs after every
    stage update (shock capture, ref:src/HiFiLES.cpp:211-218).

    The state ``u`` may be any pytree of arrays (a single array for one
    element type; a tuple of per-type arrays on mixed meshes) — all RK
    arithmetic goes through ``jax.tree.map``.
    """
    import jax
    import jax.numpy as jnp

    tmap = jax.tree.map

    def rhs(u):
        r = residual_fn(u)
        if source_fn is not None:
            r = tmap(lambda a, b: a + b, r, source_fn(u))
        return r

    ps = post_stage if post_stage is not None else (lambda u: u)

    if adv_type == 0:
        def step(u, reg, dt):
            return ps(tmap(lambda ui, ki: ui + dt * ki, u, rhs(u))), reg
        return step

    if adv_type == 1:  # SSP-RK24 (ref:src/eles.cpp:1117-1170)
        def step(u, reg, dt):
            u0 = u
            for _ in range(3):
                u = ps(tmap(lambda ui, ki: ui + dt / 3.0 * ki, u, rhs(u)))
            u = ps(tmap(lambda ui, u0i, ki: 0.75 * ui + 0.25 * u0i
                        + dt / 4.0 * ki, u, u0, rhs(u)))
            return u, reg
        return step

    if adv_type == 2:  # SSP-RK34 (ref:src/eles.cpp:1172-1220)
        def step(u, reg, dt):
            u0 = u
            half = lambda ui, ki: ui + dt / 2.0 * ki
            u = ps(tmap(half, u, rhs(u)))
            u = ps(tmap(half, u, rhs(u)))
            u = ps(tmap(lambda ui, u0i, ki: ui / 3.0 + 2.0 / 3.0 * u0i
                        + dt / 6.0 * ki, u, u0, rhs(u)))
            u = ps(tmap(half, u, rhs(u)))
            return u, reg
        return step

    if adv_type in (3, 4):  # 2N-register schemes (ref:src/eles.cpp:1229-1257)
        # python floats stay weakly typed: np.float64 scalars would promote
        # an f32 state to f64 when jax_enable_x64 is on
        A = [float(a) for a in (RK45_A if adv_type == 3 else RK414_A)]
        Bc = [float(b) for b in (RK45_B if adv_type == 3 else RK414_B)]

        def step(u, reg, dt):
            r = (tmap(jnp.zeros_like, u) if reg is None
                 else tmap(lambda x: x * 0.0, reg))
            for s in range(len(A)):
                r = tmap(lambda ri, ki, a=A[s]: a * ri + dt * ki, r, rhs(u))
                u = ps(tmap(lambda ui, ri, b=Bc[s]: ui + b * ri, u, r))
            return u, r
        return step

    raise ValueError(f"adv_type {adv_type} not implemented")
