"""Sharded runs with boundary conditions: partitioned BC parameter tables
passed through shard_map (the mpi_inters + bdy_inters coexistence of the
reference, ref:src/geometry.cpp:351-415)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hifiles_tpu.config.params import (BCParams, CYCLIC, SUB_IN_SIMP,
                                       SUB_OUT_SIMP, RunInput)
from hifiles_tpu.mesh.generate import channel_quad_mesh
from hifiles_tpu.parallel.sharding import ShardedSolver
from hifiles_tpu.solver.solver import Solver


def channel_input(viscous=0):
    p = RunInput()
    p.equation = 0
    p.viscous = viscous
    p.order = 2
    p.ic_form = 1
    p.adv_type = 3
    p.riemann_solve_type = 0
    p.dt_type = 0
    p.dt = 1e-4
    p.gamma, p.R_gas = 1.4, 286.9
    p.rho_c_ic, p.u_c_ic, p.v_c_ic = 1.0, 0.3, 0.02
    p.p_c_ic = 17.857142857142858
    p.dy_cyclic = 1.0
    if viscous:
        p.mu_inf = 1e-4
        p.rt_inf = 1.0
        p.c_sth = 0.0
        p.fix_vis = 1
        p.prandtl = 0.72
        p.R_ref = 286.9
    inflow = BCParams(name="Inflow", flag=SUB_IN_SIMP, rho=1.0,
                      velocity=(0.3, 0.02, 0.0))
    outflow = BCParams(name="Outflow", flag=SUB_OUT_SIMP,
                       p_static=17.857142857142858, T_total=350.0)
    cyc = BCParams(name="Cyclic", flag=CYCLIC)
    p.bc_list = [inflow, outflow, cyc]
    return p


@pytest.mark.parametrize("viscous", [0, 1])
def test_sharded_channel_matches_single(viscous):
    mesh = channel_quad_mesh(8, 4, 0.0, 2.0, 0.0, 1.0)
    # perturbed IC so the BCs do real work
    p1 = channel_input(viscous)
    s1 = Solver(p1, mesh, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    u0 = np.asarray(s1.u) * (1.0 + 0.02 * rng.random(
        np.asarray(s1.u).shape))
    s1.u = jnp.asarray(u0, jnp.float64)
    s1.run(20, dt=1e-4)

    p2 = channel_input(viscous)
    sh = ShardedSolver(p2, mesh, devices=jax.devices()[:4],
                       dtype=jnp.float64)
    assert sh.tables.n_bdy > 0
    sh.u = jax.device_put(
        jnp.asarray(u0[sh.perm].reshape(sh.u.shape), jnp.float64),
        sh.u.sharding)
    sh.run(20, dt=1e-4)
    np.testing.assert_allclose(sh.gather_u(), np.asarray(s1.u),
                               rtol=0, atol=1e-11)


def test_sharded_wall_model_accepted():
    """Wall models are partitioned now (round 2): construction succeeds
    and a short run stays finite even when no face actually uses the
    model (use_wm unset)."""
    p = channel_input(1)
    p.wall_model = 1
    mesh = channel_quad_mesh(8, 4, 0.0, 2.0, 0.0, 1.0)
    s = ShardedSolver(p, mesh, devices=jax.devices()[:4],
                      dtype=jnp.float64)
    s.run(2, dt=p.dt)
    assert np.isfinite(np.asarray(s.u)).all()


def test_sharded_pressure_ramp_matches_single():
    """SUB_IN_CHAR ramping sharded: the iteration counter rides the scan
    carry and reaches the BC closures inside shard_map."""
    from hifiles_tpu.config.params import SUB_IN_CHAR
    mesh = channel_quad_mesh(8, 4, 0.0, 2.0, 0.0, 1.0)

    def ramped():
        p = channel_input(0)
        p.bc_list[0] = BCParams(
            name="Inflow", flag=SUB_IN_CHAR, p_total=30.0, T_total=350.0,
            nx=1.0, ny=0.0, pressure_ramp=1, p_ramp_coeff=0.05,
            T_ramp_coeff=0.0, p_total_old=20.0, T_total_old=350.0)
        return p

    from hifiles_tpu.solver.solver import Solver
    s1 = Solver(ramped(), mesh, dtype=jnp.float64)
    assert s1._has_ramp
    s1.run(12, dt=1e-4)

    sh = ShardedSolver(ramped(), mesh, devices=jax.devices()[:4],
                       dtype=jnp.float64)
    sh.run(12, dt=1e-4)
    assert int(sh._iter_k) == 13
    np.testing.assert_allclose(sh.gather_u(), np.asarray(s1.u),
                               rtol=0, atol=1e-11)
