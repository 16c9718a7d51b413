"""Sharded SoA fast path (parallel/soa_sharding.py): must ACTIVATE for the
eligible configs and match the single-device solver to roundoff, including
boundary conditions, halo exchange, and unequal shard sizes."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp

from hifiles_tpu.config.params import RunInput
from hifiles_tpu.mesh.generate import channel_quad_mesh, periodic_hex_mesh
from hifiles_tpu.parallel.sharding import ShardedSolver
from hifiles_tpu.solver.solver import Solver

from test_face_path import tgv_input


def test_soa_shard_active_hex_viscous():
    p = tgv_input()
    p.order = 2
    mesh = periodic_hex_mesh(4, 4, 4)
    ss = ShardedSolver(p, mesh, devices=jax.devices()[:8],
                       dtype=jnp.float64)
    assert ss._residual_soa_shard is not None, \
        "SoA shard path should activate for viscous TGV hexes"
    ss.run(3, dt=p.dt)
    s1 = Solver(p, mesh, dtype=jnp.float64)
    s1.run(3, dt=p.dt)
    diff = np.abs(np.asarray(ss.gather_u()) - np.asarray(s1.u)).max()
    assert diff < 1e-12, diff


def test_soa_shard_boundaries_unequal_shards():
    """Quad channel (inflow/outflow/cyclic BCs) with 7 devices so shard
    sizes are unequal (padding clones) — boundary bridge + halo + pad
    masking through the SoA path."""
    from test_turb_inlet import les_channel_input
    p = les_channel_input(inlet_type=0)
    p.LES = 0
    mesh = channel_quad_mesh(10, 4, 0.0, 2.0, 0.0, 1.0)   # 40 cells / 7
    ss = ShardedSolver(p, mesh, devices=jax.devices()[:7],
                       dtype=jnp.float64)
    assert ss._residual_soa_shard is not None
    ss.run(3, dt=p.dt)
    s1 = Solver(p, mesh, dtype=jnp.float64)
    s1.run(3, dt=p.dt)
    diff = np.abs(np.asarray(ss.gather_u()) - np.asarray(s1.u)).max()
    assert diff < 1e-12, diff


# ----------------------------------------------------------------------
# round-4: feature physics through the sharded SoA path (8-dev == 1-dev)
# ----------------------------------------------------------------------

def _pair(p, mesh, n=3, n_dev=8, perturb=None):
    ss = ShardedSolver(p, mesh, devices=jax.devices()[:n_dev],
                       dtype=jnp.float64)
    assert ss._residual_soa_shard is not None, \
        "sharded SoA path should activate for this feature config"
    s1 = Solver(p, mesh, dtype=jnp.float64)
    if perturb is not None:
        u = perturb(np.asarray(s1.u))
        s1.u = jnp.asarray(u, s1.dtype)
        ss.u = jax.device_put(
            jnp.asarray(u[ss.owner.reshape(-1)].reshape(ss.u.shape),
                        ss.dtype), ss.u.sharding)
    ss.run(n, dt=p.dt)
    s1.run(n, dt=p.dt)
    diff = np.abs(np.asarray(ss.gather_u()) - np.asarray(s1.u)).max()
    scale = max(np.abs(np.asarray(s1.u)).max(), 1.0)
    assert diff < 1e-11 * scale, diff


def _noise(seed=0, amp=0.02):
    def f(u):
        rng = np.random.default_rng(seed)
        return u * (1.0 + amp * rng.random(u.shape))
    return f


@pytest.mark.parametrize("model", [0, 1, 4])
def test_soa_shard_les_models(model):
    """Eddy + similarity SGS on the sharded SoA path; the similarity
    normal flux rides the qn exchange (the send_sgsf_fpts analog)."""
    from test_les import tgv_input as les_tgv
    p = les_tgv(les=1, sgs_model=model)
    p.order = 2
    _pair(p, periodic_hex_mesh(4, 2, 2), perturb=_noise())


def test_soa_shard_over_int():
    p = tgv_input()
    p.order = 2
    p.over_int, p.over_int_order = 1, 4
    _pair(p, periodic_hex_mesh(4, 2, 2), perturb=_noise())


def test_soa_shard_shock_capture():
    p = tgv_input()
    p.order = 2
    p.shock_cap, p.s0 = 1, 0.0
    p.riemann_solve_type = 2            # RoeM (BASELINE #5 pairing)
    _pair(p, periodic_hex_mesh(4, 2, 2), perturb=_noise())


def test_soa_shard_svv():
    from test_les import tgv_input as les_tgv
    p = les_tgv(les=1, sgs_model=3)
    p.order = 2
    _pair(p, periodic_hex_mesh(4, 2, 2), perturb=_noise())


def test_soa_shard_rans_channel():
    """SA-RANS 6-field pipeline + source through the sharded SoA path."""
    from hifiles_tpu.config.params import ADIABAT_WALL, BCParams, CYCLIC
    from test_rans_viscous_bc import _rans_channel_input
    p = _rans_channel_input()
    p.bc_list = [BCParams(name="Cyc", flag=CYCLIC),
                 BCParams(name="CycX", flag=CYCLIC),
                 BCParams(name="Wall", flag=ADIABAT_WALL)]
    mesh = channel_quad_mesh(8, 4, 0.0, 4.0, 0.0, 1.0,
                             bc_x="Cyc", bc_X="Cyc", bc_y="Wall")
    mesh.bc_id[mesh.bc_id == 1] = 0
    mesh.bc_names = ["Cyc", "unused", "Wall"]
    _pair(p, mesh, n_dev=7, perturb=_noise())


def test_soa_shard_wall_model():
    """Wall-modeled LES channel: wm input state gathered from the sharded
    SoA volume solution."""
    from test_mixed_wall_model import _channel_mesh, _wm_input
    p = _wm_input()
    _pair(p, _channel_mesh(), n_dev=7, perturb=_noise())


def test_soa_shard_opt_out(monkeypatch):
    monkeypatch.setenv("HIFILES_NO_SOA", "1")
    p = tgv_input()
    p.order = 1
    ss = ShardedSolver(p, periodic_hex_mesh(4, 2, 2),
                       devices=jax.devices()[:4], dtype=jnp.float64)
    assert ss._residual_soa_shard is None
    ss.run(2, dt=p.dt)
    assert np.isfinite(np.asarray(ss.gather_u())).all()


# ----------------------------------------------------------------------
# round-4 session 2: featured runs (body forcing + time averages) on the
# sharded path — the multi-chip forced-channel LES production config
# (ref:src/eles.cpp:5281-5484 with MPI-reduced inflow integrals,
#  :5630-5700 CalcTimeAverageQuantities)
# ----------------------------------------------------------------------

def test_soa_shard_forced_channel_les():
    """Forced-channel LES + time averaging: 8-dev sharded == 1-dev
    featured chunk to roundoff, including the psum'd inflow mass flux,
    the carried mdot memory, and the running averages."""
    from hifiles_tpu.mesh.generate import channel_hex_mesh
    deck = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "decks", "input_channel_les_bench")
    p = RunInput.from_deck(deck)
    p.order = 2
    mesh = channel_hex_mesh(4, 4, 2)
    ss = ShardedSolver(p, mesh, devices=jax.devices()[:8],
                       dtype=jnp.float64)
    assert ss._residual_soa_shard is not None, ss.run_path
    assert ss._forcing and ss._avg
    ss.run(6, dt=p.dt)
    s1 = Solver(p, mesh, dtype=jnp.float64)
    assert s1.run_path == "SoA featured (fast)", s1.run_path
    s1.run(6, dt=p.dt)
    diff = np.abs(np.asarray(ss.gather_u()) - np.asarray(s1.u)).max()
    assert diff < 1e-12, diff
    da = np.abs(np.asarray(ss.gather_u_avg()) - np.asarray(s1.u_avg)).max()
    assert da < 1e-12, da
    dm = abs(float(ss._mdot_old) - float(s1._mdot_old))
    assert dm < 1e-12, dm


def test_soa_shard_forcing_local_dt():
    """Forcing under local time stepping: the sharded dt_s is the global
    pmin over real elements, matching the single-device min(dt)."""
    from hifiles_tpu.mesh.generate import channel_hex_mesh
    deck = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "decks", "input_channel_les_bench")
    p = RunInput.from_deck(deck)
    p.order = 1
    p.dt_type, p.CFL = 2, 0.1
    mesh = channel_hex_mesh(4, 4, 2)
    ss = ShardedSolver(p, mesh, devices=jax.devices()[:5],
                       dtype=jnp.float64)
    assert ss._forcing
    ss.run(4)
    s1 = Solver(p, mesh, dtype=jnp.float64)
    s1.run(4, dt=np.asarray(s1.compute_dt()))
    diff = np.abs(np.asarray(ss.gather_u()) - np.asarray(s1.u)).max()
    assert diff < 1e-12, diff
