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


def test_soa_shard_opt_out(monkeypatch):
    monkeypatch.setenv("HIFILES_NO_SOA", "1")
    p = tgv_input()
    p.order = 1
    ss = ShardedSolver(p, periodic_hex_mesh(4, 2, 2),
                       devices=jax.devices()[:4], dtype=jnp.float64)
    assert ss._residual_soa_shard is None
    ss.run(2, dt=p.dt)
    assert np.isfinite(np.asarray(ss.gather_u())).all()
