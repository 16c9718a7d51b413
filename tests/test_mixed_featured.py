"""Featured runs (body forcing + running time averages) on mixed-type
meshes plus BC ramping — the reference treats every element type
uniformly (ref:src/eles.cpp:5281-5484 evaluate_body_force, :5630-5700
CalcTimeAverageQuantities, ref:src/bdy_inters.cpp:482-509 ramping,
ref:src/bdy_inters.cpp:1478-1920 SEM inlets).  SEM inlets on SHARDED
mixed meshes remain unimplemented and must raise loudly instead of
silently dropping physics.
"""

import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hifiles_tpu.config.params import RunInput
from hifiles_tpu.mesh.generate import (channel_hex_mesh,
                                       channel_prism_tet_mesh)
from hifiles_tpu.solver.multiblock import MixedSolver
from hifiles_tpu.solver.solver import Solver

DECK = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "decks", "input_channel_les_bench")


def test_mixed_forced_channel_matches_single_type():
    """MixedSolver on a hex-only channel == Solver on the same mesh for
    the full forced+averaged LES combination (the degenerate one-type
    mixed case pins the mixed featured chunk to the single-type one)."""
    p = RunInput.from_deck(DECK)
    p.order = 2
    mesh = channel_hex_mesh(4, 4, 2)
    sm = MixedSolver(p, mesh, dtype=jnp.float64)
    assert sm._forcing and sm._avg
    sm.run(6, dt=p.dt)
    s1 = Solver(p, mesh, dtype=jnp.float64)
    assert s1.run_path == "SoA featured (fast)", s1.run_path
    s1.run(6, dt=p.dt)
    ct = sm.cts[0]
    sel = sm.mt.sels[ct]
    u1 = np.asarray(s1.u)
    um = np.asarray(sm.u[0])
    scale = max(np.abs(u1).max(), 1.0)
    assert np.abs(um - u1[sel]).max() < 1e-11 * scale
    ua1 = np.asarray(s1.u_avg)
    uam = np.asarray(sm.u_avg[0])
    assert np.abs(uam - ua1[sel]).max() < 1e-11 * scale
    assert abs(float(sm._mdot_old) - float(s1._mdot_old)) < 1e-11


def test_mixed_forced_wm_channel_soa_slot_parity(monkeypatch):
    """Genuinely mixed (prism/tet wall-modeled channel) + forcing +
    averages: the mixed-SoA chunk matches the slot chunk to roundoff."""
    deck = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "decks", "input_prism_tet_wm_bench")
    p = RunInput.from_deck(deck)
    p.forcing = 1
    p.body_force_type = 0
    p.body_force_area = 1.0 * 1.0          # y-z inflow plane of the box
    # the wm bench deck uses the TGV IC (zero mean x-flux through the
    # x=0 plane), so the forcing target must be ~0 or the two-step form
    # jolts the flow to Mach ~8 in one step
    p.body_force_mdot0 = 0.0
    p.average_fields = ["rho_average", "u_average", "w_average"]
    p.spinup_time = 0.0
    mesh = channel_prism_tet_mesh(4, 2, 1, 1, x1=2.0, y1=1.0, z1=1.0)
    s_fast = MixedSolver(p, mesh, dtype=jnp.float64)
    assert s_fast.run_path == "mixed-SoA (fast)", s_fast.run_path
    assert s_fast._forcing and s_fast._avg
    monkeypatch.setenv("HIFILES_NO_SOA", "1")
    s_slot = MixedSolver(p, mesh, dtype=jnp.float64)
    monkeypatch.delenv("HIFILES_NO_SOA")
    assert s_slot.residual_soa is None
    s_fast.run(6, dt=p.dt)
    s_slot.run(6, dt=p.dt)
    for a, b in zip(s_fast.u, s_slot.u):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1.0)
        assert np.abs(a - b).max() < 1e-11 * scale
    for a, b in zip(s_fast.u_avg, s_slot.u_avg):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-11
    assert abs(float(s_fast._mdot_old) - float(s_slot._mdot_old)) < 1e-11


def test_mixed_sem_matches_single_type():
    """SEM inlet on a quad-only MixedSolver == single-type Solver: the
    same eddy field (seed 0), length scale, and mass-flux correction
    (ref:src/bdy_inters.cpp:1478-1920) through the mixed global slot
    space."""
    from test_turb_inlet import les_channel_input
    from hifiles_tpu.mesh.generate import channel_quad_mesh
    p = les_channel_input(inlet_type=2, n_eddy=20)
    mesh = channel_quad_mesh(8, 4, 0.0, 2.0, 0.0, 1.0)
    sm = MixedSolver(p, mesh, dtype=jnp.float64)
    assert sm.turb_inlet is not None and sm._featured
    sm.run(15, dt=1e-5)
    s1 = Solver(p, mesh, dtype=jnp.float64)
    assert s1.turb_inlet is not None
    s1.run(15, dt=1e-5)
    sel = sm.mt.sels[sm.cts[0]]
    u1 = np.asarray(s1.u)
    diff = np.abs(np.asarray(sm.u[0]) - u1[sel]).max()
    assert diff < 1e-11 * max(np.abs(u1).max(), 1.0), diff
    # identical eddy positions after 15 advection steps
    de = np.abs(np.asarray(sm._ti_state[0])
                - np.asarray(s1._ti_state[0])).max()
    assert de < 1e-11, de


def test_mixed_sem_soa_slot_parity(monkeypatch):
    """SEM inlet on a genuinely mixed tri+quad channel: the mixed-SoA
    chunk matches the slot chunk (fluc rows land on the same global
    boundary points through the perm_b alignment)."""
    from test_turb_inlet import les_channel_input
    from hifiles_tpu.mesh.generate import channel_mixed_mesh_2d
    p = les_channel_input(inlet_type=2, n_eddy=16)
    mesh = channel_mixed_mesh_2d(8, 4, 0.0, 2.0, 0.0, 1.0)
    s_fast = MixedSolver(p, mesh, dtype=jnp.float64)
    assert s_fast.run_path == "mixed-SoA (fast)", s_fast.run_path
    assert s_fast.turb_inlet is not None
    monkeypatch.setenv("HIFILES_NO_SOA", "1")
    s_slot = MixedSolver(p, mesh, dtype=jnp.float64)
    monkeypatch.delenv("HIFILES_NO_SOA")
    s_fast.run(10, dt=1e-5)
    s_slot.run(10, dt=1e-5)
    for a, b in zip(s_fast.u, s_slot.u):
        a, b = np.asarray(a), np.asarray(b)
        diff = np.abs(a - b).max()
        assert diff < 1e-11 * max(np.abs(b).max(), 1.0), diff


def test_sharded_mixed_sem_inlet_raises():
    """SEM inlets remain unimplemented on SHARDED mixed meshes: loud
    failure instead of silently dropping the fluctuations."""
    import jax
    from test_turb_inlet import les_channel_input
    from hifiles_tpu.mesh.generate import channel_mixed_mesh_2d
    from hifiles_tpu.parallel.mixed_sharding import ShardedMixedSolver
    p = les_channel_input(inlet_type=2, n_eddy=10)
    mesh = channel_mixed_mesh_2d(4, 2, 0.0, 2.0, 0.0, 1.0)
    with pytest.raises(NotImplementedError, match="turbulent inlet"):
        ShardedMixedSolver(p, mesh, devices=jax.devices()[:2],
                           dtype=jnp.float64)


def _ramped_channel_input():
    """Ramped characteristic inflow deck on a quad channel (the
    test_featured_fast_path.test_ramp_parity configuration)."""
    from hifiles_tpu.config.params import (BCParams, CYCLIC, SUB_IN_CHAR,
                                           SUB_OUT_SIMP)
    from test_solver_features import vortex_input
    p = vortex_input(order=1)
    p.viscous = 0
    p.bc_list = [
        BCParams(name="Inflow", flag=SUB_IN_CHAR, p_total=30.0,
                 T_total=350.0, nx=1.0, ny=0.0, pressure_ramp=1,
                 p_ramp_coeff=0.01, T_ramp_coeff=0.0, p_total_old=20.0,
                 T_total_old=350.0),
        BCParams(name="Outflow", flag=SUB_OUT_SIMP, p_static=17.8,
                 T_total=350.0),
        BCParams(name="Cyclic", flag=CYCLIC)]
    p.dy_cyclic = 1.0
    return p


def test_mixed_ramp_matches_single_type():
    """BC ramping on mixed meshes (round-4 session 2): the degenerate
    quad-only MixedSolver reproduces the single-type Solver's ramped
    inflow evolution, iteration counter and all
    (ref:src/bdy_inters.cpp:482-509)."""
    from hifiles_tpu.mesh.generate import channel_quad_mesh
    p = _ramped_channel_input()
    mesh = channel_quad_mesh(4, 2, 0.0, 2.0, 0.0, 1.0)
    sm = MixedSolver(p, mesh, dtype=jnp.float64)
    assert sm._has_ramp and sm._featured
    sm.run(10, dt=1e-4)
    s1 = Solver(p, mesh, dtype=jnp.float64)
    assert s1._has_ramp
    s1.run(10, dt=1e-4)
    sel = sm.mt.sels[sm.cts[0]]
    u1 = np.asarray(s1.u)
    diff = np.abs(np.asarray(sm.u[0]) - u1[sel]).max()
    assert diff < 1e-11 * max(np.abs(u1).max(), 1.0), diff
    assert int(sm._iter_k) == int(s1._iter_k)


def test_sharded_mixed_ramp_matches_single():
    """Ramped mixed run sharded on 6 devices == MixedSolver."""
    import jax
    from hifiles_tpu.parallel.mixed_sharding import ShardedMixedSolver
    from hifiles_tpu.mesh.generate import channel_quad_mesh
    p = _ramped_channel_input()
    mesh = channel_quad_mesh(4, 2, 0.0, 2.0, 0.0, 1.0)
    ss = ShardedMixedSolver(p, mesh, devices=jax.devices()[:6],
                            dtype=jnp.float64)
    assert ss._has_ramp
    ss.run(8, dt=1e-4)
    s1 = MixedSolver(p, mesh, dtype=jnp.float64)
    s1.run(8, dt=1e-4)
    for a, b in zip(ss.gather_u(), s1.u):
        a, b = np.asarray(a), np.asarray(b)
        diff = np.abs(a - b).max()
        assert diff < 1e-11 * max(np.abs(b).max(), 1.0), diff


def test_sharded_mixed_forced_channel_matches_single():
    """8-dev ShardedMixedSolver == MixedSolver for the forced+averaged
    wall-modeled prism/tet channel (psum'd inflow integrals, carried mdot,
    per-type running averages)."""
    import jax
    from hifiles_tpu.parallel.mixed_sharding import ShardedMixedSolver
    deck = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "decks", "input_prism_tet_wm_bench")
    p = RunInput.from_deck(deck)
    p.forcing, p.body_force_type = 1, 0
    p.body_force_area = 1.0
    p.body_force_mdot0 = 0.0        # TGV IC: zero mean x-flux (see above)
    p.average_fields = ["rho_average", "u_average", "w_average"]
    p.spinup_time = 0.0
    mesh = channel_prism_tet_mesh(8, 2, 1, 1, x1=2.0, y1=1.0, z1=1.0)
    ss = ShardedMixedSolver(p, mesh, devices=jax.devices()[:8],
                            dtype=jnp.float64)
    assert ss.run_path.startswith("sharded mixed SoA"), ss.run_path
    assert ss._forcing and ss._avg
    ss.run(5, dt=p.dt)
    s1 = MixedSolver(p, mesh, dtype=jnp.float64)
    s1.run(5, dt=p.dt)
    for a, b in zip(ss.gather_u(), s1.u):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1.0)
        assert np.abs(a - b).max() < 1e-11 * scale
    for a, b in zip(ss.gather_u_avg(), s1.u_avg):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-11
    assert abs(float(ss._mdot_old) - float(s1._mdot_old)) < 1e-11
