"""Round-4: "non-simple" runs (SEM inlets, BC ramping, body forcing, time
averages) ride the SoA fast path too.  Each featured config is run once on
the SoA featured chunk and once on the slot chunk (HIFILES_NO_SOA=1); the
states must agree to f64 round-off, and every flagship benchmark config
must actually engage its fast path (a silent SoaTables bail is a 20x
runtime regret, docs/PERF.md).

ref:src/eles.cpp:5281-5484 (body force), :5630-5700 (time averages),
ref:src/bdy_inters.cpp:1478-1920 (SEM inlet), :482-509 (ramp).
"""

import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from hifiles_tpu.config.params import (BCParams, CYCLIC, SUB_IN_CHAR,
                                       SUB_OUT_SIMP)
from hifiles_tpu.mesh.generate import (channel_quad_mesh,
                                       periodic_quad_mesh)
from hifiles_tpu.solver.solver import Solver


def _pair(monkeypatch, p, mesh, n, dt):
    """Build the same config on both chunk paths and compare end states."""
    s_fast = Solver(p, mesh, dtype=jnp.float64)
    assert s_fast.run_path == "SoA featured (fast)", s_fast.run_path
    monkeypatch.setenv("HIFILES_NO_SOA", "1")
    s_slot = Solver(p, mesh, dtype=jnp.float64)
    assert s_slot.run_path.startswith("slot featured"), s_slot.run_path
    monkeypatch.delenv("HIFILES_NO_SOA")
    s_fast.run(n, dt=dt)
    s_slot.run(n, dt=dt)
    a, b = np.asarray(s_fast.u), np.asarray(s_slot.u)
    scale = max(np.abs(b).max(), 1.0)
    assert np.abs(a - b).max() < 1e-11 * scale, np.abs(a - b).max()
    if s_fast.u_avg is not None:
        ua, ub = np.asarray(s_fast.u_avg), np.asarray(s_slot.u_avg)
        assert np.abs(ua - ub).max() < 1e-11 * scale, np.abs(ua - ub).max()
    return s_fast, s_slot


def test_sem_inlet_parity(monkeypatch):
    """SEM eddies advance identically (same carried PRNG state) on both
    paths; the fluc rows land on the same boundary points."""
    from test_turb_inlet import les_channel_input
    p = les_channel_input(inlet_type=2, n_eddy=20)
    mesh = channel_quad_mesh(8, 4, 0.0, 2.0, 0.0, 1.0)
    s_fast, _ = _pair(monkeypatch, p, mesh, 20, 1e-5)
    assert s_fast.turb_inlet is not None


def test_forcing_and_averaging_parity(monkeypatch):
    from test_solver_features import vortex_input
    p = vortex_input()
    p.u_c_ic = 0.2
    p.forcing = 1
    p.body_force_area = 2.0
    p.body_force_mdot0 = 0.44
    p.body_force_type = 1
    p.average_fields = ["rho_average", "u_average", "v_average"]
    p.spinup_time = 0.0
    mesh = periodic_quad_mesh(6, 6, -1, 1, -1, 1)
    s_fast, _ = _pair(monkeypatch, p, mesh, 20, 2e-4)
    assert s_fast._forcing and s_fast._avg


def test_channel_les_parity(monkeypatch):
    """The full channel-LES combination (Smagorinsky + body forcing +
    time averages + no-slip walls, the bench "channel" config) agrees
    between the SoA featured chunk and the slot chunk."""
    from hifiles_tpu.config.params import RunInput
    from hifiles_tpu.mesh.generate import channel_hex_mesh
    deck = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "decks",
        "input_channel_les_bench")
    p = RunInput.from_deck(deck)
    p.order = 2                      # small twin; the inflow-plane area
    mesh = channel_hex_mesh(4, 4, 2)  # (2 x pi) is resolution-independent
    s_fast, _ = _pair(monkeypatch, p, mesh, 10, p.dt)
    assert s_fast._forcing and s_fast._avg and s_fast.p.LES


def test_ramp_parity(monkeypatch):
    from test_solver_features import vortex_input
    p = vortex_input(order=1)
    p.viscous = 0
    inflow = BCParams(name="Inflow", flag=SUB_IN_CHAR, p_total=30.0,
                      T_total=350.0, nx=1.0, ny=0.0,
                      pressure_ramp=1, p_ramp_coeff=0.01,
                      T_ramp_coeff=0.0, p_total_old=20.0,
                      T_total_old=350.0)
    outflow = BCParams(name="Outflow", flag=SUB_OUT_SIMP, p_static=17.8,
                       T_total=350.0)
    p.bc_list = [inflow, outflow, BCParams(name="Cyclic", flag=CYCLIC)]
    p.dy_cyclic = 1.0
    mesh = channel_quad_mesh(4, 2, 0.0, 2.0, 0.0, 1.0)
    s_fast, _ = _pair(monkeypatch, p, mesh, 10, 1e-4)
    assert s_fast._has_ramp


def test_forcing_local_dt_parity(monkeypatch):
    """Local dt through the featured chunk: the forcing/eddy scalar step is
    min(dt) on both paths."""
    from test_solver_features import vortex_input
    p = vortex_input()
    p.u_c_ic = 0.2
    p.forcing = 1
    p.body_force_area = 2.0
    p.body_force_mdot0 = 0.44
    p.body_force_type = 1
    mesh = periodic_quad_mesh(6, 6, -1, 1, -1, 1)
    rng = np.random.default_rng(3)
    dt = 2e-4 * (1.0 + 0.5 * rng.random(mesh.n_cells))
    _pair(monkeypatch, p, mesh, 10, dt)


# ----------------------------------------------------------------------
# flagship configs engage their fast path (VERDICT r3 "loud path" item)
# ----------------------------------------------------------------------

@pytest.mark.parametrize("cfg", ["plain", "overint", "smag", "shock",
                                 "rans"])
def test_flagship_configs_engage_soa(cfg):
    """Every BENCH_CONFIG TGV variant must run the SoA fast chunk (the
    benchmark protocol itself, bench.py configure())."""
    import bench
    from hifiles_tpu.config.params import RunInput
    from hifiles_tpu.mesh.generate import periodic_hex_mesh
    p = RunInput()
    p.equation, p.viscous, p.order = 0, 1, 2
    p.ic_form, p.adv_type = 7, 3
    p.riemann_solve_type = 3
    p.dt_type, p.dt = 0, 1.440389e-5
    p.vcjh_scheme_hexa = 1
    p.dx_cyclic = p.dy_cyclic = p.dz_cyclic = 2 * np.pi
    p.gamma, p.R_gas, p.fix_vis = 1.4, 286.9, 1
    p.prandtl = 0.72
    p.Mach_free_stream, p.T_free_stream = 0.1, 300.0
    p.rho_free_stream = 0.0008421095852102401
    p.mu_gas = 1.827e-5
    p.L_free_stream = 1.0
    p.Mach_c_ic, p.T_c_ic, p.rho_c_ic = 0.1, 300.0, 0.0008421095852102401
    bench.configure(p, cfg)
    p.setup_params()
    s = Solver(p, periodic_hex_mesh(4, 4, 4), dtype=jnp.float64)
    if cfg == "rans":
        s.u = s.u.at[..., -1].set(p.mu_tilde_inf)
    assert s.run_path == "SoA (fast)", (cfg, s.run_path)
    s.run(2, dt=p.dt)
    assert np.isfinite(np.asarray(s.u)).all()


def test_flagship_channel_engages_featured_soa():
    """The forced-channel LES flagship (bench.run_channel protocol, shipped
    deck) runs the SoA FEATURED chunk: body forcing + time averages +
    no-slip walls on the fast path (ref:src/eles.cpp:5281-5484,
    :5630-5700)."""
    from hifiles_tpu.config.params import RunInput
    from hifiles_tpu.mesh.generate import channel_hex_mesh
    deck = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "decks",
        "input_channel_les_bench")
    p = RunInput.from_deck(deck)
    p.order = 2                      # small twin of the p=4 bench case
    s = Solver(p, channel_hex_mesh(4, 4, 4), dtype=jnp.float64)
    assert s.run_path == "SoA featured (fast)", s.run_path
    assert s._forcing and s._avg
    s.run(3, dt=p.dt)
    assert np.isfinite(np.asarray(s.u)).all()
    assert np.isfinite(np.asarray(s.u_avg)).all()


def test_flagship_mixed_engages_soa():
    """The mixed flagship (bench.run_mixed protocol) runs the per-type
    mixed-SoA path."""
    import bench
    from hifiles_tpu.mesh.generate import periodic_mixed_mesh_2d
    from hifiles_tpu.solver.multiblock import MixedSolver
    p = bench.mixed_input()
    mesh = periodic_mixed_mesh_2d(12, 12, -10, 10, -10, 10)
    s = MixedSolver(p, mesh, dtype=jnp.float64)
    assert s.run_path == "mixed-SoA (fast)", s.run_path
    s.run(2, dt=p.dt)
    for a in np.asarray(s.u[0]), np.asarray(s.u[1]):
        assert np.isfinite(a).all()
