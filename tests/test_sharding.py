"""Multi-chip tests on the virtual 8-device CPU mesh: the sharded solver
must reproduce the single-device solution (halo exchange correctness)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hifiles_tpu.config.params import RunInput
from hifiles_tpu.mesh.generate import periodic_hex_mesh, periodic_quad_mesh
from hifiles_tpu.parallel.sharding import ShardedSolver
from hifiles_tpu.solver.solver import Solver


def vortex_input(order=2):
    p = RunInput()
    p.equation = 0
    p.viscous = 0
    p.order = order
    p.ic_form = 0
    p.test_case = 1
    p.n_steps = 0
    p.adv_type = 3
    p.riemann_solve_type = 0
    p.dt_type = 0
    p.dt = 1e-3
    p.vcjh_scheme_quad = 1
    p.dx_cyclic = 10.0
    p.dy_cyclic = 10.0
    return p


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_matches_single_device_quad():
    p = vortex_input(order=2)
    mesh = periodic_quad_mesh(8, 8, -5, 5, -5, 5)

    s1 = Solver(p, mesh, dtype=jnp.float64)
    s1.run(5, dt=1e-3)
    u_ref = np.asarray(s1.u)

    s8 = ShardedSolver(p, mesh, dtype=jnp.float64)
    assert s8.n_shards == 8
    s8.run(5, dt=1e-3)
    u_sh = s8.gather_u()

    # halo faces are flux-solved once per side, so agreement is to roundoff,
    # not bitwise (same contract as the reference's mpi_inters)
    np.testing.assert_allclose(u_sh, u_ref, rtol=0, atol=1e-12)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_matches_single_device_hex_viscous():
    """3-D viscous TGV on 8 shards == single device (gradient halo path)."""
    p = RunInput()
    p.equation = 0
    p.viscous = 1
    p.order = 1
    p.ic_form = 7
    p.adv_type = 3
    p.riemann_solve_type = 3
    p.dt_type = 0
    p.dt = 1e-4
    p.n_steps = 0
    p.vcjh_scheme_hexa = 1
    p.dx_cyclic = p.dy_cyclic = p.dz_cyclic = 2 * np.pi
    # TGV non-dim parameters (mirrors the reference deck)
    p.gamma, p.R_gas, p.fix_vis = 1.4, 286.9, 1
    p.Mach_free_stream, p.T_free_stream = 0.1, 300.0
    p.rho_free_stream = 0.0008421095852102401
    p.mu_gas = 1.827e-5
    p.Mach_c_ic, p.T_c_ic, p.rho_c_ic = 0.1, 300.0, 0.0008421095852102401
    p.setup_params()

    mesh = periodic_hex_mesh(4, 4, 4)
    s1 = Solver(p, mesh, dtype=jnp.float64)
    s1.run(3, dt=p.dt)
    u_ref = np.asarray(s1.u)

    s8 = ShardedSolver(p, mesh, dtype=jnp.float64)
    s8.run(3, dt=p.dt)
    u_sh = s8.gather_u()
    np.testing.assert_allclose(u_sh, u_ref, rtol=0, atol=1e-12)


def _tgv3d_input(les=0, sgs=0, shock=0):
    import numpy as np
    from hifiles_tpu.config.params import RunInput
    p = RunInput()
    p.equation = 0
    p.viscous = 1
    p.order = 2
    p.ic_form = 7
    p.adv_type = 3
    p.riemann_solve_type = 3
    p.dt_type = 0
    p.vcjh_scheme_hexa = 1
    p.dx_cyclic = p.dy_cyclic = p.dz_cyclic = 2 * np.pi
    p.gamma, p.R_gas, p.fix_vis = 1.4, 286.9, 1
    p.prandtl = 0.72
    p.Mach_free_stream, p.T_free_stream = 0.1, 300.0
    p.rho_free_stream = 0.0008421095852102401
    p.mu_gas = 1.827e-5
    p.L_free_stream = 1.0
    p.Mach_c_ic, p.T_c_ic, p.rho_c_ic = 0.1, 300.0, 0.0008421095852102401
    p.dt = 1.440389e-5
    if les:
        p.LES, p.SGS_model, p.C_s = 1, sgs, 0.1
        p.filter_type, p.filter_ratio = 2, 2.0
    if shock:
        p.shock_cap, p.shock_det = 1, 0
        p.s0, p.expf_fac, p.expf_order = -6.0, 4.0, 4
    p.setup_params()
    return p


@pytest.mark.parametrize("les,sgs,shock", [(1, 1, 0), (1, 2, 0), (0, 0, 1)])
def test_sharded_les_and_shock_capture_match_single(les, sgs, shock):
    """Sharded LES (WALE + WSM incl. the third SGS-flux halo exchange) and
    sharded shock capture match the single-device solver — these paths
    previously dropped the terms silently."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from hifiles_tpu.mesh.generate import periodic_hex_mesh
    from hifiles_tpu.solver.solver import Solver
    mesh = periodic_hex_mesh(4, 2, 2)
    s1 = Solver(_tgv3d_input(les, sgs, shock), mesh, dtype=jnp.float64)
    s1.run(8, dt=s1.p.dt)
    sh = ShardedSolver(_tgv3d_input(les, sgs, shock), mesh,
                       devices=jax.devices()[:4], dtype=jnp.float64)
    sh.run(8, dt=sh.p.dt)
    np.testing.assert_allclose(sh.gather_u(), np.asarray(s1.u),
                               rtol=0, atol=1e-12)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_unequal_shard_sizes_match_single():
    """15 quads on 8 shards (sizes 2..2,1): padding clones are frozen and
    the real solution matches single-device to roundoff."""
    p = vortex_input(order=2)
    mesh = periodic_quad_mesh(5, 3, -5, 5, -5, 5)

    s1 = Solver(p, mesh, dtype=jnp.float64)
    s1.run(5, dt=1e-3)
    u_ref = np.asarray(s1.u)

    s8 = ShardedSolver(p, mesh, dtype=jnp.float64)
    assert s8.n_shards == 8
    assert s8.sizes.min() != s8.sizes.max()   # genuinely unequal
    s8.run(5, dt=1e-3)
    np.testing.assert_allclose(s8.gather_u(), u_ref, rtol=0, atol=1e-12)
    # padding clones stayed finite
    assert np.isfinite(np.asarray(s8.u)).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_cylinder_unequal_shards():
    """The reference cylinder mesh (1074 tris, not divisible by 8) sharded
    onto 8 devices matches the single-device run (VERDICT r1 item 4)."""
    import os
    from hifiles_tpu.config import Deck
    from hifiles_tpu.mesh.gambit import read_gambit
    from tests.test_cylinder import CYL_DECK, CYL_MESH
    if not os.path.exists(CYL_MESH):
        pytest.skip("reference absent")
    mesh = read_gambit(CYL_MESH)

    p1 = RunInput.from_deck(Deck(CYL_DECK, "cyl"))
    s1 = Solver(p1, mesh, dtype=jnp.float64)
    s1.run(5, dt=5e-5)

    p8 = RunInput.from_deck(Deck(CYL_DECK, "cyl"))
    s8 = ShardedSolver(p8, mesh, dtype=jnp.float64, partition="graph")
    assert mesh.n_cells % 8 != 0          # genuinely non-divisible
    assert s8.sizes.sum() == mesh.n_cells
    s8.run(5, dt=5e-5)
    # dimensional deck (energy ~2.5e5): roundoff agreement is relative
    np.testing.assert_allclose(s8.gather_u(), np.asarray(s1.u),
                               rtol=1e-12, atol=1e-9)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_cfl_dt_and_residual_norms_match_single():
    """dt_type 1 via lax.pmin and residual norms via psum/pmax agree with
    the single-device host-side computations (VERDICT r1 item 5)."""
    p = _tgv3d_input()
    p.dt_type = 1
    p.CFL = 0.25
    mesh = periodic_hex_mesh(4, 2, 2)
    s1 = Solver(p, mesh, dtype=jnp.float64)

    p8 = _tgv3d_input()
    p8.dt_type = 1
    p8.CFL = 0.25
    s8 = ShardedSolver(p8, mesh, devices=jax.devices()[:4],
                       dtype=jnp.float64)
    dt1 = s1.compute_dt()
    dt8 = float(s8.compute_dt())
    assert abs(dt8 - dt1) <= 1e-12 * abs(dt1)

    for nt in (0, 1, 2):
        n1 = s1.residual_norm(nt)
        n8 = s8.norm_residual(nt)
        np.testing.assert_allclose(n8, n1, rtol=1e-11, atol=1e-14)

    # a CFL-driven sharded run (dt=None path) matches single-device
    s1.run(3)
    s8.run(3)
    np.testing.assert_allclose(s8.gather_u(), np.asarray(s1.u),
                               rtol=0, atol=1e-12)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_local_dt_matches_single():
    """dt_type 2 (local time stepping) sharded == single-device."""
    p = vortex_input(order=2)
    p.dt_type = 2
    p.CFL = 0.3
    mesh = periodic_quad_mesh(8, 8, -5, 5, -5, 5)
    s1 = Solver(p, mesh, dtype=jnp.float64)
    dt_ele = s1.compute_dt()
    s1.run(3, dt=dt_ele)

    p8 = vortex_input(order=2)
    p8.dt_type = 2
    p8.CFL = 0.3
    s8 = ShardedSolver(p8, mesh, dtype=jnp.float64)
    s8.run(3)
    np.testing.assert_allclose(s8.gather_u(), np.asarray(s1.u),
                               rtol=0, atol=1e-12)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_wall_model_matches_single():
    """Wall-modeled LES channel sharded on 8 devices == single device:
    the wm input point is a solution point of the face's own element, so
    the tables partition shard-locally (VERDICT r1 item 3)."""
    from hifiles_tpu.config.params import BCParams, CYCLIC, ISOTHERM_WALL
    from hifiles_tpu.mesh.generate import channel_quad_mesh

    def make_input():
        p = RunInput()
        p.equation, p.viscous = 0, 1
        p.LES, p.SGS_model, p.C_s, p.filter_ratio = 1, 0, 0.1, 2.0
        p.wall_model = 1
        p.order = 2
        p.ic_form = 1
        p.adv_type = 3
        p.riemann_solve_type = 0
        p.dt_type, p.dt, p.n_steps = 0, 1e-5, 0
        p.vcjh_scheme_quad = 1
        p.dx_cyclic = 4.0
        p.gamma, p.R_gas, p.fix_vis = 1.4, 286.9, 1
        p.Mach_free_stream, p.T_free_stream = 0.2, 300.0
        p.rho_free_stream = 1.17723946
        p.mu_gas = 1.827e-5
        p.Mach_c_ic, p.T_c_ic, p.rho_c_ic = 0.2, 300.0, 1.17723946
        p.setup_params()
        p.bc_list = [BCParams(name="Cyc", flag=CYCLIC),
                     BCParams(name="unused", flag=CYCLIC),
                     BCParams(name="Wall", flag=ISOTHERM_WALL,
                              T_static=1.0, use_wm=1)]
        return p

    def make_mesh():
        mesh = channel_quad_mesh(8, 4, 0.0, 4.0, 0.0, 1.0,
                                 bc_x="Cyc", bc_X="Cyc", bc_y="Wall")
        mesh.bc_id[mesh.bc_id == 1] = 0
        return mesh

    s1 = Solver(make_input(), make_mesh(), dtype=jnp.float64)
    s1.run(10, dt=1e-5)

    s8 = ShardedSolver(make_input(), make_mesh(), dtype=jnp.float64)
    assert s8.has_wm
    s8.run(10, dt=1e-5)
    np.testing.assert_allclose(s8.gather_u(), np.asarray(s1.u),
                               rtol=0, atol=1e-12)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("inlet_type", [1, 2])
def test_sharded_turbulent_inlet_matches_single(inlet_type):
    """White-noise / SEM turbulent inlet sharded == single device: the
    eddy state is replicated, plane reductions go through psum, and the
    fluctuations land on the owning shard's faces (VERDICT r1 item 3)."""
    from hifiles_tpu.mesh.generate import channel_quad_mesh
    from tests.test_turb_inlet import les_channel_input

    mesh1 = channel_quad_mesh(8, 4, 0.0, 2.0, 0.0, 1.0)
    s1 = Solver(les_channel_input(inlet_type=inlet_type), mesh1,
                dtype=jnp.float64)
    assert s1.turb_inlet is not None
    s1.run(10, dt=1e-5)

    mesh8 = channel_quad_mesh(8, 4, 0.0, 2.0, 0.0, 1.0)
    s8 = ShardedSolver(les_channel_input(inlet_type=inlet_type), mesh8,
                       dtype=jnp.float64)
    assert s8._ti_core is not None
    s8.run(10, dt=1e-5)
    np.testing.assert_allclose(s8.gather_u(), np.asarray(s1.u),
                               rtol=0, atol=1e-12)
    # identical eddy state trajectories (replicated update)
    for a, b in zip(s8._ti_state[:2], s1._ti_state[:2]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-12)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_local_dt_with_sem_inlet_matches_single():
    """Local time stepping + SEM turbulent inlet, sharded == single device
    (round-3 closure of the former NotImplementedError): eddies convect
    with the pmin-global step, per-element dt applies to the RK update
    (ref:src/solver.cpp:484-549 local dt + :111-118 inlet update)."""
    from hifiles_tpu.mesh.generate import channel_quad_mesh
    from tests.test_turb_inlet import les_channel_input

    def make_input():
        p = les_channel_input(inlet_type=2)
        p.dt_type = 2          # local CFL dt
        p.CFL = 0.05
        return p

    s1 = Solver(make_input(), channel_quad_mesh(8, 4, 0.0, 2.0, 0.0, 1.0),
                dtype=jnp.float64)
    assert s1.turb_inlet is not None
    dt1 = s1.compute_dt()
    assert getattr(dt1, "ndim", 0) == 1       # genuinely local, on device
    s1.run(3, dt=dt1)

    s8 = ShardedSolver(make_input(),
                       channel_quad_mesh(8, 4, 0.0, 2.0, 0.0, 1.0),
                       dtype=jnp.float64)
    assert s8._ti_core is not None
    dt8 = s8.compute_dt()
    s8.run(3, dt=dt8)
    # same local dt per element (gathered) and same state
    np.testing.assert_allclose(s8.gather_u(), np.asarray(s1.u),
                               rtol=0, atol=1e-12)
