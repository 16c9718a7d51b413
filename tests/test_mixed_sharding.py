"""Sharded mixed-type meshes: per-type equal partition, local mixed slot
space, ppermute halos (parallel/mixed_sharding.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hifiles_tpu.config.params import RunInput
from hifiles_tpu.mesh.generate import periodic_mixed_mesh_2d
from hifiles_tpu.parallel.mixed_sharding import ShardedMixedSolver
from hifiles_tpu.solver.multiblock import MixedSolver


def vortex_input(viscous=0):
    p = RunInput()
    p.equation = 0
    p.viscous = viscous
    p.order = 2
    p.ic_form = 0
    p.test_case = 1
    p.adv_type = 3
    p.riemann_solve_type = 0
    p.dt_type = 0
    p.dt = 5e-4
    p.mach_free_stream = 0.3
    p.dx_cyclic = 20.0
    p.dy_cyclic = 20.0
    if viscous:
        p.mu_inf = 1e-4
        p.rt_inf = 1.0
        p.c_sth = 0.0
        p.fix_vis = 1
        p.prandtl = 0.72
    return p


@pytest.mark.parametrize("viscous", [0, 1])
def test_sharded_mixed_matches_single(viscous):
    mesh = periodic_mixed_mesh_2d(8, 8, -10, 10, -10, 10)
    s1 = MixedSolver(vortex_input(viscous), mesh, dtype=jnp.float64)
    s1.run(15, dt=5e-4)

    sh = ShardedMixedSolver(vortex_input(viscous), mesh,
                            devices=jax.devices()[:4], dtype=jnp.float64)
    assert sh.run_path.startswith("sharded mixed SoA")
    assert sh.n_halo > 0
    sh.run(15, dt=5e-4)
    for a, b in zip(sh.gather_u(), s1.u):
        np.testing.assert_allclose(a, np.asarray(b), rtol=0, atol=1e-11)


def test_sharded_mixed_indivisible_counts():
    """Per-type counts NOT divisible by the shard count run via padded
    clones (round-3 closure of the former ValueError): 6 quads + 18 tris
    over 4 shards, bitwise-matching the single-device MixedSolver."""
    mesh = periodic_mixed_mesh_2d(5, 3, -10, 10, -10, 10)
    s1 = MixedSolver(vortex_input(1), mesh, dtype=jnp.float64)
    s1.run(10, dt=5e-4)
    sh = ShardedMixedSolver(vortex_input(1), mesh,
                            devices=jax.devices()[:4], dtype=jnp.float64)
    assert sh.run_path.startswith("sharded mixed SoA")
    assert any((sh.sizes_ct[ct].max() != sh.sizes_ct[ct].min())
               for ct in sh.cts)
    sh.run(10, dt=5e-4)
    for a, b in zip(sh.gather_u(), s1.u):
        np.testing.assert_allclose(a, np.asarray(b), rtol=0, atol=1e-11)


def _wall_mesh_and_input(rans=0, wall_model=0, sgs=None):
    from test_mixed_wall_model import _mixed_wall_mesh, _wm_input
    p = _wm_input()
    p.dx_cyclic = 4.0
    if not wall_model:
        p.wall_model = 0
        for b in p.bc_list:
            b.use_wm = 0
    if rans:
        p.RANS, p.LES = 1, 0
    if sgs is not None:
        p.LES, p.SGS_model = 1, sgs
    return _mixed_wall_mesh(), p


def test_sharded_mixed_wall_model_matches_single():
    mesh, p = _wall_mesh_and_input(wall_model=1)
    s1 = MixedSolver(p, mesh, dtype=jnp.float64)
    s1.run(10, dt=p.dt)
    mesh2, p2 = _wall_mesh_and_input(wall_model=1)
    sh = ShardedMixedSolver(p2, mesh2, devices=jax.devices()[:4],
                            dtype=jnp.float64)
    assert sh.run_path.startswith("sharded mixed SoA")
    assert sh.has_wm
    sh.run(10, dt=p2.dt)
    for a, b in zip(sh.gather_u(), s1.u):
        np.testing.assert_allclose(a, np.asarray(b), rtol=0, atol=1e-11)


def test_sharded_mixed_rans_matches_single():
    mesh, p = _wall_mesh_and_input(rans=1)
    s1 = MixedSolver(p, mesh, dtype=jnp.float64)
    s1.run(10, dt=p.dt)
    mesh2, p2 = _wall_mesh_and_input(rans=1)
    sh = ShardedMixedSolver(p2, mesh2, devices=jax.devices()[:4],
                            dtype=jnp.float64)
    assert sh.run_path.startswith("sharded mixed SoA")
    sh.run(10, dt=p2.dt)
    for a, b in zip(sh.gather_u(), s1.u):
        np.testing.assert_allclose(a, np.asarray(b), rtol=0, atol=1e-11)


def test_sharded_mixed_similarity_matches_single():
    """Similarity SGS needs the third (SGS-flux) halo exchange."""
    mesh = periodic_mixed_mesh_2d(8, 8, -10, 10, -10, 10)

    def cfg():
        p = vortex_input(viscous=1)
        p.LES, p.SGS_model, p.C_s = 1, 4, 0.5
        p.filter_type, p.filter_ratio = 2, 2.0
        return p

    s1 = MixedSolver(cfg(), mesh, dtype=jnp.float64)
    s1.run(10, dt=5e-4)
    sh = ShardedMixedSolver(cfg(), mesh, devices=jax.devices()[:4],
                            dtype=jnp.float64)
    assert sh.run_path.startswith("sharded mixed SoA")
    assert sh.n_halo > 0
    sh.run(10, dt=5e-4)
    for a, b in zip(sh.gather_u(), s1.u):
        np.testing.assert_allclose(a, np.asarray(b), rtol=0, atol=1e-11)


def test_sharded_mixed_les_shock_overint_match_single():
    """Sharded mixed mesh with WALE LES, de-aliasing, and shock capture all
    active matches the single-device MixedSolver."""
    mesh = periodic_mixed_mesh_2d(8, 8, -10, 10, -10, 10)

    def cfg():
        p = vortex_input(viscous=1)
        p.order = 3
        p.LES, p.SGS_model, p.C_s = 1, 1, 0.5
        p.filter_type, p.filter_ratio = 2, 2.0
        p.over_int, p.over_int_order = 1, 4
        p.shock_cap, p.shock_det = 1, 0
        p.s0, p.expf_fac, p.expf_order = -6.0, 4.0, 4
        return p

    s1 = MixedSolver(cfg(), mesh, dtype=jnp.float64)
    s1.run(10, dt=5e-4)
    sh = ShardedMixedSolver(cfg(), mesh, devices=jax.devices()[:4],
                            dtype=jnp.float64)
    assert sh.run_path.startswith("sharded mixed SoA")
    sh.run(10, dt=5e-4)
    for a, b in zip(sh.gather_u(), s1.u):
        np.testing.assert_allclose(a, np.asarray(b), rtol=0, atol=1e-11)
