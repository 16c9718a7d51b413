"""Mixed-type SoA fast path equivalence: the per-type (U_t, F, E_t) path
(residual_mixed_soa.py) must match the slot mixed residual to roundoff
across configs — tri+quad, prism+tet (cross-type tri faces), boundaries,
LES, over-integration, RANS, wall models."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import jax.numpy as jnp

from hifiles_tpu.config.params import RunInput
from hifiles_tpu.mesh.generate import (channel_prism_tet_mesh,
                                       periodic_mixed_mesh_2d)
from hifiles_tpu.solver.multiblock import MixedSolver

from test_mixed import vortex_input


def compare(s, u=None):
    assert s.residual_soa is not None, "mixed SoA path did not engage"
    u = s.u if u is None else u
    r_ref = s.residual_fn(u)
    u_soa = tuple(jnp.transpose(a, (1, 2, 0)) for a in u)
    r_soa = s.residual_soa(u_soa)
    for a, b in zip(r_ref, r_soa):
        a = np.asarray(a)
        b = np.transpose(np.asarray(b), (2, 0, 1))
        scale = max(np.abs(a).max(), 1.0)
        assert np.abs(a - b).max() < 1e-10 * scale, np.abs(a - b).max()


def _perturbed(s, amp=0.02, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(
        u * (1.0 + amp * jnp.asarray(rng.random(np.asarray(u).shape),
                                     s.dtype)) for u in s.u)


def test_mixed_soa_inviscid_vortex():
    p = vortex_input(order=3)
    s = MixedSolver(p, periodic_mixed_mesh_2d(6, 6, -10, 10, -10, 10))
    compare(s, _perturbed(s))


def test_mixed_soa_viscous_roem():
    p = vortex_input(order=2, viscous=1)
    p.riemann_solve_type = 2
    s = MixedSolver(p, periodic_mixed_mesh_2d(6, 6, -10, 10, -10, 10))
    compare(s, _perturbed(s))


def test_mixed_soa_adv_diff():
    from test_adv_diff import adv_diff_input
    p = adv_diff_input(order=3, diff=0.05)
    s = MixedSolver(p, periodic_mixed_mesh_2d(6, 6, -1, 1, -1, 1))
    compare(s, _perturbed(s))


@pytest.mark.parametrize("model", [0, 4])
def test_mixed_soa_les(model):
    p = vortex_input(order=2, viscous=1)
    p.LES, p.SGS_model = 1, model
    p.C_s, p.filter_ratio, p.filter_type = 0.1, 2.0, 2
    s = MixedSolver(p, periodic_mixed_mesh_2d(6, 6, -10, 10, -10, 10))
    compare(s, _perturbed(s))


def test_mixed_soa_over_int():
    p = vortex_input(order=2, viscous=1)
    p.over_int, p.over_int_order = 1, 4
    s = MixedSolver(p, periodic_mixed_mesh_2d(6, 6, -10, 10, -10, 10))
    compare(s, _perturbed(s))


def test_mixed_soa_wall_model():
    """Wall-modeled tri+quad channel: boundaries + wm input gathers from
    both blocks (the BASELINE #4 feature pairing in 2-D)."""
    from test_mixed_wall_model import _mixed_wall_mesh, _wm_input
    p = _wm_input()
    p.dx_cyclic = 4.0
    s = MixedSolver(p, _mixed_wall_mesh())
    assert s._wm_tables is not None
    compare(s, _perturbed(s))


def test_mixed_soa_rans_channel():
    """SA-RANS on a mixed tri+quad channel: 5-field pipeline + source."""
    from hifiles_tpu.config.params import ADIABAT_WALL, BCParams, CYCLIC
    from test_mixed_wall_model import _mixed_wall_mesh
    from test_rans_viscous_bc import _rans_channel_input
    p = _rans_channel_input()
    p.dx_cyclic = 4.0
    p.bc_list = [BCParams(name="Cyc", flag=CYCLIC),
                 BCParams(name="unused", flag=CYCLIC),
                 BCParams(name="Wall", flag=ADIABAT_WALL)]
    s = MixedSolver(p, _mixed_wall_mesh())
    compare(s, _perturbed(s))


def test_mixed_soa_prism_tet():
    """3-D prism/tet wall-modeled channel (the BASELINE #4 deck):
    per-face-shape pools (tri faces nfp_t, quad faces nfp_q), cross-type
    tri faces, boundaries, Smagorinsky LES and wall models at once."""
    deck = os.path.join(os.path.dirname(__file__), "decks",
                        "input_prism_tet_wm_25")
    p = RunInput.from_deck(deck)
    mesh = channel_prism_tet_mesh(3, 2, 2, 2, x1=2.0, y1=1.0, z1=1.0)
    s = MixedSolver(p, mesh)
    assert s._wm_tables is not None
    compare(s, _perturbed(s))


def test_mixed_soa_steps_shock_capture():
    """Shock capture runs as per-type SoA post-stages in the fused loop."""
    p = vortex_input(order=2, viscous=1)
    p.shock_cap, p.s0 = 1, 0.0
    mesh_fn = lambda: periodic_mixed_mesh_2d(4, 4, -10, 10, -10, 10)
    os.environ["HIFILES_NO_SOA"] = "1"
    try:
        s_ref = MixedSolver(p, mesh_fn())
    finally:
        os.environ.pop("HIFILES_NO_SOA")
    s = MixedSolver(p, mesh_fn())
    assert s.residual_soa is not None
    s_ref.run(5, dt=p.dt)
    s.run(5, dt=p.dt)
    for a, b in zip(s_ref.u, s.u):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(b).all()
        scale = max(np.abs(a).max(), 1.0)
        assert np.abs(a - b).max() < 1e-10 * scale, np.abs(a - b).max()
