"""SoA (elements-minor) residual equivalence: the (U, F, E) fast path must
match the face path to roundoff across configs (residual_soa.py)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import jax.numpy as jnp

from hifiles_tpu.config.params import RunInput
from hifiles_tpu.mesh.generate import (channel_quad_mesh, periodic_hex_mesh,
                                       periodic_tet_mesh)
from hifiles_tpu.solver.residual_soa import make_residual_soa
from hifiles_tpu.solver.solver import Solver

from test_face_path import tgv_input


def soa_of(s, bc=None):
    fn = make_residual_soa(s.block, s.rcfg, s.dtype, bc)
    assert fn is not None
    return fn


def compare(s, fn_soa, u=None):
    u = s.u if u is None else u
    r_ref = np.asarray(s.residual_fn(u))
    u_soa = jnp.transpose(u, (1, 2, 0))               # (E,U,F)->(U,F,E)
    r_soa = np.transpose(np.asarray(fn_soa(u_soa)), (2, 0, 1))
    scale = np.abs(r_ref).max()
    assert np.abs(r_ref - r_soa).max() < 1e-10 * max(scale, 1.0), \
        np.abs(r_ref - r_soa).max()


def test_soa_hex_viscous_hllc():
    p = tgv_input()
    s = Solver(p, periodic_hex_mesh(4, 4, 4))
    compare(s, soa_of(s))


def test_soa_hex_inviscid_rusanov():
    p = tgv_input()
    p.viscous = 0
    p.riemann_solve_type = 0
    p.mu_inf = float("nan")
    s = Solver(p, periodic_hex_mesh(3, 3, 3))
    compare(s, soa_of(s))


def test_soa_tet_viscous_roem():
    p = tgv_input()
    p.riemann_solve_type = 2
    s = Solver(p, periodic_tet_mesh(2, 2, 2))
    compare(s, soa_of(s))


def test_soa_quad_channel_boundaries():
    from hifiles_tpu.solver.bc import make_bc_functions
    from test_turb_inlet import les_channel_input
    p = les_channel_input(inlet_type=0)
    p.LES = 0
    s = Solver(p, channel_quad_mesh(8, 4, 0.0, 2.0, 0.0, 1.0))
    rng = np.random.default_rng(0)
    u = s.u * (1.0 + 0.01 * jnp.asarray(
        rng.random(np.asarray(s.u).shape), s.dtype))
    bc = make_bc_functions(p, s.block, s.rcfg, s.dtype)
    compare(s, soa_of(s, bc), u)


def test_soa_cylinder_tri_sutherland():
    """Quadratic-tri mesh, Sutherland viscosity, isotherm wall + sup BCs."""
    CYL = "/root/reference/testcases/navier-stokes/cylinder"
    if not os.path.isdir(CYL):
        pytest.skip("reference absent")
    from hifiles_tpu.mesh.gambit import read_gambit
    p = RunInput.from_deck(os.path.join(CYL, "input_cylinder_visc"))
    p.shock_cap = 0          # residual-only comparison
    mesh = read_gambit(os.path.join(CYL, "cylinder_2ndorder_tri_vis.neu"))
    s = Solver(p, mesh)
    s.run(2)
    compare(s, soa_of(s, s._bc_fns))


def test_soa_adv_diff():
    p = RunInput()
    p.equation = 1
    p.viscous = 1
    p.order = 2
    p.ic_form = 2
    p.adv_type = 3
    p.riemann_solve_type = 1
    p.wave_speed = [1.0, 0.5, 0.25]
    p.lambda_lf = 1.0
    p.diff_coeff = 0.05
    p.dt_type = 0
    p.dt = 1e-4
    p.n_steps = 0
    p.dx_cyclic = p.dy_cyclic = p.dz_cyclic = 2 * np.pi
    p.setup_params()
    s = Solver(p, periodic_hex_mesh(3, 3, 3))
    compare(s, soa_of(s))


# ----------------------------------------------------------------------
# round-3 feature physics on the SoA fast path
# ----------------------------------------------------------------------

def _perturbed(s, amp=0.02, seed=0):
    rng = np.random.default_rng(seed)
    return s.u * (1.0 + amp * jnp.asarray(
        rng.random(np.asarray(s.u).shape), s.dtype))


@pytest.mark.parametrize("model", [0, 1, 2, 4])
def test_soa_les_sgs_models(model):
    """Eddy-viscosity + similarity SGS fluxes match the slot path."""
    from test_les import tgv_input as les_tgv
    p = les_tgv(les=1, sgs_model=model)
    s = Solver(p, periodic_hex_mesh(3, 3, 3))
    compare(s, soa_of(s), _perturbed(s))


def test_soa_over_int():
    """Polynomial de-aliasing (over-integration) on the SoA path."""
    p = tgv_input()
    p.over_int, p.over_int_order = 1, 4
    s = Solver(p, periodic_hex_mesh(3, 3, 3))
    compare(s, soa_of(s), _perturbed(s))


def test_soa_over_int_inviscid():
    p = tgv_input()
    p.viscous = 0
    p.riemann_solve_type = 0
    p.mu_inf = float("nan")
    p.over_int, p.over_int_order = 1, 4
    s = Solver(p, periodic_hex_mesh(3, 3, 3))
    compare(s, soa_of(s), _perturbed(s))


def test_soa_rans_channel():
    """SA-RANS: advection + diffusion + source on the SoA path."""
    from test_rans_viscous_bc import _rans_channel_input
    from hifiles_tpu.config.params import ADIABAT_WALL, BCParams, CYCLIC
    from hifiles_tpu.mesh.generate import channel_quad_mesh
    p = _rans_channel_input()
    p.bc_list = [BCParams(name="Cyc", flag=CYCLIC),
                 BCParams(name="CycX", flag=CYCLIC),
                 BCParams(name="Wall", flag=ADIABAT_WALL)]
    mesh = channel_quad_mesh(8, 4, 0.0, 4.0, 0.0, 1.0,
                             bc_x="Cyc", bc_X="Cyc", bc_y="Wall")
    mesh.bc_id[mesh.bc_id == 1] = 0
    mesh.bc_names = ["Cyc", "unused", "Wall"]
    s = Solver(p, mesh)
    assert s.residual_soa is not None     # RANS rides the fast path now
    compare(s, s.residual_soa, _perturbed(s))


def test_soa_wall_model():
    """Wall-modeled channel: the SoA path gathers the wall-model input
    state from the (U, F, E) volume solution."""
    from hifiles_tpu.config.params import BCParams, CYCLIC, ISOTHERM_WALL
    from hifiles_tpu.mesh.generate import channel_quad_mesh
    from test_rans_viscous_bc import _rans_channel_input
    p = _rans_channel_input()
    p.RANS = 0
    p.LES, p.SGS_model, p.C_s = 1, 0, 0.1
    p.wall_model = 1
    p.bc_list = [BCParams(name="Cyc", flag=CYCLIC),
                 BCParams(name="unused", flag=CYCLIC),
                 BCParams(name="Wall", flag=ISOTHERM_WALL,
                          T_static=1.0, use_wm=1)]
    mesh = channel_quad_mesh(8, 4, 0.0, 4.0, 0.0, 1.0,
                             bc_x="Cyc", bc_X="Cyc", bc_y="Wall")
    mesh.bc_id[mesh.bc_id == 1] = 0
    mesh.bc_names = ["Cyc", "unused", "Wall"]
    s = Solver(p, mesh)
    assert s.residual_soa is not None
    assert s._bc_fns.wm_tables is not None
    compare(s, s.residual_soa, _perturbed(s))


def _run_pair(p, mesh_fn, n=5):
    """Run the same case with and without the SoA fast path."""
    os.environ["HIFILES_NO_SOA"] = "1"
    try:
        s_ref = Solver(p, mesh_fn())
    finally:
        os.environ.pop("HIFILES_NO_SOA")
    s = Solver(p, mesh_fn())
    assert s.residual_soa is not None
    s_ref.run(n, dt=p.dt)
    s.run(n, dt=p.dt)
    a, b = np.asarray(s_ref.u), np.asarray(s.u)
    assert np.isfinite(b).all()
    scale = max(np.abs(a).max(), 1.0)
    assert np.abs(a - b).max() < 1e-10 * scale, np.abs(a - b).max()


def test_soa_shock_capture_steps():
    """Shock capture (Persson + exp filter) as an SoA post-stage."""
    p = tgv_input()
    p.shock_cap = 1
    p.s0 = 0.0            # filter everywhere: exercises the filtered branch
    _run_pair(p, lambda: periodic_hex_mesh(3, 3, 3))


def test_soa_svv_steps():
    """SVV model: per-step solution filter on the SoA path."""
    from test_les import tgv_input as les_tgv
    p = les_tgv(les=1, sgs_model=3)
    _run_pair(p, lambda: periodic_hex_mesh(3, 3, 3))


def test_soa_rans_f32_high_chi():
    """f32 regression for the SA psi softplus: chi > 4.4 overflowed the
    naive log1p(exp(20*chi)) in f32 (exp(100) = inf -> NaN), which the
    f64 suite never sees.  Seed nu_tilde at the free-stream level (chi=5)
    and require a finite f32 residual."""
    import jax.numpy as jnp
    from test_rans_viscous_bc import _rans_channel_input
    from hifiles_tpu.config.params import ADIABAT_WALL, BCParams, CYCLIC
    from hifiles_tpu.mesh.generate import channel_quad_mesh
    p = _rans_channel_input()
    p.bc_list = [BCParams(name="Cyc", flag=CYCLIC),
                 BCParams(name="CycX", flag=CYCLIC),
                 BCParams(name="Wall", flag=ADIABAT_WALL)]
    mesh = channel_quad_mesh(8, 4, 0.0, 4.0, 0.0, 1.0,
                             bc_x="Cyc", bc_X="Cyc", bc_y="Wall")
    mesh.bc_id[mesh.bc_id == 1] = 0
    mesh.bc_names = ["Cyc", "unused", "Wall"]
    s = Solver(p, mesh, dtype=jnp.float32)
    s.u = s.u.at[..., -1].set(5.0 * p.mu_inf)     # chi ~= 5
    r = np.asarray(s.residual_fn(s.u))
    assert np.isfinite(r).all(), "f32 SA residual not finite"
