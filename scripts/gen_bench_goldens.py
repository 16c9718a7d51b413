#!/usr/bin/env python3
"""Regenerate the f32 CPU golden residual rows for bench.py's accuracy
gates (one per BENCH_CONFIG).  Protocol matches bench.py exactly: TGV p=4
hex 16^3, f32, 10 warmup + 10 timed steps, L1 residual row after step 20.

Run on CPU:  JAX_PLATFORMS=cpu python scripts/gen_bench_goldens.py [cfg ...]
Paste the printed rows into bench.py GOLDENS.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the axon sitecustomize initializes the TPU backend at interpreter start;
# JAX_PLATFORMS=cpu in the environment does NOT override it — force CPU
# the way tests/conftest.py does
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.extend.backend.clear_backends()
except Exception:
    pass
assert jax.default_backend() == "cpu", jax.default_backend()


def golden_row(cfg_name):
    import jax.numpy as jnp
    import numpy as np

    import bench
    from hifiles_tpu.config.params import RunInput
    from hifiles_tpu.mesh.generate import periodic_hex_mesh
    from hifiles_tpu.solver.solver import Solver

    p = RunInput()
    p.equation = 0
    p.viscous = 1
    p.order = 4
    p.ic_form = 7
    p.adv_type = 3
    p.riemann_solve_type = 3
    p.dt_type = 0
    p.n_steps = 20
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
    bench.configure(p, cfg_name)   # BEFORE setup_params: RANS ICs + validation depend on it
    p.setup_params()

    s = Solver(p, periodic_hex_mesh(16, 16, 16), dtype=jnp.float32)
    if cfg_name == "rans":
        # the TGV IC leaves nu_tilde 0 (matching the reference's set_ics);
        # seed it at the free-stream level so the SA production/diffusion/
        # destruction terms are live and the gate covers them
        s.u = s.u.at[..., -1].set(p.mu_tilde_inf)
    s.run(10, dt=p.dt)
    s.run(10, dt=p.dt)
    n_gate = 6 if cfg_name == "rans" else 5
    return [float(x)
            for x in np.asarray(s.residual_norm(norm_type=1))[:n_gate]]


def golden_row_mixed():
    """Mixed tri+quad flagship (bench.run_mixed protocol): 96x96 box,
    p=4 viscous vortex, f32, 10+10 steps, combined L1 residual row."""
    import jax.numpy as jnp
    import numpy as np

    import bench
    from hifiles_tpu.mesh.generate import periodic_mixed_mesh_2d
    from hifiles_tpu.solver.multiblock import MixedSolver

    p = bench.mixed_input()
    s = MixedSolver(p, periodic_mixed_mesh_2d(96, 96, -10, 10, -10, 10),
                    dtype=jnp.float32)
    s.run(10, dt=p.dt)
    s.run(10, dt=p.dt)
    return [float(x) for x in np.asarray(s.residual_norm(norm_type=1))]


def golden_row_mixed3d():
    """3-D prism/tet wall-modeled channel (bench.run_mixed3d protocol):
    f32, 10+10 steps, combined L1 residual row."""
    import jax.numpy as jnp
    import numpy as np

    from hifiles_tpu.config.params import RunInput
    from hifiles_tpu.mesh.generate import channel_prism_tet_mesh
    from hifiles_tpu.solver.multiblock import MixedSolver

    deck = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "decks",
        "input_prism_tet_wm_bench")
    p = RunInput.from_deck(deck)
    mesh = channel_prism_tet_mesh(32, 32, 4, 4, x1=2.0, y1=1.0, z1=1.0)
    s = MixedSolver(p, mesh, dtype=jnp.float32)
    s.run(10, dt=p.dt)
    s.run(10, dt=p.dt)
    return [float(x) for x in np.asarray(s.residual_norm(norm_type=1))]


def golden_row_channel():
    """Body-forced plane-channel LES (bench.run_channel protocol): f32,
    10+10 steps, L1 residual row."""
    import jax.numpy as jnp
    import numpy as np

    from hifiles_tpu.config.params import RunInput
    from hifiles_tpu.mesh.generate import channel_hex_mesh
    from hifiles_tpu.solver.solver import Solver

    deck = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "decks",
        "input_channel_les_bench")
    p = RunInput.from_deck(deck)
    s = Solver(p, channel_hex_mesh(16, 16, 16), dtype=jnp.float32)
    assert s.run_path == "SoA featured (fast)", s.run_path
    s.run(10, dt=p.dt)
    s.run(10, dt=p.dt)
    return [float(x) for x in np.asarray(s.residual_norm(norm_type=1))[:5]]


if __name__ == "__main__":
    cfgs = sys.argv[1:] or ["overint", "smag", "shock"]
    for c in cfgs:
        row = (golden_row_mixed() if c == "mixed" else
               golden_row_mixed3d() if c == "mixed3d" else
               golden_row_channel() if c == "channel" else golden_row(c))
        print(json.dumps({c: row}))
