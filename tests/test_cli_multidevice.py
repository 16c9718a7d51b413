"""Multi-device CLI: ``python -m hifiles_tpu <deck> --devices N`` engages
the sharded solvers and writes outputs (history, restart, error.dat) from
the gathered sharded state — identical to the single-device run
(ref:src/HiFiLES.cpp:41-343, the mpirun entry point).
"""

import os

import numpy as np

from hifiles_tpu.driver import main

DECKS = os.path.join(os.path.dirname(__file__), "decks")


def _short_deck(tmp_path, name, n_steps=20, extra=()):
    """Copy the shipped vortex-parity deck with a shortened run and a
    generated copy of its 16x16 periodic quad mesh."""
    from hifiles_tpu.mesh.gambit import write_gambit
    from hifiles_tpu.mesh.generate import periodic_quad_mesh

    mesh_path = str(tmp_path / "quad16.neu")
    if not os.path.exists(mesh_path):
        write_gambit(periodic_quad_mesh(16, 16, -5, 5, -5, 5), mesh_path)
    src = os.path.join(DECKS, "input_vortex_parity")
    lines = []
    for ln in open(src):
        key = ln.split()[0] if ln.split() else ""
        if key == "n_steps":
            ln = f"n_steps {n_steps}\n"
        elif key == "monitor_res_freq":
            ln = "monitor_res_freq 10\n"
        elif key == "restart_dump_freq":
            ln = f"restart_dump_freq {n_steps}\n"
        elif key == "mesh_file":
            ln = f"mesh_file {mesh_path}\n"
        lines.append(ln)
    lines += [ln + "\n" for ln in extra]
    path = tmp_path / name
    path.write_text("".join(lines))
    return str(path)


def test_cli_devices_matches_single(tmp_path):
    deck = _short_deck(tmp_path, "deck")
    out1 = str(tmp_path / "run1")
    out8 = str(tmp_path / "run8")
    assert main([deck, "--f64", "--outdir", out1]) == 0
    assert main([deck, "--f64", "--outdir", out8, "--devices", "8"]) == 0

    # final analytic error row identical (the reference's error.dat)
    e1 = np.loadtxt(os.path.join(out1, "error.dat"))
    e8 = np.loadtxt(os.path.join(out8, "error.dat"))
    np.testing.assert_allclose(e8, e1, rtol=1e-9, atol=1e-14)

    # history residual columns identical
    h1 = np.loadtxt(os.path.join(out1, "history.plt"), skiprows=2)
    h8 = np.loadtxt(os.path.join(out8, "history.plt"), skiprows=2)
    nF = 4
    np.testing.assert_allclose(h8[:, 1:1 + nF], h1[:, 1:1 + nF],
                               rtol=1e-8, atol=1e-13)

    # restart dumps carry the same global solution
    import h5py
    f1 = h5py.File(os.path.join(out1, "Rest_000000020.h5"), "r")
    f8 = h5py.File(os.path.join(out8, "Rest_000000020.h5"), "r")
    for k in f1:
        if isinstance(f1[k], h5py.Dataset) and f1[k].dtype.kind == "f":
            np.testing.assert_allclose(np.asarray(f8[k]),
                                       np.asarray(f1[k]),
                                       rtol=1e-11, atol=1e-14)
    f1.close(), f8.close()


def test_sharded_probe_owner_slot_sampling():
    """ProbeSet on a ShardedSolver pulls only the owned probe elements
    off the device mesh (no full gather per sample) and matches the
    single-device sample."""
    import jax
    import jax.numpy as jnp
    from hifiles_tpu.io.probes import ProbeSet
    from hifiles_tpu.mesh.generate import periodic_quad_mesh
    from hifiles_tpu.parallel.sharding import ShardedSolver
    from hifiles_tpu.solver.solver import Solver
    from test_io_extras import vortex_input

    p = vortex_input()
    mesh = periodic_quad_mesh(8, 8, -10, 10, -10, 10)
    pts = np.array([[0.0, 0.0], [3.3, -2.1], [-7.7, 8.8]])
    s1 = Solver(p, mesh, dtype=jnp.float64)
    ss = ShardedSolver(p, mesh, devices=jax.devices()[:8],
                       dtype=jnp.float64)
    s1.run(3, dt=p.dt)
    ss.run(3, dt=p.dt)
    ps1 = ProbeSet(s1, pts, ["rho", "u", "pressure"])
    ps8 = ProbeSet(ss, pts, ["rho", "u", "pressure"])
    assert ps8._owner_slots is not None
    np.testing.assert_allclose(ps8.sample(), ps1.sample(),
                               rtol=1e-11, atol=1e-14)


def test_cli_devices_restart_roundtrip(tmp_path):
    """Restart a --devices run from a --devices dump: the state scatters
    back onto the device mesh and continues."""
    deck = _short_deck(tmp_path, "deck_a")
    out = str(tmp_path / "run")
    assert main([deck, "--f64", "--outdir", out, "--devices", "8"]) == 0
    deck2 = _short_deck(tmp_path, "deck_b", n_steps=10,
                        extra=("restart_flag 1", "restart_iter 20",
                               "n_restart_files 1"))
    assert main([deck2, "--f64", "--outdir", out, "--devices", "8"]) == 0
    err = np.loadtxt(os.path.join(out, "error.dat"))
    assert err.ndim == 2 and np.isfinite(err).all()
