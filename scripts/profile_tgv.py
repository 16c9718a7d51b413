#!/usr/bin/env python3
"""Trace the TGV benchmark step on the TPU and print per-op device-time
buckets (the round-2 method: jax.profiler.trace + parse trace.json.gz;
sub-ms microbenchmarks through the tunnel are NOT reproducible)."""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hifiles_tpu.config.params import RunInput
    from hifiles_tpu.mesh.generate import periodic_hex_mesh
    from hifiles_tpu.solver.solver import Solver
    import bench as bench_mod

    order = int(os.environ.get("BENCH_ORDER", 4))
    n1 = int(os.environ.get("BENCH_MESH", 16))
    cfg_name = os.environ.get("BENCH_CONFIG", "plain")

    if cfg_name in ("mixed", "mixed3d"):
        from hifiles_tpu.mesh.generate import (channel_prism_tet_mesh,
                                               periodic_mixed_mesh_2d)
        from hifiles_tpu.solver.multiblock import MixedSolver
        if cfg_name == "mixed":
            p = bench_mod.mixed_input()
            mesh = periodic_mixed_mesh_2d(96, 96, -10, 10, -10, 10)
        else:
            p = RunInput.from_deck(os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "tests", "decks", "input_prism_tet_wm_bench"))
            mesh = channel_prism_tet_mesh(32, 32, 4, 4,
                                          x1=2.0, y1=1.0, z1=1.0)
        s = MixedSolver(p, mesh, dtype=jnp.float32)
        profile_solver(s, p.dt, cfg_name)
        return

    if cfg_name == "channel":
        from hifiles_tpu.mesh.generate import channel_hex_mesh
        p = RunInput.from_deck(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tests", "decks", "input_channel_les_bench"))
        s = Solver(p, channel_hex_mesh(16, 16, 16), dtype=jnp.float32)
        profile_solver(s, p.dt, cfg_name)
        return

    p = RunInput()
    p.equation = 0
    p.viscous = 1
    p.order = order
    p.ic_form = 7
    p.adv_type = 3
    p.riemann_solve_type = 3
    p.dt_type = 0
    p.n_steps = 10
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
    bench_mod.configure(p, cfg_name)   # BEFORE setup_params: RANS ICs + validation depend on it
    p.setup_params()

    s = Solver(p, periodic_hex_mesh(n1, n1, n1), dtype=jnp.float32)
    profile_solver(s, p.dt, cfg_name)


def profile_solver(s, dt, cfg_name):
    import jax

    s.run(10, dt=dt)            # compile + warm
    jax.block_until_ready(s.u)

    tdir = "/tmp/tgv_trace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        s.run(10, dt=dt)
        jax.block_until_ready(s.u)

    # parse the trace
    paths = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    assert paths, "no trace written"
    with gzip.open(paths[0], "rt") as fh:
        tr = json.load(fh)
    events = [e for e in tr["traceEvents"]
              if e.get("ph") == "X" and "dur" in e]
    # keep device-lane events only (pid named like /device:TPU or XLA Ops)
    pid_name = {}
    for e in tr["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    tid_name = {}
    for e in tr["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")

    per_op = defaultdict(float)
    per_op_n = defaultdict(int)
    total = 0.0
    for e in events:
        tn = tid_name.get((e["pid"], e["tid"]), "")
        pn = pid_name.get(e["pid"], "")
        if "TPU" not in pn and "XLA Ops" not in tn:
            continue
        if "XLA Ops" not in tn:
            continue
        name = e["name"]
        if name.startswith("while"):
            continue                       # the scan wrapper: double-counts
        dur = e["dur"]  # us
        total += dur
        per_op[name] += dur
        per_op_n[name] += 1

    print(f"config={cfg_name} device us over 10 steps (50 stages), "
          f"scan wrapper excluded: {total:.0f} -> {total/50:.1f} us/stage")
    for k, v in sorted(per_op.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {k:55s} {v:9.0f} us x{per_op_n[k]:4d} {100*v/total:5.1f}%")


if __name__ == "__main__":
    main()
