"""Run driver: the ``bin/HiFiLES <input_file>`` analog
(ref:src/HiFiLES.cpp:41-343).

Reads a reference-format deck, loads the mesh, builds the solver, and runs
the outer time loop with residual monitoring, history output, ParaView
dumps, restart dumps, and the final analytic-error report.
"""

from __future__ import annotations

import math
import os
import sys
import time


def load_mesh(run_input, deck_dir: str):
    from .mesh.gambit import read_gambit

    path = run_input.mesh_file
    if not os.path.isabs(path):
        path = os.path.join(deck_dir, path)
    if path.endswith(".neu"):
        return read_gambit(path)
    if path.endswith(".msh"):
        from .mesh.gmsh import read_gmsh
        return read_gmsh(path)
    raise ValueError(f"unknown mesh format: {path}")


def main(argv=None):
    import jax.numpy as jnp
    import numpy as np

    from .config.params import RunInput
    from .io.history import HistoryWriter
    from .io.restart import read_restart, restart_filename, write_restart
    from .io.vtu import write_vtu
    from .solver.solver import Solver

    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python -m hifiles_tpu <input_file> [--f64] "
              "[--outdir D] [--devices N]")
        return 1
    deck_path = argv[0]
    f64 = "--f64" in argv
    profile = "--profile" in argv
    outdir = "."
    if "--outdir" in argv:
        outdir = argv[argv.index("--outdir") + 1]
    n_dev = 0
    if "--devices" in argv:
        # the `mpirun -np N bin/HiFiLES` analog: element-sharded solvers
        # over an N-device jax mesh (ref:src/HiFiLES.cpp:62-65)
        n_dev = int(argv[argv.index("--devices") + 1])
    os.makedirs(outdir, exist_ok=True)

    if n_dev:
        # must run before any other jax backend use (see provision_devices)
        from .parallel import provision_devices
        devices = provision_devices(n_dev)

    if f64:
        import jax
        jax.config.update("jax_enable_x64", True)

    t_start = time.time()
    p = RunInput.from_deck(deck_path)
    mesh = load_mesh(p, os.path.dirname(os.path.abspath(deck_path)))
    print(f"mesh: {mesh.n_cells} cells, {mesh.n_verts} vertices, "
          f"boundaries {mesh.bc_names}")

    dtype = jnp.float64 if f64 else jnp.float32
    # pure-PRISM meshes ride the mixed per-face-shape machinery: the
    # single-type SoA paths require uniform per-face fpt counts (prism
    # tri+quad faces are not), so Solver/ShardedSolver would drop to the
    # ~20x slot fallback; the mixed path's per-face-shape pools give
    # prisms a fast path on one device and across devices (round 5;
    # reference MPI likewise handles prism faces per-inters-type,
    # ref:src/mpi_inters.cpp:51-90)
    from . import PRISM
    cts_present = np.unique(mesh.ctype)
    mixed = cts_present.size > 1 or int(cts_present[0]) == PRISM
    if mixed:
        from .solver.multiblock import MixedSolver
        io_solver = MixedSolver(p, mesh, dtype=dtype)
        dof = sum(io_solver.blocks[ct].n_eles
                  * io_solver.blocks[ct].ops.n_upts
                  for ct in io_solver.cts)
        if n_dev:
            from .parallel.mixed_sharding import ShardedMixedSolver
            solver = ShardedMixedSolver(p, mesh, devices=devices,
                                        dtype=dtype)
        else:
            solver = io_solver
    else:
        if n_dev:
            from .parallel.sharding import ShardedSolver
            solver = ShardedSolver(p, mesh, devices=devices, dtype=dtype)
            io_solver = solver.base      # single-device twin for output
        else:
            solver = io_solver = Solver(p, mesh, dtype=dtype)
        dof = io_solver.block.n_eles * io_solver.ops.n_upts
    print(f"solver: order {p.order}, {io_solver.n_fields} fields, "
          f"{dof} DOF/field"
          + (f", {n_dev} devices" if n_dev else ""))

    def sync():
        """Mirror the (sharded) device state into the single-device IO
        twin; all writers/monitors read the gathered global layout, so
        multi-device output files are bit-identical in format to
        single-device ones (ref:src/output.cpp global-index hyperslabs)."""
        if solver is not io_solver:
            u = solver.gather_u()
            if mixed:
                io_solver.u = tuple(jnp.asarray(a, io_solver.dtype)
                                    for a in u)
            else:
                io_solver.u = jnp.asarray(u, io_solver.dtype)
            io_solver.time = solver.time
            if hasattr(solver, "_mdot_old"):
                io_solver._mdot_old = solver._mdot_old
            ua = getattr(solver, "gather_u_avg", lambda: None)()
            if ua is not None:
                # time-averaged fields for the vtu writer
                # (ref:src/eles.cpp:5648-5664)
                io_solver.u_avg = (
                    tuple(jnp.asarray(a, io_solver.dtype) for a in ua)
                    if mixed else jnp.asarray(ua, io_solver.dtype))
        return io_solver

    if p.restart_flag:
        path = restart_filename(outdir, p.restart_iter)
        t = read_restart(path, io_solver)
        print(f"restarted from {path} at t={t}")
        if p.patch:
            # patch applied on restart too (ref:src/solver.cpp:321-482)
            from .solver.ics import apply_patch
            io_solver.u = jnp.asarray(
                apply_patch(p, io_solver.block.pos_upts,
                            np.asarray(io_solver.u, dtype=np.float64)),
                dtype=io_solver.dtype)
        if solver is not io_solver:
            # distribute the restart state onto the device mesh
            solver.scatter_u(io_solver.u if mixed
                             else np.asarray(io_solver.u))
            solver.time = t
        i0 = p.restart_iter
    else:
        i0 = 0

    hist = HistoryWriter(os.path.join(outdir, "history.plt"), io_solver)
    probes = None
    if p.probe:
        from .io.probes import setup_probes
        probes = setup_probes(p, io_solver, outdir)
    events = sorted({p.monitor_res_freq, p.plot_freq, p.restart_dump_freq,
                     getattr(p, "probe_freq", 0) or 0})
    chunk = max(1, min(e for e in events if e > 0))

    if profile:
        # jax profiler trace for the first chunk (the survey's
        # tracing/profiling slot; view with tensorboard or perfetto)
        import jax
        jax.profiler.start_trace(os.path.join(outdir, "jax_trace"))

    i = i0
    while i < i0 + p.n_steps:
        n = min(chunk, i0 + p.n_steps - i)
        if hasattr(solver, "compute_dt"):
            dt = solver.compute_dt()
        else:                     # ShardedMixedSolver: dt from the twin
            dt = sync().compute_dt()
        solver.run(n, dt=dt)
        i += n
        if i % p.monitor_res_freq == 0 or i == i0 + p.n_steps:
            sync()
            row = hist.write(i)
            res = row["residual"]
            # NaN abort (ref:src/output.cpp:2268-2275 HistoryOutput)
            if not np.isfinite(res).all():
                raise FloatingPointError(
                    f"NaN residual at iteration {i}; aborting "
                    f"(ref CheckStopConditions behavior)")
            res_s = " ".join(f"{r:.6e}" for r in res)
            print(f"iter {i:8d}  t={solver.time:.6e}  res: {res_s}")
            if p.forcing:
                # mass-flux history of the body-forced inflow plane
                # (ref:src/eles.cpp:5430-5453 massflux.dat)
                mf = io_solver.inflow_massflux()
                if mf is not None:
                    with open(os.path.join(outdir, "massflux.dat"),
                              "a") as fh:
                        fh.write(f"{i}, {mf[0]:.15g}, {mf[1]:.15g}, "
                                 f"{mf[2]:.15g}\n")
            if p.calc_force:
                from .io.forces import write_force_file
                write_force_file(sync(), outdir, i)
                print(f"         force: "
                      + " ".join(f"{x:.6e}" for x in row["force"]))
        if (p.calc_force and 0 < p.monitor_cp_freq < 2**31 - 1
                and i % p.monitor_cp_freq == 0):
            # cp-distribution dumps at their own cadence
            # (ref:src/HiFiLES.cpp monitor_cp_freq)
            from .io.forces import write_force_file
            write_force_file(sync(), outdir, i)
        if probes is not None and getattr(p, "probe_freq", 0) \
                and i % p.probe_freq == 0:
            probes.append(sync(), i)
        if p.plot_freq and i % p.plot_freq == 0:
            if p.write_type == 1:
                from .io.tecplot import write_tec
                write_tec(sync(), outdir, i)
            elif p.write_type == 2:
                from .io.cgns import write_cgns
                write_cgns(sync(), outdir, i)
            else:
                write_vtu(sync(), outdir, i)
        if profile and i - i0 >= chunk:
            import jax
            jax.profiler.stop_trace()
            profile = False
            print(f"profiler trace written to {outdir}/jax_trace")
        if p.restart_dump_freq and i % p.restart_dump_freq == 0:
            if p.restart_ascii:
                from .io.restart import write_restart_ascii
                write_restart_ascii(outdir, sync(), step=i)
            else:
                write_restart(outdir, sync(), step=i)
            if getattr(solver, "turb_inlet", None) is not None \
                    and solver.turb_inlet.inlet_type == 2:
                from .io.restart import write_sem_restart
                write_sem_restart(outdir, i, solver.turb_inlet,
                                  solver._ti_state, p)

    if p.test_case:
        err = sync().compute_error()
        norm = np.sqrt(err) if p.error_norm_type == 2 else err
        row = list(norm[0])
        if p.viscous:
            # gradient-error row appended like the reference
            # (ref:src/output.cpp:2144-2157)
            row += list(norm[1])
        print("final error vs analytic:", " ".join(f"{e:.10e}" for e in row))
        with open(os.path.join(outdir, "error.dat"), "a") as f:
            f.write(" ".join(f"{e:.10e}" for e in row) + "\n")

    print(f"total wall time {time.time() - t_start:.1f}s")
    return 0
