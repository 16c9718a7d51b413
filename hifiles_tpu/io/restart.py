"""HDF5 restart files, layout-compatible with the reference
(ref:src/output.cpp:1822-1912 write_restart_hdf5,
ref:src/solver.cpp:436-482 read; per-type info datasets
ref:src/eles_quads.cpp:727-756).

File ``Rest_%09d.h5``: scalar attrs ``nd_time`` (f64) and ``order`` (i32);
dataset ``data`` of shape (n_fields, num_cells_global, n_upts) float64
indexed by *global* cell id (rank-count independent); one dataset per
element type present ("TRIS"/"QUADS"/"TETS"/"PRIS"/"HEXAS") holding the 1-D
solution-point coordinates (tensor types) used for cross-order
re-interpolation on read (opp_r, ref:src/eles.cpp:3692-3710).
"""

from __future__ import annotations

import os

import numpy as np

from .. import HEX, PRISM, QUAD, TET, TRI

TYPE_DSET = {TRI: "TRIS", QUAD: "QUADS", TET: "TETS", PRISM: "PRIS",
             HEX: "HEXAS"}


def restart_filename(directory: str, step: int) -> str:
    return os.path.join(directory, f"Rest_{step:09d}.h5")


def write_restart(path: str, solver, step: int | None = None) -> str:
    """Write the solver state; returns the file path."""
    import h5py

    if step is not None:
        path = restart_filename(path, step)
    u = np.asarray(solver.u, dtype=np.float64)      # (E, U, F)
    E, U, F = u.shape
    icg = solver.mesh.ic2icg
    n_global = int(icg.max()) + 1

    with h5py.File(path, "w") as f:
        f.attrs["nd_time"] = np.float64(solver.time)
        f.attrs["order"] = np.int32(solver.p.order)
        dset = f.create_dataset("data", (F, n_global, U), dtype=np.float64)
        # data[k, global_cell, upt] (ref write_restart_data_hdf5)
        dset[:, icg, :] = u.transpose(2, 0, 1)
        ct = solver.ops.ele_type
        if ct in (QUAD, HEX):
            info = solver.ops.loc_upts[:solver.p.order + 1, 0]
        else:
            info = solver.ops.loc_upts.ravel()
        f.create_dataset(TYPE_DSET[ct], data=np.asarray(info,
                                                        dtype=np.float64))
    return path


def read_restart(path: str, solver) -> float:
    """Load state into the solver (re-interpolating across orders when the
    file's order differs); returns the non-dimensional time."""
    import h5py
    import jax.numpy as jnp

    with h5py.File(path, "r") as f:
        time = float(f.attrs["nd_time"])
        order_rest = int(f.attrs["order"])
        data = f["data"][...]                       # (F, n_global, U_rest)

    icg = solver.mesh.ic2icg
    u = data[:, icg, :].transpose(1, 2, 0)          # (E, U_rest, F)

    if order_rest != solver.p.order:
        # opp_r: old-order nodal basis evaluated at the new solution points
        # (ref:src/eles.cpp:3692-3710)
        ct = solver.ops.ele_type
        if ct in (QUAD, HEX):
            from ..ops.operators import build_tensor_ops
            ops_rest = build_tensor_ops(ct, order_rest,
                                        solver.p.upts_type_quad if ct == QUAD
                                        else solver.p.upts_type_hexa)
        elif ct == TRI:
            from ..ops.operators import build_tri_ops
            ops_rest = build_tri_ops(order_rest, solver.p.upts_type_tri,
                                     solver.p.fpts_type_tri)
        else:
            raise NotImplementedError
        opp_r = ops_rest.interp_to(solver.ops.loc_upts)   # (U_new, U_rest)
        u = np.einsum("vu,euf->evf", opp_r, u)

    solver.u = jnp.asarray(u, dtype=solver.dtype)
    solver.time = time
    return time
