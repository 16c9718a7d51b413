"""End-to-end driver run on a mixed tri+quad Gmsh mesh: the `python -m
hifiles_tpu <deck>` path dispatches to MixedSolver, writes history and
ParaView output (ref:src/HiFiLES.cpp:41-343 driver loop)."""

import os

import numpy as np
import pytest

from hifiles_tpu.mesh.generate import periodic_mixed_mesh_2d


def write_gmsh22(mesh, bc_name, path):
    """Emit a Gmsh 2.2 file for a 2-D mesh whose boundary faces all belong
    to one named group."""
    from hifiles_tpu.mesh.core import NUM_F_PER_C, corner_vlist_face
    lines = ["$MeshFormat", "2.2 0 8", "$EndMeshFormat",
             "$PhysicalNames", "2",
             f'1 1 "{bc_name}"', '2 2 "FLUID"', "$EndPhysicalNames",
             "$Nodes", str(mesh.n_verts)]
    for i, (x, y) in enumerate(mesh.xv, 1):
        lines.append(f"{i} {float(x)!r} {float(y)!r} 0")
    lines += ["$EndNodes", "$Elements"]
    elems = []
    eid = 1
    # boundary line elements
    for c in range(mesh.n_cells):
        ct = int(mesh.ctype[c])
        for k in range(NUM_F_PER_C[ct]):
            if mesh.bc_id[c, k] < 0:
                continue
            vl = corner_vlist_face(ct, int(mesh.c2n_v[c]), k)
            v = mesh.c2v[c, vl] + 1
            elems.append(f"{eid} 1 2 1 1 {v[0]} {v[1]}")
            eid += 1
    # volume elements: gmsh type 2 = tri, 3 = quad (gmsh corner order
    # 0,1,3,2 vs our tensor bl,br,tl,tr)
    for c in range(mesh.n_cells):
        if int(mesh.ctype[c]) == 0:       # TRI
            v = mesh.c2v[c, :3] + 1
            elems.append(f"{eid} 2 2 2 1 {v[0]} {v[1]} {v[2]}")
        else:                             # QUAD
            v = mesh.c2v[c, :4] + 1
            elems.append(f"{eid} 3 2 2 1 {v[0]} {v[1]} {v[3]} {v[2]}")
        eid += 1
    lines += [str(len(elems))] + elems + ["$EndElements"]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_driver_runs_mixed_gmsh(tmp_path, capsys):
    mesh = periodic_mixed_mesh_2d(4, 4, -10.0, 10.0, -10.0, 10.0)
    write_gmsh22(mesh, "Cyclic", tmp_path / "box.msh")
    deck = tmp_path / "run.deck"
    deck.write_text("""
equation 0
viscous 0
order 2
ic_form 0
test_case 1
n_steps 20
adv_type 3
riemann_solve_type 0
dt_type 0
dt 5e-4
u_c_ic 0.0
v_c_ic 0.0
w_c_ic 0.0
rho_c_ic 1.0
p_c_ic 17.857142857142858
Mach_free_stream 0.3
plot_freq 20
restart_dump_freq 0
monitor_res_freq 10
mesh_file box.msh
mesh_format 1
dx_cyclic 20.0
dy_cyclic 20.0
bc_Cyclic_type Cyclic
""")
    from hifiles_tpu.driver import main
    rc = main([str(deck), "--f64", "--outdir", str(tmp_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "final error" in out
    hist = (tmp_path / "history.plt").read_text().splitlines()
    assert len(hist) >= 4            # header x2 + 2 monitor rows
    assert (tmp_path / "Mesh_000000020.pvtu").exists()
    assert "error.dat" in os.listdir(tmp_path)
