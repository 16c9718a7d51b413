"""Gambit .neu reader tests against the reference testcase meshes."""

import os

import numpy as np
import pytest

from hifiles_tpu import HEX, TRI
from hifiles_tpu.config.params import CYCLIC
from hifiles_tpu.mesh.core import build_faces
from hifiles_tpu.mesh.gambit import read_gambit

REF_TC = "/root/reference/testcases"
TGV_MESH = f"{REF_TC}/navier-stokes/Taylor_Green_vortex/Taylor-Green-Vortex-hex.neu"
CYL_MESH = f"{REF_TC}/euler/cylinder/cylinder_2ndorder_tri_vis.neu"


@pytest.mark.skipif(not os.path.exists(TGV_MESH), reason="reference absent")
def test_tgv_hex_mesh_reads_and_pairs():
    mesh = read_gambit(TGV_MESH)
    assert mesh.n_dims == 3
    assert np.all(mesh.ctype == HEX)
    assert mesh.n_cells == 15**3
    assert mesh.bc_names == ["Cyclic"]
    # domain is [0, 2*pi]^3
    assert abs(mesh.xv.min()) < 1e-6
    assert abs(mesh.xv.max() - 2 * np.pi) < 1e-6
    conn = build_faces(mesh, {0: CYCLIC},
                       delta_cyclic=np.array([2 * np.pi] * 3))
    # fully periodic: all faces interior after pairing
    assert conn.bdy_ele.size == 0
    assert conn.int_ele_l.size == 3 * 15**3


@pytest.mark.skipif(not os.path.exists(CYL_MESH), reason="reference absent")
def test_cylinder_tri_mesh_reads():
    mesh = read_gambit(CYL_MESH)
    assert mesh.n_dims == 2
    assert np.all(mesh.ctype == TRI)
    assert np.all(mesh.c2n_v == 6)      # quadratic tris
    # the fork's euler cylinder mesh names its groups Char (two sections)
    # and Slip_Wall
    assert set(mesh.bc_names) == {"Char", "Slip_Wall"}
    conn = build_faces(mesh, {})
    # Euler formula sanity: every tri has 3 faces, each interior face shared
    assert 3 * mesh.n_cells == 2 * conn.int_ele_l.size + conn.bdy_ele.size
    assert conn.bdy_ele.size > 0
