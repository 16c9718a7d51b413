"""hifiles_tpu: a TPU-native high-order flux-reconstruction (FR/VCJH) compressible-flow solver.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of HiFiLES (UF fork):
mixed unstructured meshes (tri/quad/tet/prism/hex), Euler/Navier-Stokes and
advection-diffusion, Rusanov/RoeM/HLLC + LDG numerics, low-storage SSP-RK time
stepping, LES SGS models, wall models, SA-RANS, shock capturing, polynomial
de-aliasing, and parallel restart/visualization/probe I/O.

Architecture (TPU-first, not a port):
  * per-element-type C++ classes  ->  batched tensor contractions over all
    elements of a type at once (one big GEMM per pipeline stage)
  * pointer-aliased face wiring   ->  precomputed gather index tables
  * MPI halo exchange             ->  shard_map + ppermute over the ICI mesh
  * global config object          ->  frozen pytree config

Reference behavior citations use ``ref:`` prefixes and point into the upstream
C++ tree (e.g. ``ref:src/eles.cpp:1080``) so parity can be audited.
"""

__version__ = "0.1.0"

# Element type codes, matching ref:include/global.h:46-55 (CTYPE enum).
TRI = 0
QUAD = 1
TET = 2
PRISM = 3
HEX = 4

CTYPE_NAMES = {TRI: "tri", QUAD: "quad", TET: "tet", PRISM: "prism", HEX: "hex"}
