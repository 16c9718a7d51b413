"""PDE systems ("model families"): compressible Euler/Navier-Stokes,
advection-diffusion, and RANS-SA.  Each model provides vectorized flux
evaluations over arrays shaped (..., n_fields)."""

from .euler import (cons_to_prim, inviscid_flux, max_wavespeed, pressure,
                    prim_to_cons)
from .viscous import viscous_flux

__all__ = ["cons_to_prim", "inviscid_flux", "max_wavespeed", "pressure",
           "prim_to_cons", "viscous_flux"]
