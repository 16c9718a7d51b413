"""Numerics building blocks: quadrature, polynomial bases, FR correction
functions, and the per-element-type operator factory.

Everything in this subpackage is *setup-time* code: plain numpy in float64,
producing small dense operator matrices that the solver closes over as
constants inside jitted step functions.
"""
