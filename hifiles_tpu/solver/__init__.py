"""Solver orchestration: element blocks, residual assembly, time stepping."""

from .solver import Solver

__all__ = ["Solver"]
