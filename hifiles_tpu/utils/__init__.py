import os
import sys

from .cache import enable_persistent_cache

__all__ = ["enable_persistent_cache", "log_residual_path"]


def log_residual_path(solver_name: str, path: str) -> None:
    """One-line notice of which residual path engaged (SoA fast path vs
    slot fallback).  A silent SoaTables bail costs up to 20x at runtime
    (docs/PERF.md), so path selection is always loud; silence with
    HIFILES_QUIET=1."""
    if os.environ.get("HIFILES_QUIET"):
        return
    print(f"hifiles_tpu: {solver_name} residual path = {path}",
          file=sys.stderr)
