"""Numerical-safety debugging (SURVEY.md §5 race/sanitizer row).

JAX programs are pure (no data races by construction); the practical
sanitizer on TPU is NaN/Inf detection inside jitted programs.
"""

from __future__ import annotations

import jax


def enable_nan_debugging(enable: bool = True) -> None:
    """Make any NaN produced under jit raise immediately (with a de-optimized
    re-run pinpointing the primitive). Heavy — debug runs only."""
    jax.config.update("jax_debug_nans", enable)
