"""NaN/Inf sweeps gated by LIBCLOUD_DEBUG (reference src/detail/checknan.hpp).

The reference wraps every phase in `nancheck(vec, "msg")` transform_reduce
asserts under THRUST_DEBUG.  Here the sweep is a host-side check over the
state pytree after each phase — off by default (zero cost), enabled with
LIBCLOUD_DEBUG=1.
"""

import os

import numpy as np

DEBUG_ENV = "LIBCLOUD_DEBUG"

# the per-SD / per-cell arrays the reference nanchecks around the step
# phases (particles_step.ipp:114-128: th, rv, courants; coal.ipp:453-456:
# rw2, rd3, vt; cond: rw2, th, rv)
_CHECKED = ("th", "rv", "rhod", "rw2", "rd3", "n", "x", "y", "z", "vt",
            "T", "p", "RH")


def enabled() -> bool:
    return os.environ.get(DEBUG_ENV, "0") not in ("0", "")


def nancheck(arr, msg: str):
    """Raise if ``arr`` holds NaN/Inf (checknan.hpp semantics: named blast
    radius instead of downstream garbage)."""
    a = np.asarray(arr)
    if a.size and not np.isfinite(a).all():
        bad = int((~np.isfinite(a)).sum())
        raise FloatingPointError(
            f"libcloudphxx debug: {bad} non-finite value(s) in {msg}"
        )


def nancheck_state(state, phase: str):
    """Sweep the step-relevant state arrays after ``phase`` (only call when
    enabled() — the sweep synchronises the device)."""
    for name in _CHECKED:
        arr = getattr(state, name, None)
        if arr is None or getattr(arr, "size", 0) == 0:
            continue
        nancheck(arr, f"{name} after {phase}")
