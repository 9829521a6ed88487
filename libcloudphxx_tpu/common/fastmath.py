"""Pallas-lowerable replacements for transcendental jnp ops.

`jnp.cbrt` and general `x ** y` have no Mosaic (Pallas TPU) lowering; the
hot condensation kernel (ops/pallas_cond.py) therefore routes positive-
argument cube roots and powers through exp/log, which lower natively.
Accuracy: ~1-2 ulp vs the libm implementations — far inside every physics
tolerance the reference pins (e.g. toms748 quarter-precision gates,
reference src/detail/config.hpp:181-205)."""

import jax.numpy as jnp


def cbrt_pos(x):
    """Cube root for x >= 0 (x == 0 maps to 0 via exp(-inf))."""
    return jnp.exp(jnp.log(x) / 3.0)


def pow_pos(x, p):
    """x ** p for x >= 0 (x == 0 maps to 0 for p > 0)."""
    return jnp.exp(jnp.log(x) * p)
