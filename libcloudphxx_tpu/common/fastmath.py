"""Pallas-lowerable replacements for transcendental jnp ops.

`jnp.cbrt` has no Mosaic (Pallas TPU) lowering (general `x ** y` does as of
JAX 0.9, but routing both through exp/log keeps the hot condensation kernel
uniform); the kernel (ops/pallas_cond.py) uses these for positive-argument
cube roots and powers.  Accuracy: the exp/log composition costs ~|log x|
ulps, which end-to-end through the 32-iteration f32 root find shows up as
~1e-3 relative — still inside the physics tolerances the reference pins
(toms748 quarter-precision gates, reference src/detail/config.hpp:181-205)
and inside the fig_a golden gates (tests/test_golden_parity.py)."""

import jax.numpy as jnp


def cbrt_pos(x):
    """Cube root for x >= 0 (x == 0 maps to 0 via exp(-inf))."""
    return jnp.exp(jnp.log(x) / 3.0)


def pow_pos(x, p):
    """x ** p for x >= 0 (x == 0 maps to 0 for p > 0)."""
    return jnp.exp(jnp.log(x) * p)
