"""Pallas dense-coalescence kernel: sort network + physics invariants.

The kernel's collision math is pair_and_collide — the same function the
XLA path uses (gated equivalence there) — so these tests cover the parts
unique to the kernel: the bitonic lane sort, and conservation through the
full in-kernel substep loop (interpret mode; the on-core PRNG stream
differs from jax.random by construction, so gates are invariants, not
bitwise equality)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from libcloudphxx_tpu.ops.pallas_coal import bitonic_sort_rows


def test_bitonic_sort_matches_jnp_sort():
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.random((37, 128)), jnp.float32)
    vals = tuple(jnp.asarray(rng.random((37, 128)), jnp.float32)
                 for _ in range(3))
    skey, svals = bitonic_sort_rows(key, vals)
    ref = jnp.sort(key, axis=1)
    np.testing.assert_array_equal(np.asarray(skey), np.asarray(ref))
    # values ride with their keys: re-derive the permutation and check
    order = np.argsort(np.asarray(key), axis=1, kind="stable")
    for v, sv in zip(vals, svals):
        np.testing.assert_array_equal(
            np.take_along_axis(np.asarray(v), order, axis=1),
            np.asarray(sv))


def _box_dense(n_cell=8, cap=128, seed=3):
    """A toy dense population for conservation checks."""
    rng = np.random.default_rng(seed)
    n = np.where(rng.random((n_cell, cap)) < 0.75,
                 np.floor(rng.uniform(1e6, 5e7, (n_cell, cap))), 0.0)
    rw = rng.uniform(10e-6, 40e-6, (n_cell, cap))
    rw2 = np.where(n > 0, rw**2, 0.0)
    rd3 = np.where(n > 0, (0.1e-6)**3, 0.0)
    kpa = np.where(n > 0, 0.61, 0.0)
    return n, rw2, rd3, kpa


def test_kernel_loop_conserves_mass_and_reduces_count():
    from libcloudphxx_tpu.lgrngn.state import StaticConfig
    from libcloudphxx_tpu.lgrngn.enums import kernel_t, vt_t, as_t
    from libcloudphxx_tpu.lgrngn.enums import RH_formula_t
    from libcloudphxx_tpu.ops.pallas_coal import coal_pallas
    from libcloudphxx_tpu import lgrngn

    oi = lgrngn.opts_init_t()
    oi.dt = 10.0
    oi.n_sd_max = 8 * 128
    oi.kernel = lgrngn.kernel_t.golovin
    oi.terminal_velocity = lgrngn.vt_t.beard77
    cfg = StaticConfig.from_opts_init(oi)

    n, rw2, rd3, kpa = _box_dense()
    shape = n.shape
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    onec = jnp.ones(shape[0], jnp.float32)   # cell vectors, (n_cell,)
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        outs = coal_pallas(
            cfg, 4, 2.5, 7, jnp.asarray([1500.0], jnp.float32),
            f32(n), f32(rw2), f32(rd3), f32(kpa), f32(n * 0), f32(n * 0),
            onec * 285.0, onec * 90000.0, onec * 1.1, onec * 1.8e-5, onec,
            interpret=False)
    n2, rw2_2, rd3_2, kpa2, vt2 = (np.float64(np.asarray(o))
                                   for o in outs[:5])

    mass0 = (n * rw2 ** 1.5).sum()
    mass1 = (n2 * rw2_2 ** 1.5).sum()
    assert mass1 == pytest.approx(mass0, rel=2e-5)   # f32 accumulation
    dry0 = (n * rd3).sum()
    dry1 = (n2 * rd3_2).sum()
    assert dry1 == pytest.approx(dry0, rel=2e-5)
    # collisions occurred and only ever reduce the droplet count
    cnt0 = n.sum()
    cnt1 = n2.sum()
    assert cnt1 < cnt0
    assert (n2 >= 0).all()
    # vt refreshed for alive slots
    assert (vt2[n2 > 0] > 0).all()
