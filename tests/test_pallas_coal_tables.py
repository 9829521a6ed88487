"""Tabulated collision-efficiency lookup for the resident Pallas kernel.

The hall-family tables (reference src/detail/kernels.hpp:179-207 + the
collision-efficiency data headers) saturate beyond index 120, so a
(128, 128) clamped block + a row sweep with 128-lane gathers
(coalescence.interpolated_efficiency_sweep) reproduces the XLA path's
2-D-gather bilinear lookup (kernel_interpolation.hpp:9-67) bit-for-bit.
These tests gate that equivalence at the lookup, the pair_and_collide
call, and through an interpret-mode pallas_call.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libcloudphxx_tpu.lgrngn import coalescence as coal_mod
from libcloudphxx_tpu.lgrngn.enums import kernel_t

HALL_FAMILY = [
    kernel_t.hall,
    kernel_t.hall_davis_no_waals,
    kernel_t.hall_pinsky_1000mb_grav,
    kernel_t.hall_pinsky_cumulonimbus,
    kernel_t.hall_pinsky_stratocumulus,
]


def _radii(rng, shape):
    """Radii spanning every table regime: sub-um, the 1-um grid, the
    10-um grid above 100 um, and beyond the clamp (up to r_max)."""
    r_um = 10.0 ** rng.uniform(-1.0, np.log10(1090.0), size=shape)
    return jnp.asarray(r_um * 1e-6, jnp.float32)


@pytest.mark.parametrize("kern", HALL_FAMILY, ids=lambda k: k.name)
def test_sweep_matches_gather_bitwise(kern):
    ct = coal_mod.clamped_efficiency_table(kern)
    assert ct is not None, "hall-family tables must clamp into 128 lanes"
    t128, r_max, clamp = ct
    assert clamp <= 126

    full, r_max2 = coal_mod.load_efficiency_table(kern)
    assert r_max == r_max2

    rng = np.random.default_rng(7)
    rw_a = _radii(rng, (40, 128))
    rw_b = _radii(rng, (40, 128))

    want = coal_mod.interpolated_efficiency(
        jnp.asarray(full, jnp.float32), r_max, rw_a, rw_b)
    got = coal_mod.interpolated_efficiency_sweep(
        clamp, jnp.asarray(t128), r_max, rw_a, rw_b)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_vohl_stays_off_kernel():
    assert coal_mod.clamped_efficiency_table(
        kernel_t.vohl_davis_no_waals) is None


def test_pair_and_collide_same_through_either_lookup():
    """pair_and_collide with the sweep lookup bound (the resident kernel's
    configuration) is bitwise identical to the XLA dense path's."""
    from functools import partial

    from libcloudphxx_tpu import lgrngn
    from libcloudphxx_tpu.lgrngn import dense as dense_mod
    from libcloudphxx_tpu.lgrngn.state import StaticConfig

    oi = lgrngn.opts_init_t()
    oi.dt = 1.0
    oi.n_sd_max = 16 * 64
    oi.kernel = lgrngn.kernel_t.hall
    cfg = StaticConfig.from_opts_init(oi)
    t128, r_max, clamp = coal_mod.clamped_efficiency_table(kernel_t.hall)
    full, _ = coal_mod.load_efficiency_table(kernel_t.hall)

    rng = np.random.default_rng(3)
    rows, cap = 16, 64
    n = jnp.asarray(rng.integers(1, 10**6, (rows, cap)), jnp.float32)
    rw2 = (_radii(rng, (rows, cap)) ** 2).astype(jnp.float32)
    rd3 = jnp.asarray(rng.uniform(1e-21, 1e-18, (rows, cap)), jnp.float32)
    kpa = jnp.full((rows, cap), 0.61, jnp.float32)
    vt = jnp.asarray(rng.uniform(0.0, 5.0, (rows, cap)), jnp.float32)
    count = jnp.sum((n > 0).astype(jnp.float32), axis=1, keepdims=True)
    u01 = jnp.asarray(rng.uniform(0, 1, (rows, cap)), jnp.float32)
    dv = jnp.full((rows, 1), 1.0, jnp.float32)
    rhod = jnp.ones((rows, 1), jnp.float32)
    eta = jnp.full((rows, 1), 1.8e-5, jnp.float32)

    ref = dense_mod.pair_and_collide(
        cfg, jnp.zeros((1,), jnp.float32), (n, rw2, rd3, kpa, vt), count,
        dv, rhod, eta, 0.5, u01,
        eff_table=jnp.asarray(full, jnp.float32), r_max_um=r_max)
    got = dense_mod.pair_and_collide(
        cfg, jnp.zeros((1,), jnp.float32), (n, rw2, rd3, kpa, vt), count,
        dv, rhod, eta, 0.5, u01,
        eff_table=jnp.asarray(t128), r_max_um=r_max,
        eff_fn=partial(coal_mod.interpolated_efficiency_sweep, clamp))
    for a, b in zip(ref[:4], got[:4]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # some collisions must actually have happened for the gate to bite
    assert float(jnp.sum(jnp.abs(ref[0] - n))) > 0


def test_step_resident_table_operand_plumbing():
    """With the table operand present the SD-plane in_specs and in-place
    aliases all shift by one; a coal-off step must be bitwise unchanged by
    the extra operand (catches any index slip in that shift)."""
    import dataclasses
    import sys

    sys.path.insert(0, "tests")
    from test_pallas_step import _setup

    from jax.experimental.pallas import tpu as pltpu
    from libcloudphxx_tpu.lgrngn import hskpng
    from libcloudphxx_tpu.ops.pallas_step import step_resident

    m, cfg, d, th, rv = _setup(False)
    dt = float(m.setup.dt)
    t128, r_max, clamp = coal_mod.clamped_efficiency_table(kernel_t.hall)

    lam_D, lam_K = hskpng.hskpng_mfp(d.T, d.p)
    zc = jnp.zeros_like(d.rhod)
    args = (cfg, int(cfg.sstp_cond), 1, dt, 44.0, False, True, False,
            jnp.int32(0), jnp.zeros((1,), jnp.float32),
            d.n, d.rw2, d.rd3, d.kpa, d.x, d.z,
            th, rv, d.sstp_tmp_th, d.sstp_tmp_rv, d.rhod, d.dv,
            lam_D, lam_K, zc, zc, zc, zc, zc)
    with pltpu.force_tpu_interpret_mode():
        ref = step_resident(*args, do_cond=True, do_adve=False,
                            interpret=True)
        got = step_resident(*args, eff_table=jnp.asarray(t128),
                            r_max_um=float(r_max), eff_clamp=int(clamp),
                            do_cond=True, do_adve=False, interpret=True)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sweep_interpret_mode_pallas():
    """The sweep lowers through a pallas_call (interpret mode on CPU;
    Mosaic on TPU is A/B'd by tools/ab_resident_hall.py)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t128, r_max, clamp = coal_mod.clamped_efficiency_table(kernel_t.hall)
    rng = np.random.default_rng(11)
    rw_a = _radii(rng, (16, 128))
    rw_b = _radii(rng, (16, 128))

    def kern(tbl_ref, a_ref, b_ref, out_ref):
        out_ref[:] = coal_mod.interpolated_efficiency_sweep(
            clamp, tbl_ref[:], r_max, a_ref[:], b_ref[:])

    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )
    got = f(jnp.asarray(t128), rw_a, rw_b)
    full, _ = coal_mod.load_efficiency_table(kernel_t.hall)
    want = coal_mod.interpolated_efficiency(
        jnp.asarray(full, jnp.float32), r_max, rw_a, rw_b)
    # the pallas interpreter contracts the bilinear combine with FMA, so
    # allow 1 ulp here; bit-exactness of the sweep itself is gated by
    # test_sweep_matches_gather_bitwise above
    np.testing.assert_allclose(np.asarray(want), np.asarray(got),
                               rtol=0, atol=1.5e-7)
