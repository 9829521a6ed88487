"""Tests for the double-moment bulk scheme.

Oracles mirror reference tests/python/unit/api_blk_2m.py plus physical
invariants (water conservation, activation monotonicity, sedimentation
mass closure).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libcloudphxx_tpu import blk_2m

# the bimodal aerosol used in reference api_blk_2m.py:17-20
MODES = (
    blk_2m.lognormal_mode_t(mean_rd=0.04e-6 / 2, sdev_rd=1.4, N_stp=60e6, chem_b=0.55),
    blk_2m.lognormal_mode_t(mean_rd=0.15e-6 / 2, sdev_rd=1.6, N_stp=40e6, chem_b=0.55),
)


def f64(x):
    return jnp.asarray(x, jnp.float64)


def zeros():
    return [f64([0.0]) for _ in range(6)]


def test_rhs_cellwise_evaporation():
    # api_blk_2m.py:23-47: dry cell with cloud water -> evaporation tendencies
    opts = blk_2m.opts_t(dry_distros=MODES)
    dots = zeros()
    out = blk_2m.rhs_cellwise(
        opts, *dots,
        f64([1.0]), f64([300.0]), f64([0.0]), f64([0.01]), f64([1e-3]),
        f64([0.0]), f64([0.0]), 1.0,
    )
    dot_th, dot_rv, dot_rc, dot_nc, dot_rr, dot_nr = out
    assert float(dot_th[0]) != 0
    assert float(dot_rv[0]) > 0   # evaporation adds vapour
    assert float(dot_rc[0]) < 0
    for x in out:
        assert np.isfinite(float(x[0]))
    # vapour source balances condensed-water sink
    assert np.isclose(float(dot_rv[0]), -float(dot_rc[0] + dot_rr[0]), rtol=1e-12)


def test_activation_supersaturated():
    # supersaturated cell with no droplets: activation must create nc and rc
    opts = blk_2m.opts_t(dry_distros=MODES, cond=False, acnv=False, accr=False)
    rhod, th = f64([1.0]), f64([290.0])
    rv = f64([0.02])  # strongly supersaturated at this T
    dots = zeros()
    out = blk_2m.rhs_cellwise(
        opts, *dots, rhod, th, rv, f64([0.0]), f64([0.0]), f64([0.0]), f64([0.0]), 1.0,
    )
    _, _, dot_rc, dot_nc, _, _ = out
    assert float(dot_nc[0]) > 0
    assert float(dot_rc[0]) > 0
    # activated number bounded by total aerosol per kg
    n_tot = sum(m.N_stp for m in MODES) / 1.2248  # rho_stp
    assert float(dot_nc[0]) <= n_tot


def test_activation_capped_by_existing_nc():
    # already-activated droplets reduce the activation source
    opts = blk_2m.opts_t(dry_distros=MODES, cond=False, acnv=False, accr=False)
    rhod, th, rv = f64([1.0]), f64([290.0]), f64([0.02])
    out0 = blk_2m.rhs_cellwise(
        opts, *zeros(), rhod, th, rv, f64([0.0]), f64([0.0]), f64([0.0]), f64([0.0]), 1.0,
    )
    out1 = blk_2m.rhs_cellwise(
        opts, *zeros(), rhod, th, rv, f64([0.0]), f64([5e7]), f64([0.0]), f64([0.0]), 1.0,
    )
    assert float(out1[3][0]) < float(out0[3][0])


def test_autoconversion_and_accretion():
    opts = blk_2m.opts_t(dry_distros=MODES, acti=False, cond=False)
    rhod, th, rv = f64([1.0]), f64([300.0]), f64([5e-3])
    rc, nc = f64([2e-3]), f64([1e8])
    rr, nr = f64([1e-4]), f64([1e6])
    out = blk_2m.rhs_cellwise(
        opts, *zeros(), rhod, th, rv, rc, nc, rr, nr, 1.0,
    )
    _, _, dot_rc, dot_nc, dot_rr, dot_nr = out
    assert float(dot_rc[0]) < 0
    assert float(dot_rr[0]) > 0
    assert float(dot_nc[0]) < 0  # collision sink
    assert float(dot_nr[0]) > 0  # drizzle source
    assert np.isclose(float(dot_rc[0]), -float(dot_rr[0]), rtol=1e-12)
    # KK2000 autoconversion magnitude sanity: A * rc^b * (N/cm3)^c
    acnv = 1350.0 * 2e-3**2.47 * (1e8 * 1e-6) ** -1.79
    assert float(dot_rr[0]) >= acnv * 0.5


def test_rhs_columnwise_no_rain():
    opts = blk_2m.opts_t()
    dot_rr, dot_nr, flux = blk_2m.rhs_columnwise(
        opts, f64([0.0]), f64([0.0]), f64([1.0]), f64([0.0]), f64([0.0]), 1.0, 1.0
    )
    assert float(flux) == 0
    assert float(dot_rr[0]) == 0 and float(dot_nr[0]) == 0


def test_rhs_columnwise_conservation_and_cap():
    opts = blk_2m.opts_t()
    nz = 6
    rhod = jnp.linspace(1.1, 0.9, nz)
    rr = jnp.full((nz,), 1e-3)
    nr = jnp.full((nz,), 1e5)
    dz = 25.0
    dot_rr, dot_nr, flux = blk_2m.rhs_columnwise(
        opts, jnp.zeros(nz), jnp.zeros(nz), rhod, rr, nr, 1.0, dz
    )
    assert float(flux) < 0
    # column mass closure: sum(rhod * dot_rr) telescopes to the surface flux
    assert np.isclose(float(jnp.sum(dot_rr * rhod)), float(flux), rtol=1e-10)
    # cap: no cell may lose more than rr/dt
    assert bool(jnp.all(dot_rr >= -rr / 1.0 - 1e-15))
    assert bool(jnp.all(dot_nr >= -nr / 1.0 - 1e-10))


def test_terminal_velocities_ordering():
    # mass-weighted velocity must exceed number-weighted (bigger drops fall faster)
    rhod = f64([1.0])
    rr, nr = f64([1e-3]), f64([1e5])
    vm = float(blk_2m.formulae.v_term_m(rhod, rr, nr)[0])
    vn = float(blk_2m.formulae.v_term_n(rhod, rr, nr)[0])
    assert vm > vn > 0
    assert vm < 15.0  # physical rain speeds


def test_jit_2d_grid():
    opts = blk_2m.opts_t(dry_distros=MODES)
    shape = (3, 4)
    g = lambda v: jnp.full(shape, v)
    fn = jax.jit(
        lambda *a: blk_2m.rhs_cellwise(opts, *a, 1.0)
    )
    out = fn(
        g(0.0), g(0.0), g(0.0), g(0.0), g(0.0), g(0.0),
        g(1.0), g(295.0), g(0.012), g(1e-3), g(1e8), g(1e-4), g(1e6),
    )
    for x in out:
        assert x.shape == shape
        assert bool(jnp.all(jnp.isfinite(x)))
