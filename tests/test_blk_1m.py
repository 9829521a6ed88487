"""Tests for the single-moment bulk scheme.

Oracles mirror the reference's tests/python/unit/api_blk_1m.py and
sat_adj_blk_1m.py (supersaturation-after-adjustment gates), plus
conservation checks natural to the functional API.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libcloudphxx_tpu import blk_1m
from libcloudphxx_tpu.common import const_cp, theta_dry, theta_std

# the four mode combinations exercised by reference sat_adj_blk_1m.py:66-71
MODES = {
    "rk4_thdry": dict(adj_nwtrph=False, th_dry=True, const_p=False),
    "rk4_constp": dict(adj_nwtrph=False, th_dry=False, const_p=True),
    "nr_thdry": dict(adj_nwtrph=True, th_dry=True, const_p=False),
    "nr_constp": dict(adj_nwtrph=True, th_dry=False, const_p=True),
}

# final |supersaturation %| gates (reference sat_adj_blk_1m.py:74-88)
SS_GATES = {
    (True, "rk4_thdry"): 3e-2,
    (True, "rk4_constp"): 3e-2,
    (True, "nr_thdry"): 3.0,
    (True, "nr_constp"): 1.0,
    (False, "rk4_thdry"): 0.5,
    (False, "rk4_constp"): 0.5,
    (False, "nr_thdry"): 0.8,
    (False, "nr_constp"): 5e-3,
}


def f64(x):
    return jnp.asarray(x, jnp.float64)


def supersaturation_pct(T, p, rv):
    return 100.0 * (rv / float(const_cp.r_vs(f64(T), f64(p))) - 1.0)


def _initial_state(init_sup_sat):
    # reference sat_adj_blk_1m.py:21-36
    rhod = f64([1.0])
    th_d = f64([300.0])
    rv = f64([0.02]) if init_sup_sat else f64([0.002])
    rc = f64([0.015])
    rr = f64([0.0])
    T = float(theta_dry.T(th_d[0], rhod[0]))
    p = f64([float(theta_dry.p(rhod[0], rv[0], f64(T)))])
    return rhod, th_d, rv, rc, rr, p


@pytest.mark.parametrize("init_sup_sat", [True, False])
@pytest.mark.parametrize("mode", list(MODES))
def test_sat_adj_supersaturation_gate(mode, init_sup_sat):
    opts = blk_1m.opts_t(**MODES[mode])
    rhod, th_d, rv, rc, rr, p = _initial_state(init_sup_sat)
    if opts.th_dry:
        th = th_d
    else:
        th = f64([float(theta_dry.dry2std(th_d[0], rv[0]))])

    th, rv, rc, rr = blk_1m.adj_cellwise(opts, rhod, p, th, rv, rc, rr, 1.0)

    if opts.th_dry:
        T = float(theta_dry.T(th[0], rhod[0]))
        p_fin = float(theta_dry.p(rhod[0], rv[0], f64(T)))
    else:
        T = float(th[0] * theta_std.exner(p[0]))
        p_fin = float(p[0])
    ss = supersaturation_pct(T, p_fin, float(rv[0]))
    assert abs(ss) < SS_GATES[(init_sup_sat, mode)], (mode, init_sup_sat, ss)
    # water conservation: adjustment only moves mass between rv and rc/rr
    assert np.isclose(float(rv[0] + rc[0] + rr[0]),
                      0.015 + (0.02 if init_sup_sat else 0.002), atol=1e-12)
    assert float(rc[0]) >= 0 and float(rv[0]) >= 0 and float(rr[0]) >= 0


@pytest.mark.parametrize("mode", list(MODES))
def test_sat_adj_changes_state(mode):
    # reference api_blk_1m.py:50-61: subsaturated with cloud water present
    # -> evaporation must change th, rv, rc but not rr
    opts = blk_1m.opts_t(**MODES[mode])
    rhod = f64([1.0])
    p = f64([1e5])
    th = f64([300.0])
    rv = f64([0.0])
    rc = f64([0.01])
    rr = f64([0.0])
    th2, rv2, rc2, rr2 = blk_1m.adj_cellwise(opts, rhod, p, th, rv, rc, rr, 1.0)
    assert float(th2[0]) != 300.0
    assert float(rv2[0]) != 0.0
    assert float(rc2[0]) != 0.01
    assert float(rr2[0]) == 0.0


def test_rhs_cellwise_autoconv_accr():
    # api_blk_1m.py:66-80: rc above threshold must convert
    opts = blk_1m.opts_t(adj_nwtrph=False)
    dot_rc, dot_rr = blk_1m.rhs_cellwise(
        opts, f64([0.0]), f64([0.0]), f64([0.01]), f64([0.0])
    )
    assert float(dot_rc[0]) < 0
    assert float(dot_rr[0]) > 0
    assert np.isclose(float(dot_rc[0] + dot_rr[0]), 0.0)
    # autoconversion rate matches Kessler eq 5a: k*(rc - r_c0)
    assert np.isclose(float(dot_rr[0]), 1e-3 * (0.01 - 5e-4))


def test_rhs_cellwise_revap():
    opts = blk_1m.opts_t(adj_nwtrph=True)
    rhod, p = f64([1.0]), f64([1e5])
    th, rv, rc, rr = f64([300.0]), f64([0.0]), f64([0.01]), f64([0.01])
    dot_th, dot_rv, dot_rc, dot_rr = blk_1m.rhs_cellwise_revap(
        opts, f64([0.0]), f64([0.0]), f64([0.0]), f64([0.0]),
        rhod, p, th, rv, rc, rr, 1.0,
    )
    assert float(dot_th[0]) != 0  # rain evaporated -> latent cooling
    assert float(dot_rv[0]) > 0
    assert float(dot_rc[0]) < 0  # conversion still active
    assert float(dot_rr[0]) != 0


@pytest.mark.parametrize("mode", list(MODES))
def test_rhs_cellwise_ice(mode):
    # api_blk_1m.py:104-118: cold cell with ice must produce tendencies
    opts = blk_1m.opts_t(**MODES[mode])
    rhod, p = f64([1.0]), f64([1e5])
    th, rv, rc, rr = f64([230.0]), f64([0.0]), f64([0.0]), f64([0.0])
    ria, rib = f64([0.1]), f64([0.1])
    zero = f64([0.0])
    out = blk_1m.rhs_cellwise_ice(
        opts, zero, zero, zero, zero, zero, zero,
        rhod, p, th, rv, rc, rr, ria, rib, 1.0,
    )
    dot_th, dot_rv, dot_rc, dot_rr, dot_ria, dot_rib = out
    assert float(dot_ria[0]) != 0
    assert float(dot_rib[0]) != 0
    for x in out:
        assert np.isfinite(float(x[0]))


def test_rhs_columnwise_no_rain_no_flux():
    # api_blk_1m.py:93-99
    opts = blk_1m.opts_t()
    dot_rr, flux = blk_1m.rhs_columnwise(opts, f64([0.0]), f64([1.0]), f64([0.0]), 1.0)
    assert float(flux) == 0
    assert float(dot_rr[0]) == 0


def test_rhs_columnwise_mass_conservation():
    # column-integrated tendency must telescope to the surface flux
    opts = blk_1m.opts_t()
    nz = 8
    rhod = jnp.linspace(1.2, 0.8, nz)
    rr = jnp.full((nz,), 1e-3).at[0].set(2e-3)
    dz = 50.0
    dot_rr, flux = blk_1m.rhs_columnwise(opts, jnp.zeros(nz), rhod, rr, dz)
    # flux is per-volume (kg/m3/s): sum_k dot_rr[k]*rhod[k] telescopes to it
    col_tend = float(jnp.sum(dot_rr * rhod))
    assert flux < 0  # downward outflow
    assert np.isclose(col_tend, float(flux), rtol=1e-10)
    # rain falls: top cell loses, bottom gains from above
    assert float(dot_rr[-1]) <= 0


def test_rhs_columnwise_ice_flux():
    opts = blk_1m.opts_t()
    nz = 4
    rhod = jnp.full((nz,), 1.0)
    ri = jnp.full((nz,), 0.1)
    for ice in (blk_1m.ice_t.iceA, blk_1m.ice_t.iceB):
        dot_ri, flux = blk_1m.rhs_columnwise_ice(
            opts, jnp.zeros(nz), rhod, ri, 1.0, ice
        )
        assert float(flux) != 0
        assert np.isclose(float(jnp.sum(dot_ri * rhod)), float(flux), rtol=1e-10)


def test_sedi_off():
    opts = blk_1m.opts_t(sedi=False)
    dot_rr, flux = blk_1m.rhs_columnwise(
        opts, f64([0.0]), f64([1.0]), f64([1e-3]), 1.0
    )
    assert float(flux) == 0 and float(dot_rr[0]) == 0


def test_invalid_theta_convention():
    opts = blk_1m.opts_t(th_dry=True, const_p=True)
    with pytest.raises(ValueError):
        blk_1m.adj_cellwise(
            opts, f64([1.0]), f64([1e5]), f64([300.0]), f64([0.01]),
            f64([0.0]), f64([0.0]), 1.0,
        )


def test_adj_cellwise_jit_and_2d():
    # the whole adjustment must jit and operate on 2-D grids unchanged
    opts = blk_1m.opts_t()  # NR default
    f = jax.jit(lambda rhod, p, th, rv, rc, rr:
                blk_1m.adj_cellwise(opts, rhod, p, th, rv, rc, rr, 1.0))
    shape = (4, 5)
    rhod = jnp.full(shape, 1.1)
    p = jnp.full(shape, 9e4)
    th = jnp.full(shape, 295.0)
    rv = jnp.full(shape, 0.015)
    rc = jnp.full(shape, 1e-4)
    rr = jnp.zeros(shape)
    th2, rv2, rc2, rr2 = f(rhod, p, th, rv, rc, rr)
    assert th2.shape == shape
    assert bool(jnp.all(rc2 >= 0)) and bool(jnp.all(rv2 >= 0))
    # total water conserved cell-by-cell
    assert bool(jnp.allclose(rv2 + rc2, rv + rc, atol=1e-12))
