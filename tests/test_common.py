"""Unit tests for the common physics foundation.

Oracles mirror the reference's tests
(reference tests/common/test_common_pvs.cpp, tests/python/unit/api_common.py)
plus direct numeric cross-checks of the formulas cited in SURVEY.md section 2.5.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from libcloudphxx_tpu.common import (
    const_cp,
    constants as c,
    hydrostatic,
    kappa_koehler,
    kelvin,
    lognormal,
    maxwell_mason,
    mean_free_path,
    moist_air,
    tetens,
    theta_dry,
    theta_std,
    transition_regime,
    turbulence,
    ventil,
    vterm,
)
from libcloudphxx_tpu.ops import rootfind


def test_constants():
    assert np.isclose(c.eps, 0.018 / 0.02897)
    assert np.isclose(c.R_d, 8.3144621 / 0.02897)
    assert np.isclose(c.R_v, 8.3144621 / 0.018)
    assert c.rho_w == 1e3


def test_p_vs_triple_point():
    # reference tests/common/test_common_pvs.cpp: p_vs(T_tri) == p_tri
    assert np.isclose(float(const_cp.p_vs(jnp.float64(273.16))), 611.73)
    # api_common.py gate: |p_vs(273.16) - 611.73| < .001
    assert abs(float(const_cp.p_vs(jnp.float64(273.16))) - 611.73) < 1e-3


def test_p_vsi_triple_point():
    assert np.isclose(float(const_cp.p_vsi(jnp.float64(273.16))), 611.73)


def test_saturation_mixing_ratios():
    T, p = jnp.float64(283.15), jnp.float64(90000.0)
    r = float(const_cp.r_vs(T, p))
    assert 0.005 < r < 0.012
    # ice saturation below liquid saturation under 0C
    Tc = jnp.float64(263.15)
    assert float(const_cp.r_vsi(Tc, p)) < float(const_cp.r_vs(Tc, p))


def test_latent_heats():
    assert np.isclose(float(const_cp.l_v(jnp.float64(273.16))), 2.5e6)
    assert np.isclose(float(const_cp.l_s(jnp.float64(273.16))), 2.834e6)
    assert np.isclose(float(const_cp.l_f(jnp.float64(273.16))), 3.34e5)
    # l_s ~= l_v + l_f at triple point
    assert np.isclose(2.5e6 + 3.34e5, 2.834e6)


def test_tetens_close_to_cc():
    # Tetens and Clausius-Clapeyron agree within ~2% in warm range
    for T in [283.15, 293.15, 303.15]:
        a = float(tetens.p_vs(jnp.float64(T)))
        b = float(const_cp.p_vs(jnp.float64(T)))
        assert abs(a - b) / b < 0.02


def test_theta_dry_roundtrip():
    # api_common.py: th_std2dry(th_dry2std(th, rv), rv) == th
    th, rv = jnp.float64(300.0), jnp.float64(0.01)
    assert np.isclose(
        float(theta_dry.std2dry(theta_dry.dry2std(th, rv), rv)), 300.0, rtol=1e-12
    )


def test_theta_dry_T_p_consistency():
    # T(th_dry, rhod) must inverse the theta-dry definition:
    # th = T * (p_1000/p_dry)^(R_d/c_pd) with p_dry = rhod R_d T
    rhod = jnp.float64(1.1)
    th = jnp.float64(300.0)
    T = float(theta_dry.T(th, rhod))
    p_dry = 1.1 * c.R_d * T
    th_back = T * (c.p_1000 / p_dry) ** (c.R_d / c.c_pd)
    assert np.isclose(th_back, 300.0, rtol=1e-10)
    # p(rhod, r, T) = rhod*(R_d + r R_v)*T
    p = float(theta_dry.p(rhod, jnp.float64(0.01), jnp.float64(T)))
    assert np.isclose(p, 1.1 * (c.R_d + 0.01 * c.R_v) * T)


def test_hydrostatic_decreasing():
    # api_common.py: p at 200 m < p at 100 m
    p100 = float(hydrostatic.p(100.0, 300.0, 0.01, 0.0, 100000.0))
    p200 = float(hydrostatic.p(200.0, 300.0, 0.01, 0.0, 100000.0))
    assert p100 > p200
    assert np.isclose(
        float(hydrostatic.p(0.0, 300.0, 0.01, 0.0, 100000.0)), 100000.0
    )


def test_rhod_over_one():
    # api_common.py: rhod(1e5 Pa, 300 K, rv=0) > 1
    assert float(theta_std.rhod(1e5, 300.0, 0.0)) > 1.0


def test_rootfind_sqrt2():
    # reference tests/toms748: root of x^2 - 2
    f = lambda x: x * x - 2.0
    a = jnp.full((16,), 0.0, jnp.float64)
    b = jnp.full((16,), 2.0, jnp.float64)
    r = rootfind.solve_bracketed(f, a, b)
    np.testing.assert_allclose(np.asarray(r), np.sqrt(2.0), rtol=1e-12)
    r2 = rootfind.bisect(f, a, b)
    np.testing.assert_allclose(np.asarray(r2), np.sqrt(2.0), rtol=1e-12)


def test_kappa_koehler_critical():
    # api_common.py: rw3_cr > rd3 and S_cr > 1 for rd=0.2um, kappa=.5, T=300
    rd3 = jnp.float64((0.2e-6) ** 3)
    T = jnp.float64(300.0)
    rw3 = float(kappa_koehler.rw3_cr(rd3, jnp.float64(0.5), T))
    assert rw3 > float(rd3)
    assert float(kappa_koehler.S_cr(rd3, jnp.float64(0.5), T)) > 1.0


def test_kappa_koehler_equilibrium():
    # equilibrium radius solves RH = a_w * kelvin term
    rd3 = jnp.float64((0.1e-6) ** 3)
    kappa = jnp.float64(0.61)
    RH = jnp.float64(0.95)
    T = jnp.float64(285.0)
    rw3 = kappa_koehler.rw3_eq(rd3, kappa, RH, T)
    resid = float(
        RH
        - kappa_koehler.a_w(rw3, rd3, kappa)
        * kelvin.klvntrm(jnp.cbrt(rw3), T)
    )
    assert abs(resid) < 1e-10
    # bracket: between rd3 and no-kelvin equilibrium
    assert float(rd3) < float(rw3) < float(
        kappa_koehler.rw3_eq_nokelvin(rd3, kappa, RH)
    )
    # kappa=0 -> dry radius
    assert float(kappa_koehler.rw3_eq(rd3, jnp.float64(0.0), RH, T)) == float(rd3)


def test_kelvin_term():
    T = jnp.float64(291.0)
    assert np.isclose(float(kelvin.sg_surf(T)), 0.07275)
    # Kelvin term > 1 and decreasing with r
    assert float(kelvin.klvntrm(jnp.float64(1e-7), T)) > float(
        kelvin.klvntrm(jnp.float64(1e-6), T)
    ) > 1.0


def test_maxwell_mason_sign():
    T = jnp.float64(283.0)
    p = jnp.float64(90000.0)
    D = moist_air.D(T, p)
    rho_v = jnp.float64(0.01) * jnp.float64(1.1)
    # supersaturated: growth (positive); subsaturated: evaporation
    grow = float(maxwell_mason.rdrdt(D, c.K_0, rho_v, T, p, 1.05, 1.0, 1.0))
    evap = float(maxwell_mason.rdrdt(D, c.K_0, rho_v, T, p, 0.95, 1.0, 1.0))
    assert grow > 0 > evap
    # ice deposition positive when RH_i > 1
    assert float(maxwell_mason.rdrdt_i(D, c.K_0, rho_v, 263.0, p, 1.05)) > 0


def test_mean_free_path_magnitudes():
    T, p = jnp.float64(283.0), jnp.float64(90000.0)
    lD = float(mean_free_path.lambda_D(T))
    lK = float(mean_free_path.lambda_K(T, p))
    assert 1e-8 < lD < 1e-6
    assert 1e-8 < lK < 1e-6


def test_transition_regime_limits():
    assert np.isclose(float(transition_regime.beta(jnp.float64(0.0))), 1.0)
    assert float(transition_regime.beta(jnp.float64(100.0))) < 0.01


def test_ventilation():
    assert np.isclose(float(ventil.Nu(jnp.float64(0.0), jnp.float64(0.0))), 2.0)
    Re = float(ventil.Re(1.0, 1e-3, 1.2, 1.8e-5))
    assert Re > 100


def test_viscosity():
    # Rogers & Yau: eta(273 K) ~ 1.72e-5 Pa s
    assert np.isclose(float(vterm.visc(jnp.float64(273.16))), 1.72e-5, rtol=5e-3)


def test_vterm_beard77():
    # ~1 mm drop falls at ~6.5 m/s at sea level, 10 um at ~1.2 cm/s
    v_large = float(vterm.vt_beard77_v0(jnp.float64(1e-3)))
    v_small = float(vterm.vt_beard77_v0(jnp.float64(10e-6)))
    assert 5.0 < v_large < 8.0
    assert 0.005 < v_small < 0.02
    # altitude correction > 1 aloft (lower density)
    fact = float(
        vterm.vt_beard77_fact(
            jnp.float64(1e-3), jnp.float64(70000.0), jnp.float64(0.9),
            vterm.visc(jnp.float64(270.0)),
        )
    )
    assert fact > 1.0


def test_vterm_beard76():
    T = jnp.float64(288.15)
    p = jnp.float64(101325.0)
    rhoa = jnp.float64(c.rho_stp)
    eta = vterm.visc(T)
    radii = jnp.array([1e-6, 10e-6, 50e-6, 500e-6, 1e-3, 2e-3], jnp.float64)
    v = np.asarray(vterm.vt_beard76(radii, T, p, rhoa, eta))
    assert np.all(np.diff(v) > 0)  # monotone in r over this range
    assert 5.0 < v[-2] < 8.0  # 1 mm radius ~ 6.5 m/s
    v77 = np.asarray(vterm.vt_beard77_v0(radii))
    np.testing.assert_allclose(v, v77, rtol=0.12)  # formulas agree ~10%


def test_vterm_khvorostyanov():
    T = jnp.float64(288.15)
    rhoa = jnp.float64(1.2)
    eta = vterm.visc(T)
    r = jnp.float64(1e-3)
    v_sph = float(vterm.vt_khvorostyanov(r, T, rhoa, eta, spherical=True))
    v_nsph = float(vterm.vt_khvorostyanov(r, T, rhoa, eta, spherical=False))
    assert 4.0 < v_sph < 10.0
    assert 0 < v_nsph <= v_sph * 1.2


def test_lognormal_total_number():
    # integral of n_e over lnr recovers n_tot
    mean_r, sdev, n_tot = 0.02e-6, 1.4, 60e6
    lnr = jnp.linspace(np.log(1e-9), np.log(1e-5), 10000, dtype=jnp.float64)
    vals = np.asarray(lognormal.n_e(mean_r, sdev, n_tot, lnr))
    total = np.trapezoid(vals, np.asarray(lnr))
    assert np.isclose(total, n_tot, rtol=1e-6)


def test_turbulence_formulas():
    tke = float(turbulence.tke(1e-3, 50.0))
    assert tke > 0
    tau = float(turbulence.tau(tke, 50.0))
    assert tau > 0
    # OU update preserves magnitude statistics roughly
    wp = float(turbulence.update_turb_vel(0.1, tau, 1.0, tke, 0.0))
    assert abs(wp) < 0.1 + 1e-12


def test_moist_air_mix():
    assert np.isclose(float(moist_air.R(jnp.float64(0.0))), c.R_d)
    assert float(moist_air.R(jnp.float64(0.02))) > c.R_d
    assert np.isclose(float(moist_air.c_p(jnp.float64(0.0))), c.c_pd)
    # p_v: partial pressure fraction
    assert np.isclose(
        float(moist_air.p_v(1e5, jnp.float64(0.01))), 1e5 * 0.01 / (0.01 + c.eps)
    )
