"""Aqueous-chemistry tests.

Oracles are external physics facts, mirroring the reference's chemistry test
strategy (tests/python/unit/chem_dsl.py, chem_dsc.py, chem_coal.py):

  - Henry equilibrium: at steady state the aqueous molar concentration of a
    physically dissolving gas (O3) equals H(T) * partial pressure,
  - pure-water dissociation: pH -> 7,
  - oxidation stoichiometry: moles of produced S(VI) == moles of consumed
    S(IV); dry radius grows with created sulfate,
  - end-to-end particles_t run: closed-system gas budget + diag_chem surface.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from libcloudphxx_tpu import lgrngn
from libcloudphxx_tpu.common import chem as cc
from libcloudphxx_tpu.common import constants as c
from libcloudphxx_tpu.lgrngn import chemistry
from libcloudphxx_tpu.lgrngn.chemistry import (CO2, H, H2O2, HNO3, NH3, O3,
                                               S_VI, SO2)
from libcloudphxx_tpu.lgrngn.state import StaticConfig, empty_state


def _cfg(**kw):
    args = dict(
        n_dims=0, nx=1, ny=1, nz=1, n_cell=1, n_sd_max=8,
        dx=1.0, dy=1.0, dz=1.0, x0=0.0, x1=1.0, y0=0.0, y1=1.0,
        z0=0.0, z1=1.0, dt=0.1, sstp_cond=1, sstp_coal=1,
        th_dry=True, const_p=False, RH_formula=0, adve_scheme=0,
        terminal_velocity=0, kernel=0, exact_sstp_cond=False,
        variable_dt=False, sedi_switch=False, coal_switch=False,
        turb_cond_switch=False, open_side_walls=False,
        periodic_topbot_walls=False, chem_switch=True, sstp_chem=1,
        chem_rho=1.8e3,
    )
    args.update(kw)
    return StaticConfig(**args)


def _chem_state(cfg, rw_um=10.0, T=285.0, gas=1e-9):
    st = empty_state(cfg)
    n_sd = cfg.n_sd_max
    rw2 = (rw_um * 1e-6) ** 2
    st = dataclasses.replace(
        st,
        n=jnp.ones(n_sd),
        rd3=jnp.full(n_sd, (0.05e-6) ** 3),
        rw2=jnp.full(n_sd, rw2),
        kpa=jnp.full(n_sd, 0.61),
        th=jnp.full(1, T * (1e5 / 93300.0) ** 0.2854),
        rv=jnp.full(1, 8e-3),
        rhod=jnp.full(1, 1.1),
        T=jnp.full(1, T),
        p=jnp.full(1, 93300.0),
        RH=jnp.full(1, 0.98),
        dv=jnp.ones(1),
        ambient_chem=jnp.full((6, 1), gas),
        sstp_tmp_chem=jnp.full((6, 1), gas),
        chem=jnp.where(
            jnp.ones(n_sd) > 0,
            chemistry.init_chem_aq(jnp.full(n_sd, (0.05e-6) ** 3), 1.8e3),
            0.0,
        ),
    )
    return st


def test_henry_equilibrium_O3():
    """Aqueous O3 approaches Henry's-law equilibrium: conc_aq = H(T) * p_O3
    (Warneck eq. 8.22 steady state; reference chem_henry.ipp:192-213)."""
    cfg = _cfg()
    st = _chem_state(cfg, gas=50e-9)
    T = float(st.T[0])
    V = float(chemistry._V_of(st.rw2)[0])
    flag = jnp.ones(cfg.n_sd_max, bool)

    # many small implicit steps -> fixed point; gas held fixed by resetting
    gas0 = st.ambient_chem
    for _ in range(200):
        st = chemistry.chem_henry(cfg, st, 1.0, flag)
        st = dataclasses.replace(st, ambient_chem=gas0)

    p_O3 = 50e-9 * 1.1 * c.kaBoNA * T / cc.M_O3
    conc_expected = cc.henry_temp(T, cc.H_O3, cc.dHR_O3) * p_O3  # [mol/m3]
    conc_got = float(st.chem[O3][0]) / cc.M_O3 / V
    assert conc_got == pytest.approx(conc_expected, rel=1e-6)


def test_dissoc_pure_water_pH7():
    """With no solutes the electroneutrality root is pure-water
    autoionisation: conc_H = sqrt(K_H2O) -> pH 7
    (reference chem_dissoc.ipp chem_minfun first term)."""
    cfg = _cfg()
    st = _chem_state(cfg)
    st = dataclasses.replace(st, chem=jnp.zeros_like(st.chem))
    flag = jnp.ones(cfg.n_sd_max, bool)
    st = chemistry.chem_dissoc(cfg, st, flag)
    V = float(chemistry._V_of(st.rw2)[0])
    conc_H = float(st.chem[H][0]) / cc.M_H / V      # [mol/m3]
    pH = -np.log10(conc_H / 1e3)                    # mol/l
    assert pH == pytest.approx(7.0, abs=0.01)


def test_dissoc_acidic_with_sulfate():
    """Dissolved H2SO4 must push pH well below 7."""
    cfg = _cfg()
    st = _chem_state(cfg)
    flag = jnp.ones(cfg.n_sd_max, bool)
    st = chemistry.chem_dissoc(cfg, st, flag)
    V = float(chemistry._V_of(st.rw2)[0])
    conc_H = float(st.chem[H][0]) / cc.M_H / V
    pH = -np.log10(conc_H / 1e3)
    assert pH < 6.0


def test_react_stoichiometry_and_rd3_growth():
    """S(IV) -> S(VI): moles produced == moles consumed; oxidants deplete;
    rd3 grows by 3/(4 pi chem_rho) * dm_S6 (chem_react.ipp:221-318)."""
    cfg = _cfg()
    st = _chem_state(cfg, rw_um=20.0)
    n_sd = cfg.n_sd_max
    V = chemistry._V_of(st.rw2)
    # load S(IV), oxidants and an acidic H+ (pH ~5)
    chem = st.chem
    chem = chem.at[SO2].set(1e-15)
    chem = chem.at[H2O2].set(1e-15)
    chem = chem.at[O3].set(1e-16)
    chem = chem.at[H].set(1e-5 * 1e3 * V * cc.M_H)
    st = dataclasses.replace(st, chem=chem)
    rd3_before = np.asarray(st.rd3)
    S6_before = np.asarray(st.chem[S_VI])
    SIV_before = np.asarray(st.chem[SO2])
    ox_before = np.asarray(st.chem[H2O2] + st.chem[O3])

    flag = jnp.ones(n_sd, bool)
    st = chemistry.chem_react(cfg, st, 1.0, flag)

    dS6 = (np.asarray(st.chem[S_VI]) - S6_before) / cc.M_H2SO4
    dSIV = (SIV_before - np.asarray(st.chem[SO2])) / cc.M_SO2_H2O
    assert dS6[0] > 0
    np.testing.assert_allclose(dS6, dSIV, rtol=1e-10)
    assert np.all(np.asarray(st.chem[H2O2] + st.chem[O3]) < ox_before)
    drd3 = np.asarray(st.rd3) - rd3_before
    np.testing.assert_allclose(
        drd3, 0.75 / np.pi / cfg.chem_rho * dS6 * cc.M_H2SO4, rtol=1e-10
    )


def test_chem_flag_concentrated_droplet_skipped():
    """Ionic strength above 0.02 mol/l switches chemistry off for a droplet
    (reference particles_impl_chem_strength.ipp:14-68)."""
    cfg = _cfg()
    st = _chem_state(cfg, rw_um=1.0)
    V = chemistry._V_of(st.rw2)
    # very concentrated H+ (1 mol/l)
    chem = st.chem.at[H].set(1.0 * 1e3 * V * cc.M_H)
    st = dataclasses.replace(st, chem=chem)
    flag = chemistry.chem_flag(st.chem, V, st.T[st.ijk], st.rw2)
    assert not bool(flag[0])
    # dilute droplet passes
    chem = st.chem.at[H].set(1e-7 * 1e3 * V * cc.M_H)
    st = dataclasses.replace(st, chem=chem)
    flag = chemistry.chem_flag(st.chem, V, st.T[st.ijk], st.rw2)
    assert bool(flag[0])


def test_particles_api_chem_end_to_end():
    """Full particles_t chem cycle: ambient gases deplete as droplets absorb
    SO2 (closed system), diag_chem exposes the per-cell dissolved mass, and
    the strict opts gating matches the reference error behavior."""
    from libcloudphxx_tpu.common.chem import chem_species_t
    from libcloudphxx_tpu.common import lognormal as ln_mod

    def lognormal(lnr):
        return ln_mod.n_e(0.04e-6, 1.4, 60e6, lnr)

    oi = lgrngn.opts_init_t()
    oi.dt = 1.0
    oi.sd_conc = 64
    oi.n_sd_max = 64
    oi.dry_distros = {(0.61, 0.0): lognormal}
    oi.chem_switch = True
    oi.chem_rho = 1.8e3
    oi.sstp_chem = 2

    prtcls = lgrngn.factory(lgrngn.backend_t.serial, oi)
    # supersaturated parcel so droplets activate and become dilute enough
    # to pass the ionic-strength gate (the reference chem tests also run
    # activated cloud droplets)
    th = np.array([300.0])
    rv = np.array([0.02])
    rhod = np.array([1.0])
    ambient_chem = {
        chem_species_t.SO2: np.array([2e-10]),
        chem_species_t.O3: np.array([5e-8]),
        chem_species_t.H2O2: np.array([5e-10]),
        chem_species_t.CO2: np.array([360e-6 * 44.0 / 29.0]),
        chem_species_t.NH3: np.array([1e-10]),
        chem_species_t.HNO3: np.array([1e-11]),
    }
    prtcls.init(th, rv, rhod, ambient_chem=ambient_chem)

    opts = lgrngn.opts_t()
    opts.cond = True
    opts.coal = opts.adve = opts.sedi = False
    opts.chem_dsl = True
    opts.chem_dsc = True
    opts.chem_rct = True

    SO2_before = ambient_chem[chem_species_t.SO2][0]
    for _ in range(5):
        prtcls.step_sync(opts, th, rv, ambient_chem=ambient_chem)
        prtcls.step_async(opts)
    SO2_after = ambient_chem[chem_species_t.SO2][0]
    assert SO2_after < SO2_before  # gas dissolved into droplets
    assert SO2_after >= 0

    prtcls.diag_all()
    prtcls.diag_chem(chem_species_t.S_VI)
    S_VI_mass = prtcls.outbuf()
    assert S_VI_mass[0] > 0  # initial NH4HSO4 + oxidation product

    prtcls.diag_all()
    prtcls.diag_chem(chem_species_t.SO2)
    assert prtcls.outbuf()[0] > 0  # dissolved S(IV) present

    # pH must be acidic but physical (2 < pH < 7)
    prtcls.diag_all()
    prtcls.diag_chem(chem_species_t.H)
    m_H_specific = prtcls.outbuf()[0]  # kg H+ / kg dry air
    assert m_H_specific > 0

    # gating errors (reference particles_step.ipp:68-72)
    oi2 = lgrngn.opts_init_t()
    oi2.dt = 1.0
    oi2.sd_conc = 8
    oi2.n_sd_max = 8
    oi2.dry_distros = {(0.61, 0.0): lognormal}
    p2 = lgrngn.factory(lgrngn.backend_t.serial, oi2)
    with pytest.raises(RuntimeError):
        p2.init(th.copy(), rv.copy(), rhod.copy(),
                ambient_chem=ambient_chem)


def test_chem_coal_mass_conservation():
    """Total dissolved chem mass (sum n * m) is conserved by coalescence
    (reference tests/python/unit/chem_coal.py idea)."""
    from libcloudphxx_tpu.lgrngn import coalescence

    cfg = _cfg(n_sd_max=64, coal_switch=True, kernel=1,
               terminal_velocity=0)
    st = _chem_state(cfg)
    n_sd = cfg.n_sd_max
    key = jax.random.PRNGKey(7)
    rw2 = jax.random.uniform(key, (n_sd,), minval=1e-11, maxval=4e-9)
    st = dataclasses.replace(
        st,
        n=jnp.full(n_sd, 1e6),
        rw2=rw2,
        vt=jnp.zeros(n_sd),
        chem=jnp.broadcast_to(
            jnp.linspace(1e-18, 5e-18, n_sd), (8, n_sd)).copy(),
    )
    total_before = np.asarray(jnp.sum(st.n * st.chem, axis=1))
    params = jnp.asarray([1500.0])  # golovin b
    out = coalescence.coal(cfg, st, params, 10.0, 1)
    total_after = np.asarray(jnp.sum(out.n * out.chem, axis=1))
    np.testing.assert_allclose(total_after, total_before, rtol=1e-12)
