"""Box coalescence vs the analytic Golovin solution.

Oracle mirrors reference tests/python/physics/coalescence_golovin.py
(Scott 1967 eq. 2.7, RMSD gate over 150 log-spaced mass-density bins)
plus mass-conservation invariants.
"""

from math import pi

import numpy as np
import pytest
from scipy import special

from libcloudphxx_tpu import lgrngn

SIM_TIME = 800.0
R_ZERO = 30.084e-6
N_ZERO = 2.0**23
B_GOLOVIN = 1500.0


def spherevol(r):
    return 4.0 / 3.0 * r**3 * np.pi


V_ZERO = spherevol(R_ZERO)


def expvolumelnr(lnr):
    r = np.exp(lnr)
    return (
        N_ZERO * 3.0 * r**3 / R_ZERO**3 * np.exp(-((r / R_ZERO) ** 3))
    )


def golovin_analytic(v, t, n0, v0, b):
    # Scott 1967 eq. 2.7
    x = v / v0
    T = b * n0 * v0 * t
    tau = 1 - np.exp(-T)
    bessel = special.iv(1, 2 * x * np.sqrt(tau))
    if np.isinf(bessel):
        return 0.0
    res = n0 / v0 * bessel * (1 - tau) * np.exp(-x * (tau + 1)) / x / np.sqrt(tau)
    return 0.0 if np.isnan(res) else res


def rmsd(a1, a2):
    mask = (a1 > 0) | (a2 > 0)
    return np.sqrt(np.mean((a1[mask] - a2[mask]) ** 2))


BINS = 10.0 ** (-6 + np.arange(150) / 50.0)


def run_box(sd_conc=None, const_multi=None, sstp_coal=None):
    oi = lgrngn.opts_init_t()
    oi.dt = SIM_TIME
    oi.sstp_coal = int(sstp_coal if sstp_coal else SIM_TIME)
    oi.sedi_switch = False
    oi.dry_distros = {(1e-10, 0.0): expvolumelnr}
    oi.kernel = lgrngn.kernel_t.golovin
    oi.terminal_velocity = lgrngn.vt_t.beard77
    oi.kernel_parameters = [B_GOLOVIN]
    if sd_conc:
        oi.sd_conc = sd_conc
        oi.n_sd_max = sd_conc
    else:
        oi.sd_const_multi = const_multi
        oi.n_sd_max = int(N_ZERO / const_multi + 10)

    opts = lgrngn.opts_t()
    opts.adve = opts.sedi = opts.cond = opts.chem_dsl = False
    opts.coal = True

    rhod = np.ones(1)
    th = 300.0 * np.ones(1)
    rv = 0.01 * np.ones(1)

    prtcls = lgrngn.factory(lgrngn.backend_t.serial, oi)
    prtcls.init(th, rv, rhod)

    prtcls.diag_all()
    prtcls.diag_wet_mom(0)
    n_init = prtcls.outbuf()[0]
    prtcls.diag_all()
    prtcls.diag_wet_mom(3)
    mom3_init = prtcls.outbuf()[0]

    prtcls.step_sync(opts, th, rv, rhod)
    prtcls.step_async(opts)

    prtcls.diag_all()
    prtcls.diag_wet_mom(3)
    mom3_final = prtcls.outbuf()[0]
    prtcls.diag_all()
    prtcls.diag_wet_mom(0)
    n_final = prtcls.outbuf()[0]

    results = np.zeros(BINS.size - 1)
    for i in range(results.size):
        prtcls.diag_all()
        prtcls.diag_wet_mass_dens((BINS[i] + BINS[i + 1]) / 2.0, 0.62)
        results[i] = prtcls.outbuf().mean()

    golovin_results = np.zeros(BINS.size - 1)
    for i in range(results.size):
        vol = spherevol((BINS[i] + BINS[i + 1]) / 2.0)
        golovin_results[i] = (
            golovin_analytic(vol, SIM_TIME, n_init, V_ZERO, B_GOLOVIN)
            * vol * vol * 3000.0
        )
    return results, golovin_results, (n_init, n_final, mom3_init, mom3_final)


@pytest.mark.slow
def test_golovin_sd_conc():
    results, analytic, (n0, n1, m0, m1) = run_box(sd_conc=2**14)
    # water mass (3rd wet moment) is conserved by coalescence
    assert m1 == pytest.approx(m0, rel=1e-10)
    # droplet number decreases
    assert n1 < n0
    # distribution matches the analytic Golovin solution
    # (reference gate: RMSD < 1.2e-5, coalescence_golovin.py:141)
    err = rmsd(results, analytic)
    assert err < 1.2e-5, err


@pytest.mark.slow
def test_golovin_const_multi():
    results, analytic, (n0, n1, m0, m1) = run_box(const_multi=1000)
    assert m1 == pytest.approx(m0, rel=1e-10)
    assert n1 < n0
    # reference gate: RMSD < 3e-5 (coalescence_golovin.py:144)
    err = rmsd(results, analytic)
    assert err < 3e-5, err


def test_all_kernels_smoke():
    # mirrors reference tests/python/unit/col_kernels.py: every kernel runs
    # one coalescence step without blowing up
    from math import exp, log, sqrt
    def lognormal(lnr):
        return 60e6*np.exp(-(lnr-np.log(0.02e-6))**2/2/np.log(1.4)**2) \
            / np.log(1.4)/np.sqrt(2*np.pi)
    k = lgrngn.kernel_t
    cases = [
        (k.geometric, []), (k.geometric, [10.0]), (k.long, []),
        (k.hall, []), (k.hall_davis_no_waals, []), (k.golovin, [1.0]),
        (k.onishi_hall, [100.0]), (k.onishi_hall_davis_no_waals, [100.0]),
        (k.vohl_davis_no_waals, []), (k.hall_pinsky_cumulonimbus, []),
        (k.hall_pinsky_stratocumulus, []), (k.hall_pinsky_1000mb_grav, []),
    ]
    rhod = np.ones(1); th = 300.0*np.ones(1); rv = 0.01*np.ones(1)
    diss = 0.04*np.ones(1)
    for kern, par in cases:
        oi = lgrngn.opts_init_t()
        oi.dt = 1
        oi.dry_distros = {(0.61, 0.0): lognormal}
        oi.sd_conc = 50
        oi.n_sd_max = 50
        oi.terminal_velocity = lgrngn.vt_t.beard76
        oi.kernel = kern
        oi.kernel_parameters = par
        oi.sedi_switch = False
        turb = kern in (k.onishi_hall, k.onishi_hall_davis_no_waals)
        oi.turb_coal_switch = turb
        prtcls = lgrngn.factory(lgrngn.backend_t.serial, oi)
        prtcls.init(th.copy(), rv.copy(), rhod)
        opts = lgrngn.opts_t()
        opts.adve = opts.sedi = opts.cond = opts.chem_dsl = False
        opts.coal = True
        opts.turb_coal = turb
        if turb:
            prtcls.step_sync(opts, th.copy(), rv.copy(), rhod,
                             diss_rate=diss)
        else:
            prtcls.step_sync(opts, th.copy(), rv.copy(), rhod)
        prtcls.step_async(opts)
        rw2 = prtcls.get_attr("rw2")
        assert np.isfinite(rw2).all(), kern
        n = prtcls.get_attr("n")
        # mass conserved by coalescence
        assert np.isfinite(n).all(), kern


def test_hall_efficiency_table_values():
    # spot-check the extracted Hall-1980 table against known physics:
    # small/similar drops have tiny efficiency; large collectors ~1
    from libcloudphxx_tpu.lgrngn import coalescence as coal_mod
    table, r_max = coal_mod.load_efficiency_table(lgrngn.kernel_t.hall)
    import jax.numpy as jnp
    eff_small = float(coal_mod.interpolated_efficiency(
        table, r_max, jnp.asarray(10e-6), jnp.asarray(3e-6)))
    eff_large = float(coal_mod.interpolated_efficiency(
        table, r_max, jnp.asarray(300e-6), jnp.asarray(150e-6)))
    assert 0.0 <= eff_small < 0.3
    assert 0.5 < eff_large <= 1.1
    # symmetric in radii
    a = float(coal_mod.interpolated_efficiency(
        table, r_max, jnp.asarray(50e-6), jnp.asarray(20e-6)))
    b = float(coal_mod.interpolated_efficiency(
        table, r_max, jnp.asarray(20e-6), jnp.asarray(50e-6)))
    assert a == pytest.approx(b, rel=1e-12)


def test_recycling_refills_dead_slots():
    # mirrors reference SD_removal.py/rcyc semantics: equal-multiplicity
    # collisions leave n=0 slots; opts.rcyc splits large SDs into them,
    # conserving total multiplicity and mass
    oi = lgrngn.opts_init_t()
    oi.dt = 10.0
    oi.sstp_coal = 10
    oi.sedi_switch = False
    oi.dry_distros = {(1e-10, 0.0): expvolumelnr}
    oi.kernel = lgrngn.kernel_t.golovin
    oi.kernel_parameters = [B_GOLOVIN]
    oi.terminal_velocity = lgrngn.vt_t.beard77
    oi.sd_conc = 512
    oi.n_sd_max = 512
    opts = lgrngn.opts_t()
    opts.adve = opts.sedi = opts.cond = opts.chem_dsl = False
    opts.coal = True
    opts.rcyc = True
    rhod = np.ones(1); th = 300.0*np.ones(1); rv = 0.01*np.ones(1)
    prtcls = lgrngn.factory(lgrngn.backend_t.serial, oi)
    prtcls.init(th, rv, rhod)
    n0 = prtcls.get_attr("n")
    tot0 = n0.sum()
    mass0 = (n0 * prtcls.get_attr("rw2")**1.5).sum()
    for _ in range(20):
        prtcls.step_sync(opts, th, rv, rhod)
        prtcls.step_async(opts)
    n1 = prtcls.get_attr("n")
    mass1 = (n1 * prtcls.get_attr("rw2")**1.5).sum()
    # multiplicity decreases via coalescence, but recycling keeps the SD
    # count high (most slots alive) and conserves mass
    assert (n1 > 0).sum() > 0.9 * 512
    assert mass1 == pytest.approx(mass0, rel=1e-9)
    assert n1.sum() < tot0


def test_turb_coal_changes_kernel_values():
    """opts.turb_coal gates whether kernels see the ambient dissipation rate
    (reference particles_step.ipp:382-404 coal(dt, turb_coal) and
    coal.ipp:439-450 _turb tuple): with it off the onishi/Wang terms see
    eps = 0 and the kernel collapses toward the stagnant-air value."""
    import jax.numpy as jnp
    from libcloudphxx_tpu.lgrngn import coalescence
    from libcloudphxx_tpu.lgrngn.state import StaticConfig

    oi = lgrngn.opts_init_t()
    oi.dt = 1.0
    oi.sd_conc = 2
    oi.n_sd_max = 2
    oi.kernel = lgrngn.kernel_t.onishi_hall
    oi.kernel_parameters = [100.0]
    oi.terminal_velocity = lgrngn.vt_t.beard76
    oi.turb_coal_switch = True
    cfg = StaticConfig.from_opts_init(oi)
    table, r_max = coalescence.load_efficiency_table(oi.kernel)
    args = dict(
        n_a=jnp.array([1e8]), n_b=jnp.array([5e7]),
        rw2_a=jnp.array([(20e-6) ** 2]), rw2_b=jnp.array([(15e-6) ** 2]),
        vt_a=jnp.array([0.02]), vt_b=jnp.array([0.01]),
        rd3_a=jnp.array([1e-18]), rd3_b=jnp.array([1e-18]),
        eff_table=table, r_max_um=r_max, rhod=1.1, eta=1.8e-5,
    )
    params = jnp.array([100.0])
    k_turb = float(coalescence.kernel_value(
        cfg, params, diss_rate=jnp.array([0.04]), **args)[0])
    k_still = float(coalescence.kernel_value(
        cfg, params, diss_rate=0.0, **args)[0])
    assert k_turb > k_still > 0.0


def test_turb_coal_requires_switch():
    def lognormal(lnr):
        return 60e6 * np.exp(-(lnr - np.log(0.02e-6)) ** 2
                             / 2 / np.log(1.4) ** 2) \
            / np.log(1.4) / np.sqrt(2 * np.pi)
    oi = lgrngn.opts_init_t()
    oi.dt = 1.0
    oi.dry_distros = {(0.61, 0.0): lognormal}
    oi.sd_conc = 8
    oi.n_sd_max = 8
    oi.kernel = lgrngn.kernel_t.geometric
    oi.terminal_velocity = lgrngn.vt_t.beard76
    prtcls = lgrngn.factory(lgrngn.backend_t.serial, oi)
    rhod = np.ones(1)
    th = 300.0 * np.ones(1)
    rv = 0.01 * np.ones(1)
    prtcls.init(th.copy(), rv.copy(), rhod)
    opts = lgrngn.opts_t()
    opts.adve = opts.sedi = opts.cond = opts.chem_dsl = False
    opts.coal = True
    opts.turb_coal = True  # but opts_init.turb_coal_switch is False
    prtcls.step_sync(opts, th.copy(), rv.copy(), rhod)
    with pytest.raises(RuntimeError, match="turb_coal"):
        prtcls.step_async(opts)
