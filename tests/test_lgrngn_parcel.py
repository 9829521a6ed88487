"""SDM 0-D parcel tests.

Oracles mirror reference tests/python/physics/lgrngn_cond.py (end-state th/rv
and supersaturation gates) and tests/python/unit/api_lgrngn.py (exact SD
counts/multiplicities, call-order state machine, kappa-filtered moments).
"""

from math import exp, log, pi, sqrt

import numpy as np
import pytest

from libcloudphxx_tpu import lgrngn
from libcloudphxx_tpu.common import constants as c
from libcloudphxx_tpu.common import theta_dry


def lognormal(lnr):
    mean_r, stdev, n_tot = 0.04e-6 / 2, 1.4, 60e6
    return (
        n_tot * exp(-((lnr - log(mean_r)) ** 2) / 2 / log(stdev) ** 2)
        / log(stdev) / sqrt(2 * pi)
    )


def make_opts_init(**kw):
    oi = lgrngn.opts_init_t()
    oi.dry_distros = {(0.61, 0.0): lognormal}
    oi.coal_switch = False
    oi.sedi_switch = False
    oi.RH_max = 0.999
    oi.dt = 1
    oi.sd_conc = 100
    oi.n_sd_max = 100
    for k, v in kw.items():
        setattr(oi, k, v)
    return oi


def make_opts():
    opts = lgrngn.opts_t()
    opts.adve = opts.sedi = opts.coal = opts.chem_dsl = False
    opts.cond = True
    return opts


# expected end state (reference lgrngn_cond.py:53-57)
EXP_TH = {True: 306.9, False: 307.78}
EXP_RV = {True: 1.628e-2, False: 1.7e-2}


@pytest.mark.parametrize("constp", [False, True])
@pytest.mark.parametrize("sstp", [1, 10])
def test_parcel_condensation(constp, sstp):
    oi = make_opts_init(sstp_cond=sstp)
    opts = make_opts()

    rhod = np.array([1.0])
    th = np.array([300.0])
    rv = np.array([0.02])
    T0 = float(theta_dry.T(th[0], rhod[0]))
    p = np.array([float(theta_dry.p(rhod[0], rv[0], T0))])

    if constp:
        th[0] = float(theta_dry.dry2std(th[0], rv[0]))
        oi.const_p = True
        oi.th_dry = False

    prtcls = lgrngn.factory(lgrngn.backend_t.serial, oi)
    prtcls.init(th, rv, rhod, p if constp else None)

    prtcls.diag_RH()
    assert prtcls.outbuf()[0] > 2.0  # strongly supersaturated at t=0

    for _ in range(40):
        prtcls.step_sync(opts, th, rv, rhod)
        prtcls.step_async(opts)

    prtcls.diag_RH()
    ss = (prtcls.outbuf()[0] - 1) * 100
    # reference gates (lgrngn_cond.py:137-179)
    assert abs(ss) < 4.5e-3
    assert abs(th[0] - EXP_TH[constp]) < 1e-4 * EXP_TH[constp]
    assert abs(rv[0] - EXP_RV[constp]) < 1e-3 * EXP_RV[constp]

    # evaporation phase: subsaturate; all previously condensed water must
    # return to vapour (reference lgrngn_cond.py:141-160 rv_diff < 1e-9)
    condensed = 0.02 - rv[0]
    rv[0] = 0.002
    rv_evap_start = rv[0]
    for _ in range(40):
        prtcls.step_sync(opts, th, rv, rhod)
        prtcls.step_async(opts)
    assert abs(rv[0] - rv_evap_start - condensed) < 1e-9


def test_substepping_improves_th_error():
    # more cond substeps -> smaller theta discretization error
    # (reference lgrngn_cond.py:167-170: th_diff shrinks ~1/sstp)
    errs = {}
    for sstp in (1, 10):
        oi = make_opts_init(sstp_cond=sstp)
        opts = make_opts()
        rhod = np.array([1.0]); th = np.array([300.0]); rv = np.array([0.02])
        prtcls = lgrngn.factory(lgrngn.backend_t.serial, oi)
        prtcls.init(th, rv, rhod)
        th_init = th.copy()
        for _ in range(40):
            prtcls.step_sync(opts, th, rv, rhod)
            prtcls.step_async(opts)
        rv[0] = 0.002
        for _ in range(40):
            prtcls.step_sync(opts, th, rv, rhod)
            prtcls.step_async(opts)
        errs[sstp] = abs(th[0] - th_init[0])
    assert errs[1] < 4.2e-2   # reference gate th_diff_1
    assert errs[10] < 4.2e-3  # reference gate th_diff_10


def test_api_state_machine_and_diags():
    # reference api_lgrngn.py:120-152
    oi = make_opts_init()
    opts = make_opts()
    rhod = np.array([1.0]); th = np.array([300.0]); rv = np.array([0.01])
    prtcls = lgrngn.factory(lgrngn.backend_t.serial, oi)
    prtcls.init(th, rv, rhod)
    with pytest.raises(Exception):
        prtcls.init(th, rv, rhod)  # multiple init call
    prtcls.step_sync(opts, th, rv, rhod)
    with pytest.raises(Exception):
        prtcls.step_sync(opts, th, rv, rhod)  # sync/async order mismatch
    prtcls.step_async(opts)
    prtcls.step_sync(opts, th, rv)
    prtcls.diag_dry_rng(0.0, 1.0)
    prtcls.diag_wet_rng(0.0, 1.0)
    prtcls.diag_kappa_rng(0.0, 2.0)
    prtcls.diag_kappa_rng_cons(0.5, 1.5)
    prtcls.diag_dry_mom(1)
    prtcls.diag_wet_mom(1)
    prtcls.diag_kappa_mom(1)
    puddle = prtcls.diag_puddle()
    # the reference's output_t key set (common/output.hpp:8-42)
    assert set(puddle) == {
        "HNO3", "NH3", "CO2", "SO2", "H2O2", "O3", "S_VI", "H",
        "liquid_volume", "dry_volume", "particle_number", "ice_mass",
        "liquid_number", "ice_number",
    }
    prtcls.diag_all()
    prtcls.diag_sd_conc()
    assert prtcls.outbuf()[0] == oi.sd_conc  # parcel set-up, exact


def test_sync_in_step_cond_explicit():
    # reference api_lgrngn.py:255-270
    oi = make_opts_init()
    opts = make_opts()
    rhod = np.array([1.0]); th = np.array([300.0]); rv = np.array([0.01])
    prtcls = lgrngn.factory(lgrngn.backend_t.serial, oi)
    prtcls.init(th, rv, rhod)
    with pytest.raises(Exception):
        prtcls.step_cond(opts, th, rv)  # sync_in/cond order mismatch
    prtcls.sync_in(th, rv, rhod)
    prtcls.step_cond(opts, th, rv)
    prtcls.step_async(opts)
    prtcls.step_sync(opts, th, rv)


def test_dry_sizes_exact_multiplicities():
    # mirrors reference api_lgrngn.py:276-321: two kappas, four sizes,
    # exact SD counts and multiplicities
    kappa1, kappa2 = 0.61, 1.28
    oi = lgrngn.opts_init_t()
    oi.dry_distros = {}
    oi.dry_sizes = {
        (kappa1, 0.0): {1e-6: (30.0 * c.rho_stp, 15), 15e-6: (10.0 * c.rho_stp, 5)},
        (kappa2, 0.0): {1.25e-6: (20.0 * c.rho_stp, 10), 12.5e-6: (15.0 * c.rho_stp, 5)},
    }
    oi.coal_switch = oi.sedi_switch = False
    oi.dt = 1
    oi.n_sd_max = 64
    prtcls = lgrngn.factory(lgrngn.backend_t.serial, oi)
    rhod = np.array([1.0]); th = np.array([300.0]); rv = np.array([0.01])
    prtcls.init(th, rv, rhod)

    prtcls.diag_all()
    prtcls.diag_sd_conc()
    assert prtcls.outbuf()[0] == 35  # 15+5+10+5

    prtcls.diag_all()
    prtcls.diag_wet_mom(0)
    assert prtcls.outbuf()[0] == pytest.approx(75.0)  # 30+10+20+15

    # kappa-filtered counts (wet_mom(0) of a dry-range selection)
    for rng, expect_n, expect_k in (
        ((0.9e-6, 1.1e-6), 30.0, kappa1),
        ((1.2e-6, 1.3e-6), 20.0, kappa2),
        ((12e-6, 13e-6), 15.0, kappa2),
        ((14.9e-6, 15.1e-6), 10.0, kappa1),
    ):
        prtcls.diag_dry_rng(*rng)
        prtcls.diag_wet_mom(0)
        n = prtcls.outbuf()[0]
        prtcls.diag_kappa_mom(1)
        k = prtcls.outbuf()[0]
        assert n == pytest.approx(expect_n)
        assert k == pytest.approx(n * expect_k)


def test_wet_equilibrium_init():
    # initial wet radii at RH<1 must satisfy r_wet > r_dry and be at
    # kappa-Koehler equilibrium (init_wet.ipp:18-77)
    oi = make_opts_init()
    rhod = np.array([1.0]); th = np.array([300.0]); rv = np.array([0.005])
    prtcls = lgrngn.factory(lgrngn.backend_t.serial, oi)
    prtcls.init(th, rv, rhod)
    rd3 = prtcls.get_attr("rd3")
    rw2 = prtcls.get_attr("rw2")
    n = prtcls.get_attr("n")
    alive = n > 0
    assert np.all(rw2[alive] ** 1.5 >= rd3[alive] * 0.999)
    # multiplicity total consistent with the lognormal: ~6e7/kg / rho_stp
    prtcls.diag_all()
    prtcls.diag_dry_mom(0)
    assert prtcls.outbuf()[0] == pytest.approx(60e6 / c.rho_stp, rel=0.01)


def test_extended_diags():
    # diag_rw_ge_rc / diag_RH_ge_Sc / precip rate / max_rw / incloud time
    oi = make_opts_init(diag_incloud_time=True,
                        terminal_velocity=lgrngn.vt_t.beard77fast)
    opts = make_opts()
    rhod = np.array([1.0]); th = np.array([300.0]); rv = np.array([0.02])
    prtcls = lgrngn.factory(lgrngn.backend_t.serial, oi)
    prtcls.init(th, rv, rhod)
    for _ in range(5):
        prtcls.step_sync(opts, th, rv, rhod)
        prtcls.step_async(opts)
    # strongly supersaturated: most droplets activated
    prtcls.diag_rw_ge_rc()
    prtcls.diag_wet_mom(0)
    n_act = prtcls.outbuf()[0]
    prtcls.diag_all()
    prtcls.diag_wet_mom(0)
    n_all = prtcls.outbuf()[0]
    assert 0 < n_act <= n_all
    assert n_act > 0.5 * n_all  # most of the population activates here
    prtcls.diag_RH_ge_Sc()
    prtcls.diag_wet_mom(0)
    assert prtcls.outbuf()[0] > 0
    # activated droplets carry incloud time
    prtcls.diag_all()
    prtcls.diag_incloud_time_mom(1)
    assert prtcls.outbuf()[0] > 0
    t = prtcls.get_attr("incloud_time")
    # the update runs before condensation each step (reference
    # particles_step.ipp:180), so step 1 sees unactivated droplets
    assert t.max() == pytest.approx(4.0)
    prtcls.diag_all()
    prtcls.diag_precip_rate()
    assert np.isfinite(prtcls.outbuf()).all()
    prtcls.diag_max_rw()
    assert prtcls.outbuf()[0] > 1e-6  # grown droplets
    # diag_incloud_time_mom errors when not enabled
    oi2 = make_opts_init()
    p2 = lgrngn.factory(lgrngn.backend_t.serial, oi2)
    p2.init(np.array([1.]), np.array([300.]), np.array([1.]))


def _run_parcel(oi, nsteps=40):
    opts = make_opts()
    rhod = np.array([1.0]); th = np.array([300.0]); rv = np.array([0.02])
    prtcls = lgrngn.factory(lgrngn.backend_t.serial, oi)
    prtcls.init(th, rv, rhod)
    for _ in range(nsteps):
        prtcls.step_sync(opts, th, rv, rhod)
        prtcls.step_async(opts)
    return prtcls, th, rv


def _run_cycle(oi):
    # condense for 40 steps, then force evaporation (the substepping stress
    # test of reference lgrngn_cond.py:141-170) and return |th - th_init|
    opts = make_opts()
    rhod = np.array([1.0]); th = np.array([300.0]); rv = np.array([0.02])
    prtcls = lgrngn.factory(lgrngn.backend_t.serial, oi)
    prtcls.init(th, rv, rhod)
    th_init = th.copy()
    for _ in range(40):
        prtcls.step_sync(opts, th, rv, rhod)
        prtcls.step_async(opts)
    rv[0] = 0.002
    for _ in range(40):
        prtcls.step_sync(opts, th, rv, rhod)
        prtcls.step_async(opts)
    return abs(th[0] - th_init[0])


def test_adaptive_perparticle_substepping():
    # adaptive per-SD substepping (reference
    # perparticle_nomixing_adaptive_sstp_cond.ipp): must land close to the
    # fixed exact per-particle max-substep result...
    oi_ref = make_opts_init(sstp_cond=16, exact_sstp_cond=True)
    _, th_ref, rv_ref = _run_parcel(oi_ref)
    oi_ad = make_opts_init(
        sstp_cond=16, exact_sstp_cond=True, adaptive_sstp_cond=True,
        sstp_cond_act=16,
    )
    _, th_ad, rv_ad = _run_parcel(oi_ad)
    assert abs(rv_ad[0] - rv_ref[0]) < 2e-5
    assert abs(th_ad[0] - th_ref[0]) < 6e-3

    # ...and cut the condense+evaporate cycle theta error well below the
    # unsubstepped run's gate (reference lgrngn_cond.py:167-170: 4.2e-2 for
    # sstp=1 vs 4.2e-3 for sstp=10): adaptation must engage on the
    # evaporation shock
    err_1 = _run_cycle(make_opts_init(sstp_cond=1))
    err_ad = _run_cycle(oi_ad)
    assert err_ad < err_1 / 3
    assert err_ad < 1.2e-2

    # closure: vapour lost == liquid gained (per-cell closure of the
    # nomixing path)
    prtcls, th, rv = _run_parcel(oi_ad, nsteps=40)
    prtcls.diag_all(); prtcls.diag_wet_mom(3)
    liq = prtcls.outbuf()[0] * (4.0 / 3) * np.pi * 1e3
    assert abs((0.02 - rv[0]) - liq) < 1e-6


def test_sd_conc_large_tail_adds_sds():
    """opts_init.sd_conc_large_tail extends the population with
    multiplicity-1 SDs from the distribution tail (reference
    init_SD_with_distros_tail.ipp; oracle: api_lgrngn.py:340 asserts the
    tail run has MORE SDs)."""
    import numpy as np
    from libcloudphxx_tpu import lgrngn

    def lognormal(lnr):
        return (60e6 * np.exp(-(lnr - np.log(0.02e-6)) ** 2
                              / 2 / np.log(1.4) ** 2)
                / np.log(1.4) / np.sqrt(2 * np.pi))

    def build(tail):
        oi = lgrngn.opts_init_t()
        oi.dt = 1.0
        oi.dry_distros = {(0.61, 0.0): lognormal}
        oi.sd_conc = 64
        oi.sd_conc_large_tail = tail
        oi.n_sd_max = 512
        oi.terminal_velocity = lgrngn.vt_t.beard76
        prt = lgrngn.factory(lgrngn.backend_t.serial, oi)
        rhod = np.ones(1)
        prt.init(300.0 * np.ones(1), 0.01 * np.ones(1), rhod)
        prt.diag_all()
        prt.diag_sd_conc()
        n = prt.get_attr("n")
        return prt.outbuf()[0], n

    sd_plain, _ = build(False)
    sd_tail, n_tail = build(True)
    assert sd_plain == 64
    assert sd_tail > sd_plain
    # the tail SDs carry multiplicity 1 and large dry radii
    assert (n_tail[int(sd_plain):int(sd_tail)] == 1).all()


def test_vectorized_init_large_grid_fast():
    """const_multi / dry_sizes init must be vectorized over cells
    (the round-1 per-cell Python loop took minutes at 3-D sizes)."""
    import time

    import numpy as np
    from libcloudphxx_tpu import lgrngn

    def lognormal(lnr):
        return (60e6 * np.exp(-(lnr - np.log(0.02e-6)) ** 2
                              / 2 / np.log(1.4) ** 2)
                / np.log(1.4) / np.sqrt(2 * np.pi))

    nx = ny = nz = 32   # 32k cells
    oi = lgrngn.opts_init_t()
    oi.nx, oi.ny, oi.nz = nx, ny, nz
    oi.dx = oi.dy = oi.dz = 10.0
    oi.x1, oi.y1, oi.z1 = nx * 10.0, ny * 10.0, nz * 10.0
    oi.dt = 1.0
    oi.dry_distros = {(0.61, 0.0): lognormal}
    oi.sd_const_multi = int(2e10)
    oi.n_sd_max = 2 ** 21
    oi.terminal_velocity = lgrngn.vt_t.beard76
    oi.dry_sizes = {(0.61, 0.0): {1e-6: (1e4, 2)}}
    prt = lgrngn.factory(lgrngn.backend_t.serial, oi)
    shape = (nx, ny, nz)
    t0 = time.time()
    prt.init(np.full(shape, 300.0), np.full(shape, 0.01),
             np.full(shape, 1.1))
    elapsed = time.time() - t0
    prt.diag_all()
    prt.diag_sd_conc()
    assert prt.outbuf().min() >= 2  # dry_sizes SDs everywhere
    assert elapsed < 60, f"init took {elapsed:.0f}s — cell loop regression?"
