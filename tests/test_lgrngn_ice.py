"""Ice-phase and exact-substepping SDM tests.

Oracles mirror reference tests/python/unit/ice_SD.py (freeze/melt phase
changes) and the exact_sstp_cond loops of lgrngn_cond.py.
"""

from math import exp, log, pi, sqrt

import numpy as np
import pytest

from libcloudphxx_tpu import lgrngn
from libcloudphxx_tpu.common import theta_dry


def lognormal(lnr):
    mean_r, stdev, n_tot = 0.04e-6 / 2, 1.4, 60e6
    return (
        n_tot * exp(-((lnr - log(mean_r)) ** 2) / 2 / log(stdev) ** 2)
        / log(stdev) / sqrt(2 * pi)
    )


def make_opts_init(**kw):
    oi = lgrngn.opts_init_t()
    oi.dry_distros = {(0.61, 1e-7): lognormal}  # insoluble core present
    oi.coal_switch = False
    oi.sedi_switch = False
    oi.RH_max = 0.999
    oi.dt = 1
    oi.sd_conc = 64
    oi.n_sd_max = 64
    for k, v in kw.items():
        setattr(oi, k, v)
    return oi


def make_opts(**kw):
    opts = lgrngn.opts_t()
    opts.adve = opts.sedi = opts.coal = opts.chem_dsl = False
    opts.cond = True
    for k, v in kw.items():
        setattr(opts, k, v)
    return opts


def test_singular_freezing_and_melting():
    # cold saturated cell: SDs with T_freeze >= T freeze into spheroids;
    # warming above 0 C melts them back, conserving mass
    oi = make_opts_init(ice_switch=True)
    opts = make_opts(cond=False, ice_nucl=True)
    rhod = np.array([1.2])
    th = np.array([240.0])  # very cold -> T < T_freeze for most INPs
    rv = np.array([0.002])  # saturated at these temperatures
    prtcls = lgrngn.factory(lgrngn.backend_t.serial, oi)
    prtcls.init(th, rv, rhod)

    st = prtcls.state
    Tf = np.asarray(st.T_freeze)
    alive = prtcls.get_attr("n") > 0
    assert (Tf[alive] > 200).all() and (Tf[alive] < 280).all()

    rw2_before = prtcls.get_attr("rw2").copy()
    prtcls.step_sync(opts, th, rv, rhod)
    prtcls.step_async(opts)
    st = prtcls.state
    ice_a = np.asarray(st.ice_a)
    frozen = alive & (ice_a > 0)
    assert frozen.sum() > 0  # something froze at 240 K
    # frozen SDs have no liquid and volume-conserving axes
    rw2 = prtcls.get_attr("rw2")
    assert (rw2[frozen] == 0).all()
    rw = np.sqrt(rw2_before[frozen])
    expect_axis = rw * (1000.0 / 910.0) ** (1.0 / 3)
    assert np.allclose(ice_a[frozen], expect_axis, rtol=1e-6)

    # ice diags
    prtcls.diag_ice()
    prtcls.diag_ice_a_mom(1)
    assert prtcls.outbuf()[0] > 0
    prtcls.diag_all()
    prtcls.diag_ice_mix_ratio()
    q_ice = prtcls.outbuf()[0]
    assert q_ice > 0

    # warm up -> melting returns all ice to liquid
    th[0] = 300.0
    prtcls.step_sync(opts, th, rv, rhod)
    prtcls.step_async(opts)
    st = prtcls.state
    assert (np.asarray(st.ice_a)[alive] == 0).all()
    rw2_after = prtcls.get_attr("rw2")
    # melt conserves particle volume: rho_i Vi = rho_w Vw
    assert np.allclose(
        rw2_after[frozen] ** 1.5 * 1000.0, rw2_before[frozen] ** 1.5 * 910.0,
        rtol=1e-5,
    )


@pytest.mark.parametrize("time_dep", [False, True])
def test_ice_deposition_reference_setup(time_dep):
    # mirrors reference tests/python/unit/ice_SD.py:41-62: saturated air at
    # 243 K / 800 hPa, 500 steps of 0.1 s; no NaNs, non-negative water
    from libcloudphxx_tpu.common import theta_std
    oi = make_opts_init(ice_switch=True, time_dep_ice_nucl=time_dep,
                        dt=0.1, sd_conc=100, n_sd_max=100, RH_max=0.95)
    opts = make_opts(cond=True, ice_nucl=True)
    p0, T0 = 80000.0, 243.0
    from libcloudphxx_tpu.common import const_cp
    import jax.numpy as jnp
    rv = np.array([float(const_cp.r_vs(jnp.float64(T0), jnp.float64(p0)))])
    th = np.array([T0 / float(theta_std.exner(jnp.float64(p0)))])
    rhod = np.array([float(theta_std.rhod(
        jnp.float64(p0), jnp.float64(th[0]), jnp.float64(rv[0])))])
    prtcls = lgrngn.factory(lgrngn.backend_t.serial, oi)
    prtcls.init(th, rv, rhod)
    for _ in range(500):
        prtcls.step_sync(opts, th, rv, rhod)
        prtcls.step_async(opts)
    prtcls.diag_all()
    prtcls.diag_ice_mix_ratio()
    ri = prtcls.outbuf()[0]
    assert not np.isnan(ri)
    assert not np.isnan(rv[0])
    assert rv[0] >= 0
    assert ri >= 0


@pytest.mark.parametrize("constp", [False, True])
def test_exact_sstp_parcel(constp):
    # the exact per-particle substepping path must hit the same reference
    # end-state gates as the per-cell path (lgrngn_cond.py exact_sstp loops)
    oi = lgrngn.opts_init_t()
    oi.dry_distros = {(0.61, 0.0): lognormal}
    oi.coal_switch = oi.sedi_switch = False
    oi.RH_max = 0.999
    oi.dt = 1
    oi.sd_conc = 100
    oi.n_sd_max = 100
    oi.sstp_cond = 10
    oi.exact_sstp_cond = True
    opts = make_opts()

    rhod = np.array([1.0]); th = np.array([300.0]); rv = np.array([0.02])
    T0 = float(theta_dry.T(th[0], rhod[0]))
    p = np.array([float(theta_dry.p(rhod[0], rv[0], T0))])
    if constp:
        th[0] = float(theta_dry.dry2std(th[0], rv[0]))
        oi.const_p = True
        oi.th_dry = False
    prtcls = lgrngn.factory(lgrngn.backend_t.serial, oi)
    prtcls.init(th, rv, rhod, p if constp else None)
    for _ in range(40):
        prtcls.step_sync(opts, th, rv, rhod)
        prtcls.step_async(opts)
    prtcls.diag_RH()
    ss = (prtcls.outbuf()[0] - 1) * 100
    exp_th = 306.9 if constp else 307.78
    exp_rv = 1.628e-2 if constp else 1.7e-2
    assert abs(ss) < 4.5e-3
    assert abs(th[0] - exp_th) < 1e-4 * exp_th
    assert abs(rv[0] - exp_rv) < 1e-3 * exp_rv


def test_ice_deposition_aspect_ratio_evolution():
    """Per-axis depositional growth (reference advance_ice_ac,
    cond_common.ipp:432-473: each spheroid axis advanced with its own
    rdrdt_i forward-Euler rate): in an ice-supersaturated cell both axes
    grow, the shorter axis grows faster (da/dt ~ 1/a), so a prolate
    crystal's aspect ratio c/a relaxes toward 1; rv is depleted and th
    warms by the latent heat of deposition."""
    import dataclasses

    import jax.numpy as jnp

    from libcloudphxx_tpu.common import const_cp, theta_std

    oi = make_opts_init(ice_switch=True, sstp_cond=2)
    opts = make_opts(ice_nucl=True)

    p0, T0 = 80000.0, 250.0
    rv0 = np.array([1.05 * float(const_cp.r_vs(T0, p0))])  # RH_i > 1
    th0 = np.array([T0 / float(theta_std.exner(p0))])
    rhod = np.array([float(theta_std.rhod(p0, th0[0], rv0[0]))])

    prtcls = lgrngn.factory(lgrngn.backend_t.serial, oi)
    th, rv = th0.copy(), rv0.copy()
    prtcls.init(th, rv, rhod)

    # hand-freeze every live SD into a prolate spheroid (c = 3a)
    st = prtcls.state
    live = np.asarray(st.n) > 0
    a0 = np.where(live, 2e-6, 0.0)
    c0 = np.where(live, 6e-6, 0.0)
    prtcls.state = dataclasses.replace(
        st,
        ice_a=jnp.asarray(a0), ice_c=jnp.asarray(c0),
        ice_rho=jnp.where(jnp.asarray(live), 916.8, 0.0),
        rw2=jnp.where(jnp.asarray(live), 0.0, st.rw2),
    )

    ratio0 = c0[live] / a0[live]
    for _ in range(20):
        prtcls.step_sync(opts, th, rv)
        prtcls.step_async(opts)

    a1 = np.asarray(prtcls.state.ice_a)[live]
    c1 = np.asarray(prtcls.state.ice_c)[live]
    assert (a1 > a0[live]).all(), "a axis must grow at RH_i > 1"
    assert (c1 > c0[live]).all(), "c axis must grow at RH_i > 1"
    ratio1 = c1 / a1
    assert (ratio1 < ratio0).all(), \
        "per-axis growth must relax the aspect ratio toward 1"
    assert (ratio1 > 1.0).all()
    assert rv[0] < rv0[0]   # vapour deposited
    assert th[0] > th0[0]   # latent heating
