"""Adaptive/variable substep counts.

Covers two reference behaviors:
  - const-multi collision overflow growing the coalescence substep count
    (reference src/impl/coalescence/particles_impl_coal.ipp:224-227 +
    src/particles_step.ipp:394-400),
  - variable-dt rescaling of sstp_cond/sstp_cond_act/sstp_chem
    (reference src/impl/particles_impl_adjust_timesteps.ipp:17-21).
"""

import numpy as np
import pytest

from libcloudphxx_tpu import lgrngn

N_ZERO = 2.0**23
R_ZERO = 30.084e-6


def expvolumelnr(lnr):
    r = np.exp(lnr)
    return N_ZERO * 3.0 * r**3 / R_ZERO**3 * np.exp(-((r / R_ZERO) ** 3))


def _box(const_multi=None, sd_conc=None, dt=800.0, b=1500.0):
    oi = lgrngn.opts_init_t()
    oi.dt = dt
    oi.sstp_coal = 1
    oi.sedi_switch = False
    oi.dry_distros = {(1e-10, 0.0): expvolumelnr}
    oi.kernel = lgrngn.kernel_t.golovin
    oi.terminal_velocity = lgrngn.vt_t.beard77
    oi.kernel_parameters = [b]
    if sd_conc:
        oi.sd_conc = sd_conc
        oi.n_sd_max = sd_conc
    else:
        oi.sd_const_multi = const_multi
        oi.n_sd_max = int(N_ZERO / const_multi + 10)
    opts = lgrngn.opts_t()
    opts.adve = opts.sedi = opts.cond = opts.chem_dsl = False
    opts.coal = True
    prtcls = lgrngn.factory(lgrngn.backend_t.serial, oi)
    th = 300.0 * np.ones(1)
    rv = 0.01 * np.ones(1)
    prtcls.init(th, rv, np.ones(1))
    return prtcls, opts, th, rv


def test_increase_sstp_coal_on_const_multi_overflow():
    # const_multi=1e6 at dt=800 makes pair probabilities exceed one
    prtcls, opts, th, rv = _box(const_multi=int(1e6))
    assert prtcls.cfg.pure_const_multi
    assert prtcls._sstp_coal_extra == 0
    prtcls.step_sync(opts, th, rv, np.ones(1))
    prtcls.step_async(opts)
    assert prtcls._sstp_coal_extra >= 1
    # the next step runs with the grown substep count and can grow further
    before = prtcls._sstp_coal_extra
    prtcls.step_sync(opts, th, rv, np.ones(1))
    prtcls.step_async(opts)
    assert prtcls._sstp_coal_extra >= before


def test_no_increase_sstp_coal_in_sd_conc_mode():
    # sd_conc mode is not pure const-multi: the flag must never fire
    # (reference particles_impl.ipp:384)
    prtcls, opts, th, rv = _box(sd_conc=64)
    assert not prtcls.cfg.pure_const_multi
    prtcls.step_sync(opts, th, rv, np.ones(1))
    prtcls.step_async(opts)
    assert prtcls._sstp_coal_extra == 0


def _parcel(sstp_cond, dt, variable_dt=False):
    oi = lgrngn.opts_init_t()
    oi.dt = dt
    oi.sstp_cond = sstp_cond
    oi.sd_conc = 64
    oi.n_sd_max = 64
    oi.dry_distros = {
        (0.61, 0.0): lambda lnr: 60e6 * np.exp(
            -((lnr - np.log(0.04e-6)) ** 2) / (2 * np.log(1.4) ** 2)
        ) / (np.sqrt(2 * np.pi) * np.log(1.4))
    }
    oi.coal_switch = False
    oi.sedi_switch = False
    oi.variable_dt_switch = variable_dt
    prtcls = lgrngn.factory(lgrngn.backend_t.serial, oi)
    th = 300.0 * np.ones(1)
    rv = 0.009 * np.ones(1)
    prtcls.init(th, rv, np.ones(1))
    return prtcls, th, rv


def test_variable_dt_rescales_sstp_cond():
    # stepping with opts.dt = 2*opts_init.dt must behave exactly like a
    # config whose sstp_cond was doubled up front and whose dt matches
    # (adjust_timesteps.ipp:17-21)
    opts = lgrngn.opts_t()
    opts.adve = opts.sedi = opts.coal = opts.chem_dsl = False
    opts.cond = True

    pa, tha, rva = _parcel(sstp_cond=4, dt=0.5, variable_dt=True)
    opts_a = lgrngn.opts_t()
    opts_a.adve = opts_a.sedi = opts_a.coal = opts_a.chem_dsl = False
    opts_a.cond = True
    opts_a.dt = 1.0  # 2x the construction dt -> sstp_cond 4 -> 8
    pa.step_sync(opts_a, tha, rva, np.ones(1))
    pa.step_async(opts_a)

    pb, thb, rvb = _parcel(sstp_cond=8, dt=1.0)
    pb.step_sync(opts, thb, rvb, np.ones(1))
    pb.step_async(opts)

    np.testing.assert_allclose(tha, thb, rtol=1e-12)
    np.testing.assert_allclose(rva, rvb, rtol=1e-12)


def test_variable_dt_requires_switch():
    prtcls, th, rv = _parcel(sstp_cond=2, dt=1.0, variable_dt=False)
    opts = lgrngn.opts_t()
    opts.adve = opts.sedi = opts.coal = opts.chem_dsl = False
    opts.cond = True
    opts.dt = 2.0
    prtcls.sync_in(th=th, rv=rv, rhod=np.ones(1))
    with pytest.raises(RuntimeError, match="variable_dt"):
        prtcls.step_cond(opts, th, rv)
