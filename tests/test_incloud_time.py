"""In-cloud residence-time diagnostics with selection filters.

Port of reference tests/python/unit/diag_incloud_time.py: a 0-D parcel is
slowly pushed into supersaturation; larger/more-hygroscopic CCN activate
earlier, so their mean in-cloud time (1st/0th moment of incloud_time over
the prevailing selection filter) orders accordingly."""

from math import exp, log, pi, sqrt

import numpy as np

from libcloudphxx_tpu import lgrngn


def lognormal(lnr):
    mean_r, stdev, n_tot = 0.04e-6 / 2, 1.4, 60e6
    return (n_tot * exp(-((lnr - log(mean_r)) ** 2) / 2 / log(stdev) ** 2)
            / log(stdev) / sqrt(2 * pi))


def test_incloud_time_filtered_moments():
    oi = lgrngn.opts_init_t()
    oi.dry_distros = {(0.61, 0.0): lognormal, (1.28, 0.0): lognormal}
    oi.coal_switch = False
    oi.sedi_switch = False
    oi.RH_max = 0.999
    oi.dt = 0.1
    oi.sd_conc = 100
    oi.n_sd_max = 100
    oi.diag_incloud_time = True

    opts = lgrngn.opts_t()
    opts.adve = opts.sedi = opts.coal = opts.chem_dsl = False
    opts.cond = True

    rhod = np.array([1.0])
    th = np.array([300.0])
    rv = np.array([0.009 - 0.00005])

    prtcls = lgrngn.factory(lgrngn.backend_t.serial, oi)
    prtcls.init(th, rv, rhod)

    def mean_incloud_time():
        prtcls.diag_incloud_time_mom(1)
        m1 = prtcls.outbuf()[0]
        prtcls.diag_incloud_time_mom(0)
        m0 = prtcls.outbuf()[0]
        return m1 / m0

    for _ in range(400):
        rv[0] += 0.00001 * oi.dt
        prtcls.sync_in(th=th, rv=rv, rhod=rhod)
        prtcls.step_cond(opts, th, rv)
        prtcls.step_async(opts)

    prtcls.diag_all()
    t_all = mean_incloud_time()
    prtcls.diag_dry_rng(0, 0.02e-6)
    t_small = mean_incloud_time()
    prtcls.diag_dry_rng(0.02e-6, 1)
    t_big = mean_incloud_time()
    prtcls.diag_dry_rng(0.02e-6, 1)
    prtcls.diag_kappa_rng_cons(1, 10)
    t_big_kgt1 = mean_incloud_time()
    prtcls.diag_dry_rng(0.02e-6, 1)
    prtcls.diag_kappa_rng_cons(0, 1)
    t_big_klt1 = mean_incloud_time()

    # reference assertion chain (diag_incloud_time.py:105-108)
    assert t_small < t_all
    assert t_all < t_big
    assert t_big < t_big_kgt1
    assert t_big_klt1 < t_big
