"""SD transport tests: advection, sedimentation, subsidence, walls, puddle.

Oracles mirror reference tests/python/unit/lgrngn_adve.py (exact one-cell
shifts under uniform courant fields), lgrngn_subsidence.py, and
tests/python/physics/puddle.py (precipitation bookkeeping closure).
"""

from math import exp, log, pi, sqrt

import numpy as np
import pytest

from libcloudphxx_tpu import lgrngn


def lognormal(lnr):
    mean_r, stdev, n_tot = 0.04e-6 / 2, 1.4, 60e6
    return (
        n_tot * exp(-((lnr - log(mean_r)) ** 2) / 2 / log(stdev) ** 2)
        / log(stdev) / sqrt(2 * pi)
    )


NX, NZ = 6, 5


def make_opts_init(**kw):
    oi = lgrngn.opts_init_t()
    oi.dry_distros = {(0.61, 0.0): lognormal}
    oi.coal_switch = False
    oi.sedi_switch = False
    oi.dt = 1
    oi.nx, oi.nz = NX, NZ
    oi.dx = oi.dz = 1.0
    oi.x1, oi.z1 = float(NX), float(NZ)
    oi.sd_conc = 10
    oi.n_sd_max = 10 * NX * NZ
    for k, v in kw.items():
        setattr(oi, k, v)
    return oi


def make_opts(**kw):
    opts = lgrngn.opts_t()
    opts.adve = True
    opts.sedi = opts.cond = opts.coal = opts.chem_dsl = False
    for k, v in kw.items():
        setattr(opts, k, v)
    return opts


def grid_fields():
    rhod = 1.0 * np.ones((NX, NZ))
    th = 300.0 * np.ones((NX, NZ))
    rv = 0.01 * np.ones((NX, NZ))
    return rhod, th, rv


def advection_1step(Cx_val, Cz_val, scheme=lgrngn.as_t.implicit):
    oi = make_opts_init(adve_scheme=scheme)
    opts = make_opts()
    rhod, th, rv = grid_fields()
    prtcls = lgrngn.factory(lgrngn.backend_t.serial, oi)
    Cx = Cx_val * np.ones((NX + 1, NZ))
    Cz = Cz_val * np.ones((NX, NZ + 1))
    prtcls.init(th, rv, rhod, Cx=Cx, Cz=Cz)

    prtcls.step_sync(opts, th, rv, rhod)
    prtcls.diag_all()
    prtcls.diag_sd_conc()
    tab_in = prtcls.outbuf().reshape(NX, NZ).copy()
    prtcls.step_async(opts)
    prtcls.step_sync(opts, th, rv, rhod)
    prtcls.diag_all()
    prtcls.diag_sd_conc()
    tab_out = prtcls.outbuf().reshape(NX, NZ).copy()
    return tab_in, tab_out


@pytest.mark.parametrize("scheme", [lgrngn.as_t.implicit, lgrngn.as_t.euler,
                                    lgrngn.as_t.pred_corr])
@pytest.mark.parametrize("Cx,roll_st", [(1.0, -1), (-1.0, 1)])
def test_advection_x_shift(Cx, roll_st, scheme):
    # reference lgrngn_adve.py:100-120: C=1 moves every SD exactly one cell,
    # periodic in x
    tab_in, tab_out = advection_1step(Cx, 0.0, scheme)
    assert tab_in.sum() == NX * NZ * 10
    assert (tab_in == np.roll(tab_out, roll_st, 0)).all()


def test_advection_conserves_sd_count():
    tab_in, tab_out = advection_1step(0.37, 0.0)
    assert tab_in.sum() == tab_out.sum()


def test_sedimentation_puddle_closure():
    # all droplets fall out of a shallow domain; the puddle must hold the
    # exact totals (reference puddle.py semantics)
    oi = make_opts_init(sedi_switch=True,
                        terminal_velocity=lgrngn.vt_t.beard77fast)
    opts = make_opts(adve=False, sedi=True)
    rhod, th, rv = grid_fields()
    prtcls = lgrngn.factory(lgrngn.backend_t.serial, oi)
    prtcls.init(th, rv, rhod)

    n0 = prtcls.get_attr("n").copy()
    rw2_0 = prtcls.get_attr("rw2").copy()
    rd3_0 = prtcls.get_attr("rd3").copy()
    tot_num = n0.sum()
    tot_liq_vol = (4.0 / 3 * np.pi * n0 * rw2_0**1.5).sum()
    tot_dry_vol = (4.0 / 3 * np.pi * n0 * rd3_0).sum()

    # force every SD below the domain in one step: make vt large by growing
    # them is fiddly, so instead run many steps
    for _ in range(10000):
        prtcls.step_sync(opts, th, rv, rhod)
        prtcls.step_async(opts)
        if prtcls.get_attr("n").sum() == 0:
            break

    puddle = prtcls.diag_puddle()
    remaining = prtcls.get_attr("n")
    rw2_r = prtcls.get_attr("rw2")
    rd3_r = prtcls.get_attr("rd3")
    # closure: what's in the puddle + what's still airborne == initial totals
    assert puddle["particle_number"] + remaining.sum() == pytest.approx(tot_num)
    assert puddle["liquid_volume"] + (4/3*np.pi*remaining*rw2_r**1.5).sum() == \
        pytest.approx(tot_liq_vol, rel=1e-12)
    assert puddle["dry_volume"] + (4/3*np.pi*remaining*rd3_r).sum() == \
        pytest.approx(tot_dry_vol, rel=1e-12)
    # at least some droplets must have fallen out after 10000 s
    assert puddle["particle_number"] > 0


def test_subsidence_shifts_down():
    # reference lgrngn_subsidence.py: uniform downward w_LS moves SDs down
    oi = make_opts_init(subs_switch=True, w_LS=[0.5] * NZ)
    opts = make_opts(adve=False, subs=True)
    rhod, th, rv = grid_fields()
    prtcls = lgrngn.factory(lgrngn.backend_t.serial, oi)
    prtcls.init(th, rv, rhod)
    z0 = prtcls.get_attr("z").copy()
    prtcls.step_sync(opts, th, rv, rhod)
    prtcls.step_async(opts)
    z1 = prtcls.get_attr("z")
    alive = prtcls.get_attr("n") > 0
    assert np.allclose(z1[alive], z0[alive] - 0.5)


def test_open_side_walls_remove():
    oi = make_opts_init(open_side_walls=True)
    opts = make_opts()
    rhod, th, rv = grid_fields()
    prtcls = lgrngn.factory(lgrngn.backend_t.serial, oi)
    Cx = 1.0 * np.ones((NX + 1, NZ))
    Cz = 0.0 * np.ones((NX, NZ + 1))
    prtcls.init(th, rv, rhod, Cx=Cx, Cz=Cz)
    n_before = prtcls.get_attr("n").sum()
    prtcls.step_sync(opts, th, rv, rhod)
    prtcls.step_async(opts)
    n_after = prtcls.get_attr("n").sum()
    # the rightmost column left the domain and was removed
    assert n_after < n_before
    prtcls.diag_all()
    prtcls.diag_sd_conc()
    tab = prtcls.outbuf().reshape(NX, NZ)
    assert (tab[0, :] == 0).all()  # nothing wrapped around


def test_sgs_turbulence():
    # GA17 SGS: velocity perturbations develop with sane magnitudes and
    # displace SDs; turb_cond perturbs supersaturation per SD
    oi = make_opts_init(turb_adve_switch=True, turb_cond_switch=True,
                        SGS_mix_len=[50.0] * NZ)
    opts = make_opts(adve=False, turb_adve=True, turb_cond=True, cond=True)
    rhod, th, rv = grid_fields()
    prtcls = lgrngn.factory(lgrngn.backend_t.serial, oi)
    prtcls.init(th, rv, rhod)
    x0 = prtcls.get_attr("x").copy()
    diss = 1e-3 * np.ones((NX, NZ))  # typical cloud dissipation rate
    for _ in range(5):
        prtcls.step_sync(opts, th, rv, rhod, diss_rate=diss)
        prtcls.step_async(opts)
    st = prtcls.state
    up = np.asarray(st.up)
    alive = prtcls.get_attr("n") > 0
    # TKE = (50*1e-3/0.845)^(2/3) ~ 0.15 m2/s2 -> u' ~ sqrt(2/3*TKE) ~ 0.3
    assert 0.01 < np.abs(up[alive]).mean() < 1.0
    assert not np.allclose(prtcls.get_attr("x")[alive], x0[alive])
    ssp = np.asarray(st.ssp)
    assert np.isfinite(ssp).all()
    assert np.abs(ssp[alive]).max() > 0


@pytest.mark.parametrize("src_type", ["simple", "matching"])
def test_aerosol_source(src_type):
    # mirrors reference tests/python/unit/source.py: in 100 steps with
    # supstp=50, two source calls double the droplet concentration in the
    # source-box cells
    from math import exp, log, sqrt, pi as PI

    def lognormal_init(lnr):
        return 60e6 * exp(-(lnr - log(0.02e-6))**2 / 2 / log(1.4)**2) \
            / log(1.4) / sqrt(2 * PI)

    def lognormal_src(lnr):
        return 60e4 * exp(-(lnr - log(0.05e-6))**2 / 2 / log(1.4)**2) \
            / log(1.4) / sqrt(2 * PI)

    oi = lgrngn.opts_init_t()
    oi.dt = 1
    oi.nx = oi.nz = 2
    oi.dx = oi.dz = 1.0
    oi.x1 = oi.z1 = 2.0
    oi.src_z0, oi.src_z1 = 0.0, 1.0   # lower cells only
    oi.src_x0, oi.src_x1 = 0.0, 2.0
    oi.coal_switch = oi.sedi_switch = False
    oi.dry_distros = {(0.61, 0.5e-6): lognormal_init}
    oi.sd_conc = 256
    src_sd_conc, supstp = 128, 50
    oi.n_sd_max = (256 * 2 + 128 * 2) * 2
    oi.src_type = getattr(lgrngn.src_t, src_type)

    opts = lgrngn.opts_t()
    opts.adve = opts.sedi = opts.coal = opts.cond = opts.chem_dsl = False
    opts.src = True
    opts.src_dry_distros = {
        (0.61, 0.5e-6): (lognormal_src, src_sd_conc, supstp)}

    rhod = np.ones((2, 2)); th = 300.0*np.ones((2, 2))
    rv = 0.01*np.ones((2, 2))
    prtcls = lgrngn.factory(lgrngn.backend_t.serial, oi)
    prtcls.init(th, rv, rhod)
    for _ in range(100):
        prtcls.step_sync(opts, th, rv, rhod)
        prtcls.step_async(opts)

    prtcls.diag_all()
    prtcls.diag_sd_conc()
    sd = prtcls.outbuf().copy()
    prtcls.diag_all()
    prtcls.diag_wet_mom(0)
    mom0 = prtcls.outbuf().copy()
    # cells ordered (i*nz + k): 0 and 2 are the lower (source) cells
    assert sd[1] == 256 and sd[3] == 256  # no SDs added outside the box
    if src_type == "simple":
        assert sd[0] == 256 + 2 * src_sd_conc
        assert sd[2] == 256 + 2 * src_sd_conc
    else:
        assert 256 < sd[0] <= 256 + 2 * src_sd_conc
    # concentration doubled in the source cells (source.py gate 1.5%)
    ratio = (mom0[0] + mom0[2]) / (mom0[1] + mom0[3])
    assert abs(ratio - 2.0) < 0.03


def test_ccn_relaxation():
    # mirrors reference tests/python/unit/relax.py: relaxation towards a
    # doubled-concentration profile creates SDs in the prescribed z range
    from math import exp, log, sqrt, pi as PI

    def lognormal(lnr):
        return 60e6 * exp(-(lnr - log(0.02e-6))**2 / 2 / log(1.4)**2) \
            / log(1.4) / sqrt(2 * PI)

    def lognormal_rlx(lnr):
        return 120e6 * exp(-(lnr - log(0.02e-6))**2 / 2 / log(1.4)**2) \
            / log(1.4) / sqrt(2 * PI)

    oi = lgrngn.opts_init_t()
    oi.dt = 1
    oi.nx = oi.nz = 2
    oi.dx = oi.dz = 1.0
    oi.x1 = oi.z1 = 2.0
    oi.coal_switch = oi.sedi_switch = False
    oi.aerosol_independent_of_rhod = True
    oi.dry_distros = {(0.61, 0.0): lognormal}
    oi.sd_conc = 128
    oi.n_sd_max = 4096
    oi.rlx_switch = True
    oi.supstp_rlx = 2
    oi.rlx_bins = 64
    oi.rlx_sd_per_bin = 1
    oi.rlx_timescale = 1.0   # instant restoring
    # relax only in the lower level, same kappa
    oi.rlx_dry_distros = {0.61: (lognormal_rlx, (0.0, 2.0), (0.0, 1.0))}

    opts = lgrngn.opts_t()
    opts.adve = opts.sedi = opts.coal = opts.cond = opts.chem_dsl = False
    opts.rlx = True

    rhod = np.ones((2, 2)); th = 300.0*np.ones((2, 2)); rv = 0.01*np.ones((2, 2))
    prtcls = lgrngn.factory(lgrngn.backend_t.serial, oi)
    prtcls.init(th, rv, rhod)
    prtcls.diag_all(); prtcls.diag_wet_mom(0)
    mom0_before = prtcls.outbuf().copy()
    for _ in range(4):
        prtcls.step_sync(opts, th, rv, rhod)
        prtcls.step_async(opts)
    prtcls.diag_all(); prtcls.diag_wet_mom(0)
    mom0_after = prtcls.outbuf().copy()
    # lower cells (k=0): concentration restored towards the doubled profile
    low = mom0_after[0] + mom0_after[2]
    low_before = mom0_before[0] + mom0_before[2]
    assert low > 1.5 * low_before
    # upper cells untouched
    assert mom0_after[1] == pytest.approx(mom0_before[1])
    assert mom0_after[3] == pytest.approx(mom0_before[3])


def test_aerosol_conc_factor_profile():
    """aerosol_conc_factor scales the initial SD multiplicity per z level
    (reference particles_impl_init_n.ipp:100-110, init_count_num.ipp:65-70;
    requires aerosol_independent_of_rhod, init_sanity_check.ipp:119-127)."""
    factor = [1.0, 0.5, 2.0, 0.0, 1.0]
    oi = make_opts_init(aerosol_independent_of_rhod=True,
                        aerosol_conc_factor=factor, sd_conc=64,
                        n_sd_max=64 * NX * NZ)
    rhod, th, rv = grid_fields()
    prtcls = lgrngn.factory(lgrngn.backend_t.serial, oi)
    prtcls.init(th, rv, rhod)
    prtcls.diag_all()
    prtcls.diag_wet_mom(0)
    mom0 = prtcls.outbuf().reshape(NX, NZ)

    oi2 = make_opts_init(aerosol_independent_of_rhod=True, sd_conc=64,
                         n_sd_max=64 * NX * NZ)
    prtcls2 = lgrngn.factory(lgrngn.backend_t.serial, oi2)
    prtcls2.init(th, rv, rhod)
    prtcls2.diag_all()
    prtcls2.diag_wet_mom(0)
    base = prtcls2.outbuf().reshape(NX, NZ)

    # per-level concentration ratio tracks the profile (multiplicity
    # rounding gives a few-percent sampling scatter at sd_conc=64)
    for k, f in enumerate(factor):
        if f == 0.0:
            assert np.all(mom0[:, k] == 0.0)
        else:
            ratio = mom0[:, k].mean() / base[:, k].mean()
            assert abs(ratio - f) < 0.05 * max(f, 1.0), (k, f, ratio)


def test_aerosol_conc_factor_sanity():
    rhod, th, rv = grid_fields()
    # wrong size
    oi = make_opts_init(aerosol_independent_of_rhod=True,
                        aerosol_conc_factor=[1.0, 2.0])
    prtcls = lgrngn.factory(lgrngn.backend_t.serial, oi)
    with pytest.raises(RuntimeError, match="aerosol_conc_factor size"):
        prtcls.init(th, rv, rhod)
    # requires aerosol_independent_of_rhod
    oi = make_opts_init(aerosol_conc_factor=[1.0] * NZ)
    prtcls = lgrngn.factory(lgrngn.backend_t.serial, oi)
    with pytest.raises(RuntimeError, match="independent_of_rhod"):
        prtcls.init(th, rv, rhod)


def test_source_y_bounds_3d():
    """src_y0/src_y1 bound the source box along y in 3-D
    (reference opts_init.hpp:158)."""
    from math import exp, log, sqrt, pi as PI

    def lognormal_src(lnr):
        return 60e4 * exp(-(lnr - log(0.05e-6))**2 / 2 / log(1.4)**2) \
            / log(1.4) / sqrt(2 * PI)

    n = 2
    oi = lgrngn.opts_init_t()
    oi.dt = 1
    oi.nx = oi.ny = oi.nz = n
    oi.dx = oi.dy = oi.dz = 1.0
    oi.x1 = oi.y1 = oi.z1 = float(n)
    oi.coal_switch = oi.sedi_switch = False
    oi.dry_distros = {(0.61, 0.0): lognormal}
    oi.sd_conc = 32
    oi.n_sd_max = 32 * n**3 + 16 * n**3
    oi.src_type = lgrngn.src_t.simple
    oi.src_x0, oi.src_x1 = 0.0, float(n)
    oi.src_z0, oi.src_z1 = 0.0, float(n)
    oi.src_y0, oi.src_y1 = 0.0, 1.0          # first y slab only

    opts = lgrngn.opts_t()
    opts.adve = opts.sedi = opts.coal = opts.cond = opts.chem_dsl = False
    opts.src = True
    opts.src_dry_distros = {(0.61, 0.0): (lognormal_src, 8, 1)}

    rhod = np.ones((n, n, n))
    th = 300.0 * np.ones((n, n, n))
    rv = 0.01 * np.ones((n, n, n))
    prtcls = lgrngn.factory(lgrngn.backend_t.serial, oi)
    prtcls.init(th, rv, rhod)
    prtcls.step_sync(opts, th, rv, rhod)
    prtcls.step_async(opts)
    prtcls.diag_all()
    prtcls.diag_sd_conc()
    sd = prtcls.outbuf().reshape(n, n, n)
    # SDs added only in j == 0 cells ((i*ny + j)*nz + k ravel)
    assert np.all(sd[:, 0, :] == 32 + 8)
    assert np.all(sd[:, 1, :] == 32)
