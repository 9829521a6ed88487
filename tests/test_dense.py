"""Dense cell-major engine vs flat engine equivalence gates.

The dense backend (lgrngn/dense.py) re-lays-out the SD population as a
(n_cell, cap) occupancy matrix; these tests pin it to the flat engine at
f64 on CPU:

  - pack/unpack round-trips the population exactly,
  - the condensation phase reproduces the flat percell path bit-tight
    (same physics functions; only the per-cell summation order differs),
  - coalescence conserves water volume / dry volume / pairs-monotone
    multiplicity, and matches the flat engine statistically,
  - a multi-step no-coalescence run matches the flat fused run closely
    (deterministic pipeline), and a with-coalescence run stays physical.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libcloudphxx_tpu.lgrngn import dense as dense_mod
from libcloudphxx_tpu.lgrngn.enums import kernel_t
from libcloudphxx_tpu.lgrngn.particles import (_step_async_jit,
                                               _step_cond_jit)
from libcloudphxx_tpu.lgrngn.state import StaticConfig
from libcloudphxx_tpu.models import Kinematic2D


def _model(nx=20, nz=20, sd_conc=32, **kw):
    return Kinematic2D(nx=nx, nz=nz, micro="lgrngn", sd_conc=sd_conc,
                       sstp_cond=kw.pop("sstp_cond", 3),
                       sstp_coal=kw.pop("sstp_coal", 2),
                       n_sd_max=sd_conc * nx * nz, **kw)


def _alive_multiset(n, ijk, *attrs):
    """Sorted (cell, attr...) rows of the alive population, for
    order-independent comparison."""
    n = np.asarray(n)
    alive = n > 0
    cols = [np.asarray(ijk)[alive], n[alive]] + [
        np.asarray(a)[alive] for a in attrs]
    order = np.lexsort(cols[::-1])
    return np.stack([c[order] for c in cols], axis=1)


def _dense_multiset(d, cfg, *attr_names):
    n = np.asarray(d.n).reshape(-1)
    ijk = np.repeat(np.arange(cfg.n_cell), d.cap)
    attrs = [np.asarray(getattr(d, a)).reshape(-1) for a in attr_names]
    return _alive_multiset(n, ijk, *attrs)


def test_pack_unpack_roundtrip():
    m = _model()
    p = m.prtcls
    cfg = p.cfg
    st = p.state
    cap = m.dense_capacity()
    d = dense_mod.pack(cfg, st, cap)
    assert float(d.overflow) == 0.0

    ref = _alive_multiset(st.n, st.ijk, st.rw2, st.rd3, st.kpa, st.x, st.z)
    got = _dense_multiset(d, cfg, "rw2", "rd3", "kpa", "x", "z")
    np.testing.assert_array_equal(ref, got)

    st2 = dense_mod.unpack(cfg, d, st)
    got2 = _alive_multiset(st2.n, st2.ijk, st2.rw2, st2.rd3, st2.kpa,
                           st2.x, st2.z)
    np.testing.assert_array_equal(ref, got2)
    np.testing.assert_allclose(np.asarray(st2.th), np.asarray(st.th))


def test_cond_matches_flat_engine():
    m = _model()
    p = m.prtcls
    cfg = p.cfg
    st = p.state
    dt = m.setup.dt
    cap = m.dense_capacity()

    # perturb th/rv as an advection step would, so the sstp delta is real
    key = jax.random.PRNGKey(7)
    th_new = st.th * (1.0 + 1e-4 * jax.random.normal(key, st.th.shape))
    rv_new = st.rv * (1.0 + 1e-3 * jax.random.uniform(key, st.rv.shape))

    flat = _step_cond_jit(
        cfg, dataclasses.replace(st, th=th_new, rv=rv_new),
        dt, 44.0, False, False, True)

    d = dense_mod.pack(cfg, st, cap)
    d2, th_d, rv_d = dense_mod.step_cond(cfg, d, th_new, rv_new, dt, 44.0)

    np.testing.assert_allclose(np.asarray(th_d), np.asarray(flat.th),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(rv_d), np.asarray(flat.rv),
                               rtol=1e-9)
    ref = _alive_multiset(flat.n, flat.ijk, flat.rw2)
    got = _dense_multiset(d2, cfg, "rw2")
    np.testing.assert_allclose(ref, got, rtol=1e-12)


def test_coal_conservation_and_stats():
    m = _model(sstp_coal=1)
    p = m.prtcls
    cfg = p.cfg
    # grow droplets so collisions actually happen
    st = dataclasses.replace(
        p.state, rw2=p.state.rw2 * 400.0,
        key=jax.random.PRNGKey(3))
    st = _step_cond_jit(cfg, st, 0.0, 44.0, False, False, False)  # Tpr only
    cap = m.dense_capacity()
    d = dense_mod.pack(cfg, st, cap)

    params = jnp.zeros((0,))  # plain geometric kernel, no multiplier
    dt = 50.0

    wat0 = float(jnp.sum(d.n * d.rw2 * jnp.sqrt(d.rw2)))
    dry0 = float(jnp.sum(d.n * d.rd3))
    mult0 = float(jnp.sum(d.n))

    cfg_g = dataclasses.replace(cfg, kernel=kernel_t.geometric.value)
    d2 = dense_mod.coal(cfg_g, d, params, dt, 10)

    wat1 = float(jnp.sum(d2.n * d2.rw2 * jnp.sqrt(d2.rw2)))
    dry1 = float(jnp.sum(d2.n * d2.rd3))
    mult1 = float(jnp.sum(d2.n))
    assert wat1 == pytest.approx(wat0, rel=1e-10)
    assert dry1 == pytest.approx(dry0, rel=1e-10)
    assert mult1 < mult0  # collisions happened
    # alive count unchanged (all-or-nothing keeps both SDs)
    assert int(jnp.sum(d2.n > 0)) == int(jnp.sum(d.n > 0))

    # statistical match vs the flat engine on the mean-radius shift
    sw = (True, False, False, False, False, False, False, False)
    w_LS = jnp.zeros(cfg.nz)
    sgs = jnp.full(cfg.nz, cfg.dz)
    cfg_dt = dataclasses.replace(cfg_g, dt=dt)
    flat = _step_async_jit(cfg_dt, 10, sw, st, params, w_LS, sgs, dt)
    mean_r_flat = float(jnp.sum(flat.n * jnp.sqrt(flat.rw2))
                        / jnp.sum(flat.n))
    mean_r_dense = float(jnp.sum(d2.n * jnp.sqrt(d2.rw2)) / jnp.sum(d2.n))
    assert mean_r_dense == pytest.approx(mean_r_flat, rel=0.05)


def test_full_run_matches_flat_no_coal():
    # deterministic pipeline (coalescence off, sedimentation on): flat and
    # dense fused runs must agree closely over many steps
    kw = dict(nx=16, nz=16, sd_conc=24, sstp_cond=3)
    ma = _model(**kw)
    mb = _model(**kw)
    for m in (ma, mb):
        oi = m.prtcls.opts_init
        oi.coal_switch = False
        m.prtcls.cfg = StaticConfig.from_opts_init(oi)
    ma.run_device_lgrngn(10, spinup=5)
    mb.run_device_lgrngn(10, spinup=5, engine="dense")
    np.testing.assert_allclose(mb.th, ma.th, rtol=1e-9)
    np.testing.assert_allclose(mb.rv, ma.rv, rtol=1e-7)

    sa, sb = ma.prtcls.state, mb.prtcls.state
    ref = _alive_multiset(sa.n, sa.ijk, sa.rw2, sa.x, sa.z)
    got = _alive_multiset(sb.n, sb.ijk, sb.rw2, sb.x, sb.z)
    assert ref.shape == got.shape
    np.testing.assert_allclose(got, ref, rtol=1e-7, atol=1e-12)
    # puddle bookkeeping agrees
    np.testing.assert_allclose(np.asarray(sb.puddle), np.asarray(sa.puddle),
                               rtol=1e-9, atol=1e-300)


@pytest.mark.slow
def test_full_run_dense_with_coal_physical():
    m = _model(nx=16, nz=16, sd_conc=24, sstp_cond=2, sstp_coal=2)
    m.run_device_lgrngn(20, spinup=10, engine="dense")
    assert np.isfinite(m.th).all() and np.isfinite(m.rv).all()
    assert m.rv.min() >= 0
    st = m.prtcls.state
    assert float(jnp.sum(st.n)) > 0
    # diag surface still works after a dense run
    m.prtcls.diag_wet_rng(0.5e-6, 25e-6)
    m.prtcls.diag_wet_mom(3)
    rc = m.prtcls.outbuf()
    assert np.isfinite(rc).all()


def test_rebin_neighbor_matches_global():
    """The CFL-bounded neighbour rebin must redistribute exactly like the
    global-sort rebin (same per-row multisets) after a real transport step,
    including x-periodic wraparound rows."""
    m = _model(nx=12, nz=10, sd_conc=24)
    p = m.prtcls
    cfg = p.cfg
    cap = m.dense_capacity()
    d = dense_mod.pack(cfg, p.state, cap)
    # give the population spread-out velocities: a transport step with the
    # model's courant field plus sedimentation
    # bounded vt: advection (|C| < 0.6) + sedi (< 0.4 dz) < one cell/step,
    # the CFL regime the neighbour path covers (direct call skips the
    # production fallback guard)
    d = dataclasses.replace(
        d, vt=jax.random.uniform(jax.random.PRNGKey(0), d.vt.shape)
        * 0.4 * cfg.dz)
    d = dense_mod.adve_sedi_bcnd(cfg, d, m.setup.dt, True)

    tgt = dense_mod.hskpng.ijk_of_xyz(cfg, d.x, d.x, d.z).astype(jnp.int32)
    tgt = jnp.where(d.n > 0, tgt, cfg.n_cell)
    g = dense_mod._rebin_global(cfg, d, tgt)
    nb = dense_mod._rebin_neighbor(cfg, d, tgt)
    np.testing.assert_array_equal(
        _dense_multiset(g, cfg, "rw2", "rd3", "kpa", "x", "z"),
        _dense_multiset(nb, cfg, "rw2", "rd3", "kpa", "x", "z"))
    assert float(nb.overflow) == float(g.overflow)

    # rows actually changed (the step moved SDs between cells)
    assert not np.array_equal(np.asarray(d.n), np.asarray(nb.n))


def test_rebin_fallback_on_long_jump():
    """An SD moving more than one cell per axis (huge vt) must still land in
    the right row — the lax.cond fallback to the global path."""
    m = _model(nx=12, nz=10, sd_conc=8)
    p = m.prtcls
    cfg = p.cfg
    cap = m.dense_capacity()
    d = dense_mod.pack(cfg, p.state, cap)
    d = dataclasses.replace(
        d, vt=jnp.full(d.vt.shape, 3.5 * cfg.dz))  # 3-4 cells down per step
    d = dense_mod.adve_sedi_bcnd(cfg, d, m.setup.dt, True)
    out = dense_mod.rebin(cfg, d)
    # every alive SD sits in the row of its position
    n = np.asarray(out.n).reshape(-1)
    alive = n > 0
    rows = np.repeat(np.arange(cfg.n_cell), cap)
    x = np.asarray(out.x).reshape(-1)
    z = np.asarray(out.z).reshape(-1)
    want = np.asarray(dense_mod.hskpng.ijk_of_xyz(
        cfg, jnp.asarray(x), jnp.asarray(x), jnp.asarray(z)))
    np.testing.assert_array_equal(rows[alive], want[alive])


def test_repack_roundtrip_grow_and_shrink():
    """Occupancy-aware repack (the sustained-run capacity policy,
    run_device_lgrngn repack_every) preserves the alive population
    exactly through a grow and a shrink, and counts overflow loudly when
    the target capacity cannot hold a row."""
    m = _model(nx=10, nz=10, sd_conc=16)
    p = m.prtcls
    cfg = p.cfg
    cap = m.dense_capacity()
    d = dense_mod.pack(cfg, p.state, cap)
    ref = _dense_multiset(d, cfg, "rw2", "rd3", "kpa", "x", "z")

    up = dense_mod.repack(cfg, d, cap * 2)
    assert up.cap == cap * 2 and float(up.overflow) == 0.0
    np.testing.assert_array_equal(
        ref, _dense_multiset(up, cfg, "rw2", "rd3", "kpa", "x", "z"))

    occ = int(np.max(np.sum(np.asarray(d.n) > 0, axis=1)))
    tight = max(8, -(-occ // 8) * 8)
    down = dense_mod.repack(cfg, up, tight)
    assert down.cap == tight and float(down.overflow) == 0.0
    np.testing.assert_array_equal(
        ref, _dense_multiset(down, cfg, "rw2", "rd3", "kpa", "x", "z"))

    # a capacity below the densest row must overflow (and say so)
    if occ > 8:
        lossy = dense_mod.repack(cfg, up, 8)
        assert float(lossy.overflow) > 0.0


@pytest.mark.parametrize("mix", [True, False])
def test_cond_exact_matches_flat_engine(mix):
    """Exact (per-particle) substepping on the dense layout vs the flat
    cond_perparticle at f64 — both mixing variants."""
    m = _model(sstp_cond=3, opts_init_kw=dict(exact_sstp_cond=True,
                                              sstp_cond_mix=mix))
    p = m.prtcls
    cfg = p.cfg
    st = p.state
    assert cfg.exact_sstp_cond and cfg.sstp_cond_mix == mix
    dt = m.setup.dt
    cap = m.dense_capacity()

    key = jax.random.PRNGKey(7)
    th_new = st.th * (1.0 + 1e-4 * jax.random.normal(key, st.th.shape))
    rv_new = st.rv * (1.0 + 1e-3 * jax.random.uniform(key, st.rv.shape))

    flat = _step_cond_jit(
        cfg, dataclasses.replace(st, th=th_new, rv=rv_new),
        dt, 44.0, False, False, True)

    d = dense_mod.pack(cfg, st, cap)
    assert d.sd_th.shape == d.n.shape  # exact-mode planes packed
    d2, th_d, rv_d = dense_mod.step_cond(cfg, d, th_new, rv_new, dt, 44.0)

    np.testing.assert_allclose(np.asarray(th_d), np.asarray(flat.th),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(rv_d), np.asarray(flat.rv),
                               rtol=1e-9)
    ref = _alive_multiset(flat.n, flat.ijk, flat.rw2, flat.sstp_tmp_rv)
    got = _dense_multiset(d2, cfg, "rw2", "sd_rv")
    np.testing.assert_allclose(ref, got, rtol=1e-12)

    # the private planes survive a full unpack round trip
    st2 = dense_mod.unpack(cfg, d2, st)
    ref2 = _alive_multiset(flat.n, flat.ijk, flat.sstp_tmp_th,
                           flat.sstp_tmp_rh)
    got2 = _alive_multiset(st2.n, st2.ijk, st2.sstp_tmp_th,
                           st2.sstp_tmp_rh)
    np.testing.assert_allclose(ref2, got2, rtol=1e-12)


def test_cond_adaptive_matches_flat_engine():
    """Adaptive per-SD substepping on the dense layout vs the flat
    cond_perparticle_adaptive at f64 — the dense engine feeds raveled
    planes through the SAME perparticle_adaptive_core, so parity must be
    exact up to the layout-specific reductions."""
    m = _model(sstp_cond=4, opts_init_kw=dict(
        exact_sstp_cond=True, adaptive_sstp_cond=True, sstp_cond_act=8))
    p = m.prtcls
    cfg = p.cfg
    st = p.state
    assert cfg.adaptive_sstp_cond
    dt = m.setup.dt
    cap = m.dense_capacity()

    key = jax.random.PRNGKey(11)
    th_new = st.th * (1.0 + 1e-4 * jax.random.normal(key, st.th.shape))
    rv_new = st.rv * (1.0 + 1e-3 * jax.random.uniform(key, st.rv.shape))

    flat = _step_cond_jit(
        cfg, dataclasses.replace(st, th=th_new, rv=rv_new),
        dt, 44.0, False, False, True)

    d = dense_mod.pack(cfg, st, cap)
    d2, th_d, rv_d = dense_mod.step_cond(cfg, d, th_new, rv_new, dt, 44.0)

    np.testing.assert_allclose(np.asarray(th_d), np.asarray(flat.th),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(rv_d), np.asarray(flat.rv),
                               rtol=1e-9)
    ref = _alive_multiset(flat.n, flat.ijk, flat.rw2, flat.sstp_tmp_rv)
    got = _dense_multiset(d2, cfg, "rw2", "sd_rv")
    np.testing.assert_allclose(ref, got, rtol=1e-12)


def test_adaptive_full_run_matches_flat_no_coal():
    """Multi-step adaptive run (cond + transport + re-binning, no
    coalescence) dense vs flat."""
    m = _model(nx=10, nz=10, sd_conc=16, sstp_cond=4,
               opts_init_kw=dict(exact_sstp_cond=True,
                                 adaptive_sstp_cond=True,
                                 coal_switch=False))
    mf = _model(nx=10, nz=10, sd_conc=16, sstp_cond=4,
                opts_init_kw=dict(exact_sstp_cond=True,
                                  adaptive_sstp_cond=True,
                                  coal_switch=False))
    mf.run_device_lgrngn(5, engine="flat")
    m.run_device_lgrngn(5, engine="dense")

    st_f, st_d = mf.prtcls.state, m.prtcls.state
    np.testing.assert_allclose(np.asarray(m.th), np.asarray(mf.th),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(m.rv), np.asarray(mf.rv),
                               rtol=1e-8)
    ref = _alive_multiset(st_f.n, st_f.ijk, st_f.rw2, st_f.x, st_f.z,
                          st_f.sstp_tmp_th)
    got = _alive_multiset(st_d.n, st_d.ijk, st_d.rw2, st_d.x, st_d.z,
                          st_d.sstp_tmp_th)
    np.testing.assert_allclose(ref, got, rtol=1e-10)


def test_exact_full_run_matches_flat_no_coal():
    """Multi-step exact-substepping run (cond + transport + re-binning,
    no coalescence) dense vs flat — the moved-SD snapshots must ride the
    re-binning like the reference's migration payload."""
    m = _model(nx=10, nz=10, sd_conc=16, sstp_cond=2,
               opts_init_kw=dict(exact_sstp_cond=True, coal_switch=False))
    p = m.prtcls
    cfg = p.cfg
    cap = m.dense_capacity()

    mf = _model(nx=10, nz=10, sd_conc=16, sstp_cond=2,
                opts_init_kw=dict(exact_sstp_cond=True, coal_switch=False))
    mf.run_device_lgrngn(5, engine="flat")
    m.run_device_lgrngn(5, engine="dense")

    st_f, st_d = mf.prtcls.state, m.prtcls.state
    np.testing.assert_allclose(np.asarray(m.th), np.asarray(mf.th),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(m.rv), np.asarray(mf.rv),
                               rtol=1e-8)
    ref = _alive_multiset(st_f.n, st_f.ijk, st_f.rw2, st_f.x, st_f.z,
                          st_f.sstp_tmp_th)
    got = _alive_multiset(st_d.n, st_d.ijk, st_d.rw2, st_d.x, st_d.z,
                          st_d.sstp_tmp_th)
    np.testing.assert_allclose(ref, got, rtol=1e-10)
