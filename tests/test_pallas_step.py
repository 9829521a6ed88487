"""Kernel-resident step (ops/pallas_step): interpret-mode equivalence with
the dense XLA path.

The resident kernel shares every physics function with the XLA dense
engine (_advance_rw2_core, pair_and_collide, _vt_in_kernel), so the
cond+transport path must match BITWISE at f32 (same ops, same order).  The
coalescence loop uses the on-core PRNG (no CPU lowering) and is gated on
real TPU by the bench-path conservation checks instead
(tests/test_pallas_coal.py covers the loop body in interpret mode).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from libcloudphxx_tpu import lgrngn
from libcloudphxx_tpu.lgrngn import dense as dm
from libcloudphxx_tpu.lgrngn import vterm as vterm_mod
from libcloudphxx_tpu.models import Kinematic2D


def _setup(rain=False):
    m = Kinematic2D(nx=8, nz=8, micro="lgrngn", sd_conc=24, sstp_cond=3,
                    sstp_coal=2, n_sd_max=24 * 8 * 8,
                    terminal_velocity=lgrngn.vt_t.beard77)
    p = m.prtcls
    cfg = p.cfg
    d = jax.jit(dm.pack, static_argnums=(0, 2))(cfg, p.state, 32)
    f32 = lambda a: a.astype(jnp.float32) if a.dtype == jnp.float64 else a
    d = jax.tree.map(f32, d)
    if rain:
        # a few mm-scale drops (small multiplicity, so the liquid water
        # stays physical) just above the lower wall: sedimentation must
        # carry some through z0 into the puddle within one step
        d = dataclasses.replace(
            d,
            n=jnp.where(d.n > 0, 2.0, 0.0),
            rw2=jnp.where(d.n > 0, (1e-3) ** 2, 0.0),
            z=jnp.where(d.n > 0, cfg.z0 + 5.0 * (d.z / cfg.z1), d.z))
    # the kernel reconstructs stale vt from (rw2, th0, rv0) at f32; give
    # the XLA path the same f32 values
    d = dataclasses.replace(
        d, vt=vterm_mod.vt_of(cfg, d.rw2, d.T[:, None], d.p[:, None],
                              d.rhod[:, None], d.eta[:, None]))
    th = jnp.asarray(m.th, jnp.float32).reshape(-1)
    rv = jnp.asarray(m.rv, jnp.float32).reshape(-1)
    return m, cfg, d, th, rv


def _multiset(d, cfg):
    n = np.asarray(d.n).reshape(-1)
    alive = n > 0
    cols = [np.repeat(np.arange(cfg.n_cell), d.cap)[alive], n[alive],
            np.asarray(d.rw2).reshape(-1)[alive],
            np.asarray(d.x).reshape(-1)[alive],
            np.asarray(d.z).reshape(-1)[alive]]
    o = np.lexsort(cols[::-1])
    return np.stack([c[o] for c in cols], 1)


@pytest.mark.parametrize("rain", [False, True])
def test_resident_step_matches_dense_xla(rain):
    m, cfg, d, th, rv = _setup(rain)
    dt = float(m.setup.dt)
    params = jnp.zeros((0,), jnp.float32)

    # XLA reference: step_cond + vterm + adve/sedi/bcnd + rebin (no coal)
    d_x, th_x, rv_x = dm.step_cond(cfg, d, th, rv, dt, 44.0)
    d_x = dataclasses.replace(
        d_x, vt=vterm_mod.vt_of(cfg, d_x.rw2, d_x.T[:, None],
                                d_x.p[:, None], d_x.rhod[:, None],
                                d_x.eta[:, None]))
    d_x = dm.adve_sedi_bcnd(cfg, d_x, dt, True)
    d_x = dm.rebin(cfg, d_x)

    with pltpu.force_tpu_interpret_mode():
        d_k, th_k, rv_k = dm.step_fused(cfg, d, th, rv, params, dt, 44.0,
                                        2, False, True)

    np.testing.assert_array_equal(np.asarray(th_k), np.asarray(th_x))
    np.testing.assert_array_equal(np.asarray(rv_k), np.asarray(rv_x))
    a, b = _multiset(d_k, cfg), _multiset(d_x, cfg)
    assert a.shape == b.shape
    # cell / n / x / z bitwise; rw2 to 1 f32 ulp (the 16-iteration root
    # find picks up last-ulp reassociation differences between the Mosaic
    # interpreter and compiled XLA)
    np.testing.assert_array_equal(a[:, [0, 1, 3, 4]], b[:, [0, 1, 3, 4]])
    np.testing.assert_allclose(a[:, 2], b[:, 2], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d_k.puddle),
                               np.asarray(d_x.puddle), rtol=1e-6)
    if rain:
        from libcloudphxx_tpu.lgrngn.state import OUT_PRTCL_NUM
        assert float(d_k.puddle[OUT_PRTCL_NUM]) > 0.0


def test_deferred_xmerge_matches_dense_xla():
    """The deferred-x pipeline (x merge as next-kernel prologue + an
    end-of-run flush) must produce the same per-cell populations as the
    immediate path.  Lane order inside a row differs (the prologue's
    compaction sort is not stable), so cell sums reassociate: values are
    gated at f32-ulp tolerances instead of bitwise."""
    import dataclasses as dc
    m, cfg, d, th, rv = _setup(False)
    dt = float(m.setup.dt)
    params = jnp.zeros((0,), jnp.float32)

    d_x, th_x, rv_x = dm.step_cond(cfg, d, th, rv, dt, 44.0)
    d_x = dataclasses.replace(
        d_x, vt=vterm_mod.vt_of(cfg, d_x.rw2, d_x.T[:, None],
                                d_x.p[:, None], d_x.rhod[:, None],
                                d_x.eta[:, None]))
    d_x = dm.adve_sedi_bcnd(cfg, d_x, dt, True)
    d_x = dm.rebin(cfg, d_x)

    d0 = dc.replace(d, xkey=jnp.where(d.n > 0, jnp.float32(2.0),
                                      jnp.float32(3.0)))
    with pltpu.force_tpu_interpret_mode():
        d_k, th_k, rv_k = dm.step_fused(cfg, d0, th, rv, params, dt, 44.0,
                                        2, False, True)
        assert d_k.xkey.size  # classification pending
        d_k = dm.flush_xmerge(cfg, d_k)

    np.testing.assert_allclose(np.asarray(th_k), np.asarray(th_x),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(rv_k), np.asarray(rv_x),
                               rtol=1e-6)
    a, b = _multiset(d_k, cfg), _multiset(d_x, cfg)
    assert a.shape == b.shape
    np.testing.assert_array_equal(a[:, 0], b[:, 0])       # cells
    np.testing.assert_array_equal(a[:, 1], b[:, 1])       # multiplicities
    np.testing.assert_allclose(a[:, 2], b[:, 2], rtol=1e-5)   # rw2
    np.testing.assert_allclose(a[:, 3], b[:, 3], rtol=1e-5)   # x
    np.testing.assert_allclose(a[:, 4], b[:, 4], rtol=1e-5)   # z
    assert float(d_k.overflow) == 0.0


def test_resident_step_const_p_matches_dense_xla():
    """The th_std/const_p closure inside the resident kernel (round-5
    widening: the p0 profile rides as a 16th cell input) must match the
    XLA dense pipeline exactly, like the th_dry variant above."""
    NX = NZ = 8
    oi = lgrngn.opts_init_t()

    def lognorm(lnr):
        from math import exp, log, pi, sqrt
        mean_r, stdev, n_tot = 0.04e-6 / 2, 1.4, 60e6
        return (n_tot * np.exp(-((lnr - log(mean_r)) ** 2)
                               / 2 / log(stdev) ** 2)
                / log(stdev) / sqrt(2 * pi))

    oi.dry_distros = {(0.61, 0.0): lognorm}
    oi.coal_switch = False
    oi.sedi_switch = True
    oi.terminal_velocity = lgrngn.vt_t.beard77
    oi.dt = 1
    oi.nx, oi.nz = NX, NZ
    oi.dx = oi.dz = 100.0
    oi.x1, oi.z1 = NX * 100.0, NZ * 100.0
    oi.sd_conc = 16
    oi.n_sd_max = 16 * NX * NZ
    oi.sstp_cond = 2
    oi.th_dry = False
    oi.const_p = True
    th = (289.0 * (100000.0 / 90000.0) ** (287.0 / 1005.0)
          ) * np.ones((NX, NZ))
    rv = 7.5e-3 * np.ones((NX, NZ))
    rhod = np.ones((NX, NZ))
    p0 = 90000.0 * np.ones((NX, NZ))
    Cx = 0.2 * np.ones((NX + 1, NZ))
    Cz = -0.1 * np.ones((NX, NZ + 1))
    prt = lgrngn.factory(lgrngn.backend_t.serial, oi)
    prt.init(th, rv, rhod, p0, Cx=Cx, Cz=Cz)
    cfg = prt.cfg
    assert not cfg.th_dry and cfg.const_p
    assert dm.resident_static_ok(cfg)

    d = jax.jit(dm.pack, static_argnums=(0, 2))(cfg, prt.state, 32)
    f32 = lambda a: a.astype(jnp.float32) if a.dtype == jnp.float64 else a
    d = jax.tree.map(f32, d)
    d = dataclasses.replace(
        d, vt=vterm_mod.vt_of(cfg, d.rw2, d.T[:, None], d.p[:, None],
                              d.rhod[:, None], d.eta[:, None]))
    thv = jnp.asarray(th, jnp.float32).reshape(-1)
    rvv = jnp.asarray(rv, jnp.float32).reshape(-1)
    dt = 1.0
    params = jnp.zeros((0,), jnp.float32)

    d_x, th_x, rv_x = dm.step_cond(cfg, d, thv, rvv, dt, 44.0)
    d_x = dataclasses.replace(
        d_x, vt=vterm_mod.vt_of(cfg, d_x.rw2, d_x.T[:, None],
                                d_x.p[:, None], d_x.rhod[:, None],
                                d_x.eta[:, None]))
    d_x = dm.adve_sedi_bcnd(cfg, d_x, dt, True)
    d_x = dm.rebin(cfg, d_x)

    with pltpu.force_tpu_interpret_mode():
        d_k, th_k, rv_k = dm.step_fused(cfg, d, thv, rvv, params, dt,
                                        44.0, 2, False, True)

    np.testing.assert_array_equal(np.asarray(th_k), np.asarray(th_x))
    np.testing.assert_array_equal(np.asarray(rv_k), np.asarray(rv_x))
    np.testing.assert_array_equal(np.asarray(d_k.p), np.asarray(d_x.p))
    a, b = _multiset(d_k, cfg), _multiset(d_x, cfg)
    assert a.shape == b.shape
    np.testing.assert_array_equal(a[:, [0, 1, 3, 4]], b[:, [0, 1, 3, 4]])
    np.testing.assert_allclose(a[:, 2], b[:, 2], rtol=1e-5)
