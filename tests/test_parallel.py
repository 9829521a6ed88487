"""Multi-chip domain decomposition tests on the virtual 8-device CPU mesh.

Mirrors the reference's MPI test strategy (tests/mpi/mpi_adve_test.cpp:69-110:
oversubscribed multi-rank advection with UNEVEN per-rank nx — nx = rank+2 —
asserting global SD count/position conservation in both directions), plus
multi-step full-process equivalence between the device-mesh front-end
(parallel/multi.py) and the serial backend through the public particles_t
API.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from libcloudphxx_tpu import lgrngn, parallel
from libcloudphxx_tpu.lgrngn.state import (OUT_MIGRATION_OVERFLOW,
                                           StaticConfig, empty_state)

N_DEV = 8


def make_cfg(nx=16, nz=4, n_sd=256, **kw):
    oi = lgrngn.opts_init_t()
    oi.nx, oi.nz = nx, nz
    oi.dx = oi.dz = 1.0
    oi.x1, oi.z1 = float(nx), float(nz)
    oi.dt = 1.0
    oi.n_sd_max = n_sd
    oi.sd_conc = 1
    oi.kernel = lgrngn.kernel_t.geometric
    oi.terminal_velocity = lgrngn.vt_t.beard77fast
    oi.coal_switch = False
    for k, v in kw.items():
        setattr(oi, k, v)
    return StaticConfig.from_opts_init(oi)


def test_slab_widths_uneven():
    assert parallel.slab_widths(16, 8) == [2] * 8
    assert parallel.slab_widths(14, 4) == [4, 4, 3, 3]
    assert sum(parallel.slab_widths(61, 8)) == 61


def test_local_config_split():
    cfg = make_cfg()
    cfg_l = parallel.local_config(cfg, N_DEV)
    assert cfg_l.nx == cfg.nx // N_DEV
    assert cfg_l.n_sd_max == cfg.n_sd_max // N_DEV
    assert cfg_l.x0 == 0.0
    # padded local domain: nx_pad * dx
    assert cfg_l.x1 == pytest.approx(cfg_l.nx * cfg.dx)


def _mesh_step(cfg, widths, fn_builder, states):
    """Run fn(state, dom) under shard_map for hand-built shard states."""
    mesh = parallel.make_mesh(len(widths))
    cfg_l = parallel.local_config(cfg, len(widths), widths)
    state = parallel.replicate_state_for_mesh(cfg, mesh,
                                              lambda s, c: states[s], widths)
    dom = parallel.device_put_domains(cfg, mesh, widths)
    spec = parallel.state_specs()
    dom_spec = parallel.ShardDomain(lo=P("x"), hi=P("x"), nxl=P("x"))
    fn = fn_builder(cfg_l)
    stepped = jax.jit(jax.shard_map(
        fn, mesh=mesh, in_specs=(spec, dom_spec), out_specs=spec,
    ))(state, dom)
    return cfg_l, stepped


def _hand_state(cfg_l, n_live, x, z, ids):
    st = empty_state(cfg_l)
    n = np.zeros(cfg_l.n_sd_max)
    n[:n_live] = ids
    xs = np.zeros(cfg_l.n_sd_max)
    xs[:n_live] = x
    zs = np.zeros(cfg_l.n_sd_max)
    zs[:n_live] = z
    ijk = (xs / cfg_l.dx).astype(np.int32) * cfg_l.nz + \
        (zs / cfg_l.dz).astype(np.int32)
    return dataclasses.replace(
        st,
        n=jnp.asarray(n), x=jnp.asarray(xs), z=jnp.asarray(zs),
        rd3=jnp.full(cfg_l.n_sd_max, 1e-21),
        rw2=jnp.full(cfg_l.n_sd_max, 1e-12),
        kpa=jnp.full(cfg_l.n_sd_max, 0.61),
        ijk=jnp.asarray(np.where(n > 0, ijk, 0), np.int32),
        th=jnp.full(cfg_l.n_cell, 290.0),
        rv=jnp.full(cfg_l.n_cell, 7e-3),
        rhod=jnp.ones(cfg_l.n_cell),
        dv=jnp.full(cfg_l.n_cell, cfg_l.dx * cfg_l.dy * cfg_l.dz),
    )


@pytest.mark.parametrize("direction", [+1, -1])
def test_migration_uneven_widths_conserves(direction):
    """mpi_adve_test port: uneven slabs (widths s+2), drift all SDs by a
    fixed displacement, migrate, and assert global multiplicity/position
    conservation (mpi_adve_test.cpp:92 uses nx = rank+2)."""
    widths = [s + 2 for s in range(4)]           # [2, 3, 4, 5]
    nx = sum(widths)
    cfg = make_cfg(nx=nx, nz=4, n_sd=4 * 16)
    rng = np.random.default_rng(1)

    states, glob_x = [], []
    cfg_l0 = parallel.local_config(cfg, 4, widths)
    offs = np.concatenate([[0], np.cumsum(widths)])[:-1]
    for s in range(4):
        n_live = 6
        x = rng.uniform(0, widths[s] * cfg.dx, n_live)
        z = rng.uniform(0.5, cfg.nz - 0.5, n_live)
        ids = s * 100 + np.arange(1, n_live + 1)
        states.append(_hand_state(cfg_l0, n_live, x, z, ids))
        glob_x.append(x + offs[s] * cfg.dx)

    drift = direction * 0.7 * cfg.dx

    def builder(cfg_l):
        def fn(st, dom):
            st = dataclasses.replace(st, x=jnp.where(st.n > 0,
                                                     st.x + drift, st.x))
            return parallel.migrate(cfg_l, st, dom, buf=8)
        return fn

    cfg_l, out = _mesh_step(cfg, widths, builder, states)

    n_out = np.asarray(out.n).reshape(4, -1)
    x_out = np.asarray(out.x).reshape(4, -1)
    # global conservation of multiplicity (ids double as multiplicities)
    ids_in = sorted(np.concatenate([np.asarray(s.n)[np.asarray(s.n) > 0]
                                    for s in states]).tolist())
    ids_out = sorted(n_out[n_out > 0].tolist())
    assert ids_in == ids_out
    # exact global positions: local + slab offset, wrapped periodically
    expected = np.sort(np.mod(np.concatenate(glob_x) + drift,
                              nx * cfg.dx))
    got = np.sort(np.concatenate(
        [x_out[s][n_out[s] > 0] + offs[s] * cfg.dx for s in range(4)]))
    np.testing.assert_allclose(got, expected, rtol=0, atol=1e-12)
    # everyone ended up inside their slab
    for s in range(4):
        live = n_out[s] > 0
        assert (x_out[s][live] >= 0).all()
        assert (x_out[s][live] < widths[s] * cfg.dx).all()


def test_migration_overflow_is_loud():
    widths = [2, 2]
    cfg = make_cfg(nx=4, nz=4, n_sd=2 * 16)
    cfg_l0 = parallel.local_config(cfg, 2, widths)
    # 10 SDs all moving right but buf=2
    states = [
        _hand_state(cfg_l0, 10, np.full(10, 1.6), np.full(10, 1.5),
                    np.arange(1, 11)),
        _hand_state(cfg_l0, 0, np.zeros(0), np.zeros(0), np.zeros(0)),
    ]

    def builder(cfg_l):
        def fn(st, dom):
            st = dataclasses.replace(st, x=jnp.where(st.n > 0, st.x + 0.5,
                                                     st.x))
            return parallel.migrate(cfg_l, st, dom, buf=2)
        return fn

    _, out = _mesh_step(cfg, widths, builder, states)
    ovf = np.asarray(out.puddle).reshape(2, -1)[:, OUT_MIGRATION_OVERFLOW]
    assert ovf.sum() == 8  # 10 movers, 2 buffer slots


# --------------------------------------------------------------------------
# public-API equivalence: device mesh vs serial backend
# --------------------------------------------------------------------------

def _build_api(dev_count, nx=14, nz=6, adve_scheme=None):
    def lognormal(lnr):
        return (60e6 * np.exp(-(lnr - np.log(0.02e-6)) ** 2
                              / 2 / np.log(1.4) ** 2)
                / np.log(1.4) / np.sqrt(2 * np.pi))
    oi = lgrngn.opts_init_t()
    oi.nx, oi.nz = nx, nz
    oi.dx = oi.dz = 25.0
    oi.x1, oi.z1 = nx * 25.0, nz * 25.0
    oi.dt = 1.0
    oi.sd_conc = 24
    oi.n_sd_max = nx * nz * 24 * 2
    oi.dry_distros = {(0.61, 0.0): lognormal}
    oi.terminal_velocity = lgrngn.vt_t.beard77fast
    oi.kernel = lgrngn.kernel_t.geometric
    if adve_scheme is not None:
        oi.adve_scheme = adve_scheme
    oi.dev_count = dev_count
    backend = (lgrngn.backend_t.multi_CUDA if dev_count > 1
               else lgrngn.backend_t.serial)
    prt = lgrngn.factory(backend, oi)

    th = np.full((nx, nz), 289.99)
    rv = np.full((nx, nz), 7.5e-3)
    rhod = np.full((nx, nz), 1.12)
    # a flow with both directions and some vertical motion
    x_f = np.arange(nx + 1)[:, None]
    Cx = 0.4 * np.cos(2 * np.pi * x_f / nx) + np.zeros((1, nz))
    Cz = 0.08 * np.ones((nx, nz + 1))
    prt.init(th.copy(), rv.copy(), rhod, Cx=Cx, Cz=Cz)
    return prt, th, rv


@pytest.mark.parametrize("nsteps", [6])
def test_multichip_equals_serial_full_process(nsteps):
    """K full steps (cond + adve + sedi, coal off for RNG-independence)
    through the public API: the 4-shard uneven mesh must reproduce the
    serial run's fields, SD population and puddle (the reference's
    mpi_adve_test checks counts/positions; here the whole process set)."""
    prt_s, th_s, rv_s = _build_api(1)
    prt_m, th_m, rv_m = _build_api(4)
    assert type(prt_m).__name__ == "particles_multi_t"
    assert prt_m.widths == [4, 4, 3, 3]

    opts = lgrngn.opts_t()
    opts.coal = False
    for _ in range(nsteps):
        prt_s.step_sync(opts, th_s, rv_s)
        prt_s.step_async(opts)
        prt_m.step_sync(opts, th_m, rv_m)
        prt_m.step_async(opts)

    np.testing.assert_allclose(th_m, th_s, rtol=0, atol=1e-9)
    np.testing.assert_allclose(rv_m, rv_s, rtol=0, atol=1e-12)

    for p in (prt_s, prt_m):
        p.diag_all()
        p.diag_sd_conc()
    sd_s = prt_s.outbuf()
    prt_m.diag_all()
    prt_m.diag_sd_conc()
    sd_m = prt_m.outbuf()
    np.testing.assert_array_equal(sd_m, sd_s)

    # per-SD population: same multiset of (x, z, n, rw2)
    def popul(p):
        n = p.get_attr("n")
        live = n > 0
        cols = np.stack([p.get_attr("x")[live], p.get_attr("z")[live],
                         n[live], p.get_attr("rw2")[live]])
        return cols[:, np.lexsort(cols)]
    pop_s, pop_m = popul(prt_s), popul(prt_m)
    assert pop_s.shape == pop_m.shape
    np.testing.assert_allclose(pop_m, pop_s, rtol=1e-9, atol=1e-12)

    pud_s, pud_m = prt_s.diag_puddle(), prt_m.diag_puddle()
    for k in pud_s:
        assert pud_m[k] == pytest.approx(pud_s[k], rel=1e-9, abs=1e-30)

    # wet moments agree too (diag reduction path)
    for p in (prt_s, prt_m):
        p.diag_all()
        p.diag_wet_mom(3)
    np.testing.assert_allclose(prt_m.outbuf(), prt_s.outbuf(),
                               rtol=1e-8, atol=1e-40)
    assert prt_m.migration_overflow() == 0


def test_multichip_pred_corr_equals_serial():
    """pred_corr SD advection on the mesh: the halo-2 courant exchange
    (decomp._xchng_courants_pc, reference xchng_courants.ipp:207-320 with
    halo_size == 2) must reproduce the serial pred_corr trajectories —
    midpoint courants of SDs crossing slab edges come from the
    neighbours."""
    scheme = lgrngn.as_t.pred_corr
    prt_s, th_s, rv_s = _build_api(1, adve_scheme=scheme)
    prt_m, th_m, rv_m = _build_api(4, adve_scheme=scheme)
    assert type(prt_m).__name__ == "particles_multi_t"

    opts = lgrngn.opts_t()
    opts.coal = False
    for _ in range(6):
        prt_s.step_sync(opts, th_s, rv_s)
        prt_s.step_async(opts)
        prt_m.step_sync(opts, th_m, rv_m)
        prt_m.step_async(opts)

    np.testing.assert_allclose(th_m, th_s, rtol=0, atol=1e-9)
    np.testing.assert_allclose(rv_m, rv_s, rtol=0, atol=1e-12)

    def popul(p):
        n = p.get_attr("n")
        live = n > 0
        cols = np.stack([p.get_attr("x")[live], p.get_attr("z")[live],
                         n[live], p.get_attr("rw2")[live]])
        return cols[:, np.lexsort(cols)]
    pop_s, pop_m = popul(prt_s), popul(prt_m)
    assert pop_s.shape == pop_m.shape
    np.testing.assert_allclose(pop_m, pop_s, rtol=1e-9, atol=1e-12)
    assert prt_m.migration_overflow() == 0


def test_multichip_courant_halo_matters():
    """An SD in a slab's last cell advects with the face courant owned by
    the right neighbour — with a broken halo its trajectory would be wrong
    (reference xchng_courants.ipp)."""
    prt_m, th, rv = _build_api(4)
    prt_s, th_s, rv_s = _build_api(1)
    opts = lgrngn.opts_t()
    opts.coal = False
    opts.cond = False
    opts.sedi = False
    for _ in range(3):
        prt_s.step_sync(opts, th_s, rv_s)
        prt_s.step_async(opts)
        prt_m.step_sync(opts, th, rv)
        prt_m.step_async(opts)
    xs = np.sort(prt_s.get_attr("x")[prt_s.get_attr("n") > 0])
    xm = np.sort(prt_m.get_attr("x")[prt_m.get_attr("n") > 0])
    np.testing.assert_allclose(xm, xs, rtol=0, atol=1e-10)


def test_multichip_equals_serial_3d():
    """3-D slab decomposition through the public API (the reference's
    mpi_adve_test also runs 3-D, mpi_adve_test.cpp:69-110)."""
    def lognormal(lnr):
        return (60e6 * np.exp(-(lnr - np.log(0.02e-6)) ** 2
                              / 2 / np.log(1.4) ** 2)
                / np.log(1.4) / np.sqrt(2 * np.pi))

    def build(dev_count):
        nx, ny, nz = 9, 4, 5
        oi = lgrngn.opts_init_t()
        oi.nx, oi.ny, oi.nz = nx, ny, nz
        oi.dx = oi.dy = oi.dz = 20.0
        oi.x1, oi.y1, oi.z1 = nx * 20.0, ny * 20.0, nz * 20.0
        oi.dt = 1.0
        oi.sd_conc = 8
        oi.n_sd_max = nx * ny * nz * 8 * 2
        oi.dry_distros = {(0.61, 0.0): lognormal}
        oi.terminal_velocity = lgrngn.vt_t.beard77fast
        oi.kernel = lgrngn.kernel_t.geometric
        oi.dev_count = dev_count
        backend = (lgrngn.backend_t.multi_CUDA if dev_count > 1
                   else lgrngn.backend_t.serial)
        prt = lgrngn.factory(backend, oi)
        shape = (nx, ny, nz)
        th = np.full(shape, 290.0)
        rv = np.full(shape, 7.5e-3)
        rhod = np.full(shape, 1.1)
        Cx = np.full((nx + 1, ny, nz), 0.3)
        Cy = np.full((nx, ny + 1, nz), 0.1)
        Cz = np.full((nx, ny, nz + 1), 0.05)
        prt.init(th, rv, rhod, Cx=Cx, Cy=Cy, Cz=Cz)
        return prt, th, rv

    prt_s, th_s, rv_s = build(1)
    prt_m, th_m, rv_m = build(3)
    assert prt_m.widths == [3, 3, 3]
    opts = lgrngn.opts_t()
    opts.coal = False
    for _ in range(5):
        prt_s.step_sync(opts, th_s, rv_s)
        prt_s.step_async(opts)
        prt_m.step_sync(opts, th_m, rv_m)
        prt_m.step_async(opts)
    np.testing.assert_allclose(th_m, th_s, rtol=0, atol=1e-9)
    for p in (prt_s, prt_m):
        p.diag_all()
        p.diag_sd_conc()
    np.testing.assert_array_equal(prt_m.outbuf(), prt_s.outbuf())

    def popul(p):
        n = p.get_attr("n")
        live = n > 0
        cols = np.stack([p.get_attr("x")[live], p.get_attr("y")[live],
                         p.get_attr("z")[live], n[live]])
        return cols[:, np.lexsort(cols)]
    np.testing.assert_allclose(popul(prt_m), popul(prt_s),
                               rtol=1e-9, atol=1e-12)


def test_multichip_src_equals_serial():
    """Aerosol source through the public API on the mesh: the gather ->
    exact serial source -> re-scatter path must reproduce the serial run
    (reference distmem windows the source per domain,
    particles_step.ipp:452; here the semantics are exactly global)."""
    def lognormal(lnr):
        return (60e6 * np.exp(-(lnr - np.log(0.02e-6)) ** 2
                              / 2 / np.log(1.4) ** 2)
                / np.log(1.4) / np.sqrt(2 * np.pi))

    def lognormal_src(lnr):
        return (60e4 * np.exp(-(lnr - np.log(0.05e-6)) ** 2
                              / 2 / np.log(1.4) ** 2)
                / np.log(1.4) / np.sqrt(2 * np.pi))

    def build(dev_count):
        nx, nz = 10, 4
        oi = lgrngn.opts_init_t()
        oi.nx, oi.nz = nx, nz
        oi.dx = oi.dz = 25.0
        oi.x1, oi.z1 = nx * 25.0, nz * 25.0
        oi.dt = 1.0
        oi.sd_conc = 16
        oi.n_sd_max = nx * nz * 16 * 4
        oi.dry_distros = {(0.61, 0.0): lognormal}
        oi.terminal_velocity = lgrngn.vt_t.beard77fast
        oi.kernel = lgrngn.kernel_t.geometric
        oi.src_type = lgrngn.src_t.simple
        # source box covering part of two shards (global coordinates)
        oi.src_x0, oi.src_x1 = 50.0, 200.0
        oi.src_z0, oi.src_z1 = 0.0, 50.0
        oi.dev_count = dev_count
        backend = (lgrngn.backend_t.multi_CUDA if dev_count > 1
                   else lgrngn.backend_t.serial)
        prt = lgrngn.factory(backend, oi)
        th = np.full((nx, nz), 290.0)
        rv = np.full((nx, nz), 7.5e-3)
        rhod = np.full((nx, nz), 1.1)
        Cx = np.full((nx + 1, nz), 0.2)
        Cz = np.zeros((nx, nz + 1))
        prt.init(th.copy(), rv.copy(), rhod, Cx=Cx, Cz=Cz)
        return prt, th, rv

    prt_s, th_s, rv_s = build(1)
    prt_m, th_m, rv_m = build(3)
    opts = lgrngn.opts_t()
    opts.coal = False
    opts.src = True
    opts.src_dry_distros = {(0.61, 0.0): (lognormal_src, 8, 2)}
    for _ in range(4):
        prt_s.step_sync(opts, th_s, rv_s)
        prt_s.step_async(opts)
        prt_m.step_sync(opts, th_m, rv_m)
        prt_m.step_async(opts)

    for p in (prt_s, prt_m):
        p.diag_all()
        p.diag_sd_conc()
    sd_s, sd_m = prt_s.outbuf().copy(), prt_m.outbuf().copy()
    np.testing.assert_array_equal(sd_m, sd_s)
    assert sd_s.max() > 16  # the source actually created SDs

    def popul(p):
        n = p.get_attr("n")
        live = n > 0
        cols = np.stack([p.get_attr("x")[live], p.get_attr("z")[live],
                         n[live], p.get_attr("rd3")[live]])
        return cols[:, np.lexsort(cols)]
    pop_s, pop_m = popul(prt_s), popul(prt_m)
    assert pop_s.shape == pop_m.shape
    np.testing.assert_allclose(pop_m, pop_s, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(th_m, th_s, rtol=0, atol=1e-9)


def test_multichip_rlx_equals_serial():
    """CCN relaxation on the mesh: gathered exact semantics (the reference
    multi_CUDA only does per-GPU local means, multi_gpu_ctor.ipp:41 —
    the single-process mesh reproduces the serial run exactly)."""
    def lognormal(lnr):
        return (60e6 * np.exp(-(lnr - np.log(0.02e-6)) ** 2
                              / 2 / np.log(1.4) ** 2)
                / np.log(1.4) / np.sqrt(2 * np.pi))

    def lognormal_rlx(lnr):
        return 2.0 * lognormal(lnr)

    def build(dev_count):
        nx, nz = 9, 3
        oi = lgrngn.opts_init_t()
        oi.nx, oi.nz = nx, nz
        oi.dx = oi.dz = 30.0
        oi.x1, oi.z1 = nx * 30.0, nz * 30.0
        oi.dt = 1.0
        oi.sd_conc = 16
        oi.n_sd_max = nx * nz * 16 * 4
        oi.aerosol_independent_of_rhod = True
        oi.dry_distros = {(0.61, 0.0): lognormal}
        oi.terminal_velocity = lgrngn.vt_t.beard77fast
        oi.kernel = lgrngn.kernel_t.geometric
        oi.rlx_switch = True
        oi.supstp_rlx = 2
        oi.rlx_bins = 32
        oi.rlx_sd_per_bin = 1
        oi.rlx_timescale = 1.0
        oi.rlx_dry_distros = {0.61: (lognormal_rlx, (0.0, 2.0),
                                     (0.0, 30.0))}
        oi.dev_count = dev_count
        backend = (lgrngn.backend_t.multi_CUDA if dev_count > 1
                   else lgrngn.backend_t.serial)
        prt = lgrngn.factory(backend, oi)
        th = np.full((nx, nz), 290.0)
        rv = np.full((nx, nz), 7.5e-3)
        rhod = np.full((nx, nz), 1.1)
        Cx = np.full((nx + 1, nz), 0.15)
        Cz = np.zeros((nx, nz + 1))
        prt.init(th.copy(), rv.copy(), rhod, Cx=Cx, Cz=Cz)
        return prt, th, rv

    prt_s, th_s, rv_s = build(1)
    prt_m, th_m, rv_m = build(3)
    opts = lgrngn.opts_t()
    opts.coal = False
    opts.rlx = True
    for _ in range(4):
        prt_s.step_sync(opts, th_s, rv_s)
        prt_s.step_async(opts)
        prt_m.step_sync(opts, th_m, rv_m)
        prt_m.step_async(opts)

    for p in (prt_s, prt_m):
        p.diag_all()
        p.diag_wet_mom(0)
    m0_s, m0_m = prt_s.outbuf().copy(), prt_m.outbuf().copy()
    np.testing.assert_allclose(m0_m, m0_s, rtol=1e-9)

    def popul(p):
        n = p.get_attr("n")
        live = n > 0
        cols = np.stack([p.get_attr("x")[live], p.get_attr("z")[live],
                         n[live], p.get_attr("rd3")[live]])
        return cols[:, np.lexsort(cols)]
    pop_s, pop_m = popul(prt_s), popul(prt_m)
    assert pop_s.shape == pop_m.shape
    np.testing.assert_allclose(pop_m, pop_s, rtol=1e-9, atol=1e-12)
    # relaxation actually created SDs
    assert pop_s.shape[1] > 9 * 3 * 16


def test_multichip_chem_equals_serial():
    """Aqueous chemistry on the device mesh: chem attrs shard on axis 1,
    trace gases per slab, dissolved masses ride the migration — serial and
    mesh runs must agree exactly (chemistry is deterministic).  The
    reference's MPI backend forbids chemistry (init_sanity_check.ipp:131);
    multi_CUDA supports it, and so does the mesh."""
    from libcloudphxx_tpu.common.chem import chem_species_t
    from libcloudphxx_tpu.common import lognormal as ln_mod

    def lognormal(lnr):
        return ln_mod.n_e(0.04e-6, 1.4, 60e6, lnr)

    def build(dev_count):
        nx, nz = 9, 3
        oi = lgrngn.opts_init_t()
        oi.nx, oi.nz = nx, nz
        oi.dx = oi.dz = 25.0
        oi.x1, oi.z1 = nx * 25.0, nz * 25.0
        oi.dt = 1.0
        oi.sd_conc = 16
        oi.n_sd_max = nx * nz * 16 * 2
        oi.dry_distros = {(0.61, 0.0): lognormal}
        oi.terminal_velocity = lgrngn.vt_t.beard77fast
        oi.kernel = lgrngn.kernel_t.geometric
        oi.chem_switch = True
        oi.chem_rho = 1.8e3
        oi.sstp_chem = 2
        oi.dev_count = dev_count
        backend = (lgrngn.backend_t.multi_CUDA if dev_count > 1
                   else lgrngn.backend_t.serial)
        prt = lgrngn.factory(backend, oi)
        shape = (nx, nz)
        th = np.full(shape, 300.0)
        rv = np.full(shape, 0.02)   # supersaturated: droplets activate
        rhod = np.full(shape, 1.0)
        chem = {
            chem_species_t.SO2: np.full(shape, 2e-10),
            chem_species_t.O3: np.full(shape, 5e-8),
            chem_species_t.H2O2: np.full(shape, 5e-10),
            chem_species_t.CO2: np.full(shape, 360e-6 * 44.0 / 29.0),
            chem_species_t.NH3: np.full(shape, 1e-10),
            chem_species_t.HNO3: np.full(shape, 1e-11),
        }
        Cx = np.full((nx + 1, nz), 0.25)
        Cz = np.zeros((nx, nz + 1))
        prt.init(th.copy(), rv.copy(), rhod, ambient_chem=chem,
                 Cx=Cx, Cz=Cz)
        return prt, th, rv, chem

    prt_s, th_s, rv_s, chem_s = build(1)
    prt_m, th_m, rv_m, chem_m = build(3)

    opts = lgrngn.opts_t()
    opts.coal = False
    opts.chem_dsl = opts.chem_dsc = opts.chem_rct = True
    SO2_before = chem_s[chem_species_t.SO2].copy()
    for _ in range(4):
        prt_s.step_sync(opts, th_s, rv_s, ambient_chem=chem_s)
        prt_s.step_async(opts)
        prt_m.step_sync(opts, th_m, rv_m, ambient_chem=chem_m)
        prt_m.step_async(opts)

    # gas depletion identical between serial and mesh
    assert (chem_s[chem_species_t.SO2] < SO2_before).all()
    for sp in chem_s:
        np.testing.assert_allclose(chem_m[sp], chem_s[sp],
                                   rtol=1e-9, atol=0)
    np.testing.assert_allclose(th_m, th_s, rtol=0, atol=1e-9)
    np.testing.assert_allclose(rv_m, rv_s, rtol=0, atol=1e-12)

    # dissolved-mass diagnostics agree (migration carried chem correctly)
    for sp in (chem_species_t.S_VI, chem_species_t.SO2, chem_species_t.H):
        for p in (prt_s, prt_m):
            p.diag_all()
            p.diag_chem(sp)
        np.testing.assert_allclose(prt_m.outbuf(), prt_s.outbuf(),
                                   rtol=1e-8)
    assert prt_s.outbuf().max() > 0
    assert prt_m.migration_overflow() == 0
