"""Host-model plumbing: CLI, moment-spec mini-language, snapshot output,
checkpoint/restore, debug tier (SURVEY section 5 / VERDICT items 8-10)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from libcloudphxx_tpu.models.cli import parse_outmoms


def test_parse_outmoms():
    # the travis lgrngn spec fragments (opts_common.hpp:68-104)
    spec = ".5e-6:25e-6|0,1,2,3;25e-6:1|0,3"
    out = parse_outmoms(spec)
    assert out == [((0.5e-6, 25e-6), [0, 1, 2, 3]), ((25e-6, 1.0), [0, 3])]
    assert parse_outmoms("0:1|0") == [((0.0, 1.0), [0])]
    assert parse_outmoms("") == []


def test_cli_end_to_end(tmp_path):
    """Tiny lgrngn run through the CLI writes const + timestep snapshots +
    puddle.dat with the reference's dataset naming."""
    from libcloudphxx_tpu.models import cli
    outdir = str(tmp_path / "out")
    cli.main([
        "--micro=lgrngn", "--nx=12", "--nz=12", "--nt=2", "--spinup=1",
        "--outfreq=2", f"--outdir={outdir}", "--sd_conc=8",
        "--out_wet=.5e-6:25e-6|0,3", "--out_dry=0:1|0",
    ])
    names = sorted(os.listdir(outdir))
    assert any(n.startswith("const") for n in names)
    assert any(n.startswith("timestep0000000000") for n in names)
    assert any(n.startswith("timestep0000000002") for n in names)
    assert "puddle.dat" in names
    snap = [n for n in names if n.startswith("timestep0000000002")][0]
    if snap.endswith(".h5"):
        import h5py
        with h5py.File(os.path.join(outdir, snap)) as f:
            keys = set(f.keys())
            assert {"th", "rv", "sd_conc", "rw_rng000_mom0",
                    "rw_rng000_mom3", "rd_rng000_mom0",
                    "rw3ofrd_rng000_mom3"} <= keys
            assert np.isfinite(f["th"][:]).all()


def test_save_load_roundtrip_continuation():
    """save -> load -> continue equals an uninterrupted run bitwise
    (VERDICT item 9)."""
    from libcloudphxx_tpu import lgrngn

    def lognormal(lnr):
        return (60e6 * np.exp(-(lnr - np.log(0.02e-6)) ** 2
                              / 2 / np.log(1.4) ** 2)
                / np.log(1.4) / np.sqrt(2 * np.pi))

    def build():
        oi = lgrngn.opts_init_t()
        oi.nx, oi.nz = 8, 8
        oi.dx = oi.dz = 25.0
        oi.x1 = oi.z1 = 200.0
        oi.dt = 1.0
        oi.sd_conc = 16
        oi.n_sd_max = 8 * 8 * 16
        oi.dry_distros = {(0.61, 0.0): lognormal}
        oi.kernel = lgrngn.kernel_t.geometric
        oi.terminal_velocity = lgrngn.vt_t.beard77fast
        prt = lgrngn.factory(lgrngn.backend_t.serial, oi)
        th = np.full((8, 8), 289.99)
        rv = np.full((8, 8), 7.5e-3)
        rhod = np.full((8, 8), 1.1)
        prt.init(th, rv, rhod, Cx=np.full((9, 8), 0.2),
                 Cz=np.full((8, 9), 0.05))
        return prt, th, rv

    opts = lgrngn.opts_t()
    prt_a, th_a, rv_a = build()
    prt_b, th_b, rv_b = build()
    for _ in range(2):
        for p, th, rv in ((prt_a, th_a, rv_a), (prt_b, th_b, rv_b)):
            p.step_sync(opts, th, rv)
            p.step_async(opts)

    import tempfile
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.npz")
        prt_a.save(path)
        prt_c, th_c, rv_c = build()
        prt_c.load(path)
        th_c[:], rv_c[:] = th_a, rv_a

        for _ in range(3):
            for p, th, rv in ((prt_b, th_b, rv_b), (prt_c, th_c, rv_c)):
                p.step_sync(opts, th, rv)
                p.step_async(opts)

    np.testing.assert_array_equal(th_c, th_b)
    np.testing.assert_array_equal(rv_c, rv_b)
    np.testing.assert_array_equal(np.asarray(prt_c.state.x),
                                  np.asarray(prt_b.state.x))
    np.testing.assert_array_equal(np.asarray(prt_c.state.rw2),
                                  np.asarray(prt_b.state.rw2))


def test_debug_nancheck_names_phase(monkeypatch):
    """LIBCLOUD_DEBUG=1 catches a seeded NaN with the phase named
    (reference checknan.hpp semantics; VERDICT item 8)."""
    import dataclasses

    import jax.numpy as jnp

    from libcloudphxx_tpu import lgrngn

    def lognormal(lnr):
        return (60e6 * np.exp(-(lnr - np.log(0.02e-6)) ** 2
                              / 2 / np.log(1.4) ** 2)
                / np.log(1.4) / np.sqrt(2 * np.pi))

    oi = lgrngn.opts_init_t()
    oi.dt = 1.0
    oi.dry_distros = {(0.61, 0.0): lognormal}
    oi.sd_conc = 16
    oi.n_sd_max = 16
    oi.terminal_velocity = lgrngn.vt_t.beard76
    prt = lgrngn.factory(lgrngn.backend_t.serial, oi)
    rhod = np.ones(1)
    th = 300.0 * np.ones(1)
    rv = 0.01 * np.ones(1)
    prt.init(th.copy(), rv.copy(), rhod)

    monkeypatch.setenv("LIBCLOUD_DEBUG", "1")
    # seed a NaN into rw2 — the next step_cond must name its phase
    prt.state = dataclasses.replace(
        prt.state, rw2=prt.state.rw2.at[0].set(jnp.nan))
    opts = lgrngn.opts_t()
    opts.coal = False
    with pytest.raises(FloatingPointError, match="step_cond"):
        prt.step_sync(opts, th, rv)


def test_step_timer():
    from libcloudphxx_tpu.utils import StepTimer
    t = StepTimer()
    with t("phase_a"):
        sum(range(1000))
    with t("phase_b"):
        pass
    rep = t.report()
    assert "phase_a" in rep and "phase_b" in rep


def test_relax_th_rv():
    """th/rv relaxation toward the post-spinup horizontal means
    (kin_cloud_2d_common.hpp update_rhs:90-117): after spinup the fields
    are pulled back toward the saved profiles with tau growing with
    altitude."""
    from libcloudphxx_tpu.models import Kinematic2D
    m = Kinematic2D(nx=10, nz=10, micro="blk_1m", grid="node", fct=True,
                    relax_th_rv=True)
    m.run(4, spinup=2)
    assert m._th_eq is not None and m._th_eq.shape == (10,)
    # perturb th strongly; relaxation must pull it back toward th_eq
    m.th = np.broadcast_to(m._th_eq[None, :] + 5.0,
                           m.th.shape).copy()
    before = np.abs(m.th - m._th_eq[None, :]).mean()
    m.step(spinup=False)
    after = np.abs(m.th - m._th_eq[None, :]).mean()
    assert after < before


def test_multichip_exact_sstp_cond():
    """exact per-particle substepping on the device mesh: the per-SD
    sstp_tmp arrays shard and migrate with their SDs (reference conditional
    distmem_real_vctrs registration, particles_impl.ipp:440-494)."""
    from libcloudphxx_tpu import lgrngn

    def lognormal(lnr):
        return (60e6 * np.exp(-(lnr - np.log(0.02e-6)) ** 2
                              / 2 / np.log(1.4) ** 2)
                / np.log(1.4) / np.sqrt(2 * np.pi))

    def build(dev_count):
        oi = lgrngn.opts_init_t()
        oi.nx, oi.nz = 12, 6
        oi.dx = oi.dz = 25.0
        oi.x1, oi.z1 = 300.0, 150.0
        oi.dt = 1.0
        oi.sd_conc = 16
        oi.n_sd_max = 12 * 6 * 16 * 2
        oi.sstp_cond = 4
        oi.exact_sstp_cond = True
        oi.dry_distros = {(0.61, 0.0): lognormal}
        oi.terminal_velocity = lgrngn.vt_t.beard77fast
        oi.kernel = lgrngn.kernel_t.geometric
        oi.dev_count = dev_count
        backend = (lgrngn.backend_t.multi_CUDA if dev_count > 1
                   else lgrngn.backend_t.serial)
        prt = lgrngn.factory(backend, oi)
        th = np.full((12, 6), 289.99)
        rv = np.full((12, 6), 7.5e-3)
        rhod = np.full((12, 6), 1.12)
        prt.init(th, rv, rhod, Cx=np.full((13, 6), 0.3),
                 Cz=np.full((12, 7), 0.05))
        return prt, th, rv

    prt_s, th_s, rv_s = build(1)
    prt_m, th_m, rv_m = build(4)
    opts = lgrngn.opts_t()
    opts.coal = False
    for _ in range(4):
        prt_s.step_sync(opts, th_s, rv_s)
        prt_s.step_async(opts)
        prt_m.step_sync(opts, th_m, rv_m)
        prt_m.step_async(opts)
    np.testing.assert_allclose(th_m, th_s, rtol=0, atol=1e-9)
    np.testing.assert_allclose(rv_m, rv_s, rtol=0, atol=1e-12)


def test_multichip_open_side_walls():
    """open x walls on the mesh: SDs leaving the global domain die instead
    of wrapping through the ring (single-device transport.bcnd kills them)."""
    from libcloudphxx_tpu import lgrngn

    def lognormal(lnr):
        return (60e6 * np.exp(-(lnr - np.log(0.02e-6)) ** 2
                              / 2 / np.log(1.4) ** 2)
                / np.log(1.4) / np.sqrt(2 * np.pi))

    def build(dev_count):
        oi = lgrngn.opts_init_t()
        oi.nx, oi.nz = 8, 4
        oi.dx = oi.dz = 10.0
        oi.x1, oi.z1 = 80.0, 40.0
        oi.dt = 1.0
        oi.sd_conc = 8
        oi.n_sd_max = 8 * 4 * 8 * 2
        oi.open_side_walls = True
        oi.dry_distros = {(0.61, 0.0): lognormal}
        oi.terminal_velocity = lgrngn.vt_t.beard77fast
        oi.kernel = lgrngn.kernel_t.geometric
        oi.dev_count = dev_count
        backend = (lgrngn.backend_t.multi_CUDA if dev_count > 1
                   else lgrngn.backend_t.serial)
        prt = lgrngn.factory(backend, oi)
        th = np.full((8, 4), 289.99)
        rv = np.full((8, 4), 7.5e-3)
        rhod = np.full((8, 4), 1.12)
        prt.init(th, rv, rhod, Cx=np.full((9, 4), 0.5),
                 Cz=np.full((8, 5), 0.0))
        return prt, th, rv

    prt_s, th_s, rv_s = build(1)
    prt_m, th_m, rv_m = build(4)
    opts = lgrngn.opts_t()
    opts.coal = False
    opts.cond = False
    opts.sedi = False
    for _ in range(4):
        prt_s.step_sync(opts, th_s, rv_s)
        prt_s.step_async(opts)
        prt_m.step_sync(opts, th_m, rv_m)
        prt_m.step_async(opts)
    for p in (prt_s, prt_m):
        p.diag_all()
        p.diag_sd_conc()
    np.testing.assert_array_equal(prt_m.outbuf(), prt_s.outbuf())
    # SDs really left: the rightward drift empties upstream columns
    assert prt_s.outbuf().sum() < 8 * 4 * 8
