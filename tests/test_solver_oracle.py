"""Element-wise parity of the implicit condensation solve vs the reference.

Builds a tiny C++ oracle (tools/refcond_oracle/main.cpp) that reassembles
the reference's advance_rw2 — backward-Euler wet growth with the
Maxwell-Mason / kappa-Koehler / Kelvin / transition-regime / ventilation
minfun and the TOMS-748 solver (eps_tolerance 16 bits, <=100 iters,
cond_mlt 2; reference src/impl/condensation/common/
particles_impl_cond_common.ipp:80-338 + src/detail/config.hpp:181-205) from
the reference's OWN header-only physics, and compares our
fixed-iteration Anderson-Bjoerck solve droplet by droplet.

Max relative difference is bounded by the reference's own toms748 stopping
tolerance (2^-14), so the gate is 1e-4.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

REF = "/root/reference/include"
SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tools", "refcond_oracle")

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(REF) and shutil.which("g++")),
    reason="reference headers or g++ unavailable")


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    exe = tmp_path_factory.mktemp("oracle") / "oracle"
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-D__device__=",
         f"-I{SRC}", f"-I{REF}",
         os.path.join(SRC, "main.cpp"), "-o", str(exe)],
        check=True, capture_output=True)
    return str(exe)


@pytest.fixture(scope="module")
def blk2m_oracle(tmp_path_factory):
    exe = tmp_path_factory.mktemp("blk2m") / "oracle"
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-D__device__=",
         f"-I{SRC}", f"-I{REF}",
         os.path.join(SRC, "blk2m_oracle.cpp"), "-o", str(exe)],
        check=True, capture_output=True)
    return str(exe)


@pytest.fixture(scope="module")
def blk2m_col_oracle(tmp_path_factory):
    exe = tmp_path_factory.mktemp("blk2m_col") / "oracle"
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-D__device__=",
         f"-I{SRC}", f"-I{REF}",
         os.path.join(SRC, "blk2m_col_oracle.cpp"), "-o", str(exe)],
        check=True, capture_output=True)
    return str(exe)


def test_blk_2m_rhs_cellwise_matches_reference_oracle(blk2m_oracle):
    """The whole Morrison-Grabowski per-cell chain (activation ->
    cond/evap -> limiters -> acnv -> accr -> collision sink), element-wise
    vs the reference's own formula headers with the icicle aerosol modes
    (tools/refcond_oracle/blk2m_oracle.cpp re-assembles
    rhs_cellwise.hpp:21-300 without the zip iterator)."""
    import jax.numpy as jnp
    from libcloudphxx_tpu import blk_2m

    rng = np.random.default_rng(1)
    N = 3000
    rhod = rng.uniform(0.7, 1.2, N)
    th = rng.uniform(285, 300, N)
    rv = rng.uniform(5e-3, 9.5e-3, N)
    rc = np.where(rng.random(N) < 0.7, rng.uniform(0, 2.5e-3, N), 0.0)
    nc = np.where(rc > 0, rng.uniform(1e5, 2e8, N), 0.0)
    rr = np.where(rng.random(N) < 0.5, rng.uniform(0, 5e-4, N), 0.0)
    nr = np.where(rr > 0, rng.uniform(1e2, 1e7, N), 0.0)
    dt = 1.0
    rows = np.stack([rhod, th, rv, rc, nc, rr, nr], axis=1)
    inp = "\n".join(" ".join(f"{v:.17g}" for v in r) for r in rows)
    out = subprocess.run([blk2m_oracle, str(dt)], input=inp,
                         capture_output=True, text=True, check=True)
    ref = np.array([[float(x) for x in line.split()]
                    for line in out.stdout.strip().split("\n")])
    opts = blk_2m.opts_t(dry_distros=(
        blk_2m.lognormal_mode_t(mean_rd=0.02e-6, sdev_rd=1.4, N_stp=60e6,
                                chem_b=0.55),
        blk_2m.lognormal_mode_t(mean_rd=0.075e-6, sdev_rd=1.6, N_stp=40e6,
                                chem_b=0.55),
    ))
    zero = jnp.zeros(N)
    dots = blk_2m.rhs_cellwise(
        opts, zero, zero, zero, zero, zero, zero,
        jnp.asarray(rhod), jnp.asarray(th), jnp.asarray(rv),
        jnp.asarray(rc), jnp.asarray(nc), jnp.asarray(rr),
        jnp.asarray(nr), dt)
    ours = np.stack([np.asarray(d) for d in dots], axis=1)
    rel = np.abs(ours - ref) / np.maximum(np.abs(ref), 1e-20)
    rel = np.where(np.abs(ref) > 1e-20, rel, 0.0)
    assert rel.max() < 1e-10, rel.max()


def test_blk_2m_rhs_columnwise_matches_reference_oracle(blk2m_col_oracle):
    """Two-moment rain sedimentation column chain element-wise vs the
    reference's own v_term_m/v_term_n formulas + flux-limited upstream
    scheme (rhs_columnwise.hpp:20-141)."""
    import jax.numpy as jnp
    from libcloudphxx_tpu import blk_2m

    rng = np.random.default_rng(2)
    NZ = 76
    dt, dz = 1.0, 1500.0 / 76
    opts = blk_2m.opts_t()
    for _ in range(10):
        rhod = np.linspace(1.2, 0.7, NZ) * rng.uniform(0.95, 1.05)
        rr = np.where(rng.random(NZ) < 0.6, rng.uniform(0, 5e-4, NZ), 0.0)
        nr = np.where(rr > 0, rng.uniform(1e2, 1e7, NZ), 0.0)
        dot_rr0 = rng.uniform(-1e-7, 1e-7, NZ)
        dot_nr0 = rng.uniform(-1e1, 1e1, NZ)
        inp = "\n".join(
            f"{rhod[k]:.17g} {rr[k]:.17g} {nr[k]:.17g} "
            f"{dot_rr0[k]:.17g} {dot_nr0[k]:.17g}" for k in range(NZ))
        out = subprocess.run(
            [blk2m_col_oracle, str(dt), str(dz), str(NZ)], input=inp,
            capture_output=True, text=True, check=True)
        lines = out.stdout.strip().split("\n")
        ref = np.array([[float(x) for x in l.split()] for l in lines[:NZ]])
        ref_flux = float(lines[NZ])
        drr, dnr, flux = blk_2m.rhs_columnwise(
            opts, jnp.asarray(dot_rr0)[None, :],
            jnp.asarray(dot_nr0)[None, :], jnp.asarray(rhod)[None, :],
            jnp.asarray(rr)[None, :], jnp.asarray(nr)[None, :], dt, dz)
        sc = lambda a: np.maximum(np.abs(a), 1e-12)
        assert (np.abs(np.asarray(drr)[0] - ref[:, 0])
                / sc(ref[:, 0])).max() < 1e-10
        assert (np.abs(np.asarray(dnr)[0] - ref[:, 1])
                / sc(ref[:, 1])).max() < 1e-10
        assert abs(float(np.asarray(flux)[0]) - ref_flux) \
            <= 1e-10 * max(abs(ref_flux), 1e-12)


def test_advance_rw2_matches_reference_oracle(oracle):
    import jax.numpy as jnp
    from libcloudphxx_tpu.common import (const_cp, mean_free_path as mfp,
                                         moist_air, theta_dry)
    from libcloudphxx_tpu.common import vterm as cv
    from libcloudphxx_tpu.lgrngn.condensation import _advance_rw2_core

    rng = np.random.default_rng(0)
    N = 4000
    # two lognormal modes incl. GCCNs, like the substepping test's parcel
    lnrd = np.concatenate([
        np.log(0.02e-6 / 2) + np.log(1.4) * rng.standard_normal(N // 2),
        np.log(4e-6 / 2) + np.log(1.2) * rng.standard_normal(N // 2)])
    rd3 = np.exp(3 * lnrd)
    kpa = np.where(np.arange(N) < N // 2, 0.61, 1.28)
    th, rv, rhod = 304.375, 0.0085 + 0.0006 / 8, 1.1 - 0.1 / 8
    T = float(theta_dry.T(th, rhod))
    p = float(theta_dry.p(rhod, rv, T))
    RH = float(moist_air.p_v(p, rv) / const_cp.p_vs(T))
    eta = float(cv.visc(T))
    lD = float(mfp.lambda_D(T))
    lK = float(mfp.lambda_K(T, p))
    rd2 = rd3 ** (2.0 / 3)
    rw2 = rd2 * rng.uniform(1.2, 9.0, N)
    vt = np.zeros(N)
    dt, RH_max = 1.0 / 8, 1.005

    rows = np.stack([rw2, rd3, kpa, vt, np.full(N, rhod), np.full(N, rv),
                     np.full(N, T), np.full(N, p), np.full(N, RH),
                     np.full(N, eta), np.full(N, lD), np.full(N, lK)],
                    axis=1)
    inp = "\n".join(" ".join(f"{v:.17g}" for v in r) for r in rows)
    out = subprocess.run([oracle, f"{dt:.17g}", f"{RH_max:.17g}"],
                         input=inp, capture_output=True, text=True,
                         check=True)
    ref = np.array([float(x) for x in out.stdout.split()])
    ours = np.asarray(_advance_rw2_core(
        dt, *(jnp.asarray(c) for c in rows.T), RH_max))
    rel = np.abs(ours - ref) / np.maximum(np.abs(ref), 1e-300)
    assert rel.max() < 1e-4, rel.max()
