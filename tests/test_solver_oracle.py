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
