"""Golden-data acceptance test vs the reference's committed fig_a refdata.

Mirrors the reference CI gate travis_2D_kin_cloud_diff_lgrngn
(models/kinematic_2D/tests/paper_GMD_2015/fig_a/CMakeLists.txt:101-115):
the icicle kinematic model at the travis configuration (60x60, nt=20,
spinup=10, sd_conc=64, sstp_cond=sstp_coal=10, serial backend), compared
against the committed HDF5 refdata with h5diff tolerances:

    t=0 : th, rv, sd_conc relative <= 1e-9
    t=20: th relative <= 1e-3; rv relative <= 2.1e-3; sd_conc |delta| <= 1

Our run reproduces the reference's mt19937/float32 init sampling
(lgrngn/refinit.py) and the libmpdata++ grid/coupling conventions
(models/kinematic_2d.py grid="node"), so t=0 matches bit-for-bit and t=20
passes with wide margins (typical: th 5e-5, rv 7e-4, sd_conc +/-1 in ~50 of
3600 cells — pure trajectory fp noise vs the float32 reference build).
"""

import os

import numpy as np
import pytest

REFDATA = ("/root/reference/models/kinematic_2D/tests/paper_GMD_2015/"
           "fig_a/refdata/travis_out_lgrngn")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFDATA), reason="reference refdata not available"
)


@pytest.fixture(scope="module")
def travis_run():
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import golden_parity
    snaps = golden_parity.run_travis(verbose=False)
    return golden_parity.compare(snaps, REFDATA)


@pytest.fixture(scope="module")
def travis_run_dense():
    """The same travis case through the dense cell-major engine behind the
    public factory (the production fast path) — same reference gates."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import golden_parity
    snaps = golden_parity.run_travis(verbose=False, engine="dense")
    return golden_parity.compare(snaps, REFDATA)


def test_t0_bit_exact(travis_run):
    """Initial condition: h5diff --relative=1e-9 on th, rv, sd_conc."""
    for k in ("th", "rv", "sd_conc"):
        assert travis_run[0][k]["max_rel"] <= 1e-9, (k, travis_run[0][k])


def test_t20_th(travis_run):
    assert travis_run[20]["th"]["max_rel"] <= 1e-3, travis_run[20]["th"]


def test_t20_rv(travis_run):
    assert travis_run[20]["rv"]["max_rel"] <= 2.1e-3, travis_run[20]["rv"]


def test_t20_sd_conc(travis_run):
    assert travis_run[20]["sd_conc"]["max_abs"] <= 1.0, \
        travis_run[20]["sd_conc"]


@pytest.mark.slow
def test_dense_engine_golden(travis_run_dense):
    """fig_a gates through the dense engine (CMakeLists.txt:101-115)."""
    r = travis_run_dense
    for k in ("th", "rv", "sd_conc"):
        assert r[0][k]["max_rel"] <= 1e-9, (k, r[0][k])
    assert r[20]["th"]["max_rel"] <= 1e-3, r[20]["th"]
    assert r[20]["rv"]["max_rel"] <= 2.1e-3, r[20]["rv"]
    assert r[20]["sd_conc"]["max_abs"] <= 1.0, r[20]["sd_conc"]


@pytest.fixture(scope="module")
def travis_run_resident():
    """The travis case through the RESIDENT Pallas kernel behind the public
    3-phase API (round 5): dense_front dispatches the cond half in
    step_cond and the coal+transport half in step_async; on CPU the kernel
    runs under the Mosaic interpreter at f32."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    import golden_parity
    os.environ["LIBCLOUD_RESIDENT"] = "interpret"
    os.environ["LIBCLOUD_DENSE_F32"] = "1"
    try:
        snaps = golden_parity.run_travis(verbose=False, engine="dense")
    finally:
        os.environ.pop("LIBCLOUD_RESIDENT", None)
        os.environ.pop("LIBCLOUD_DENSE_F32", None)
    return golden_parity.compare(snaps, REFDATA)


@pytest.mark.slow
def test_resident_public_golden(travis_run_resident):
    """fig_a gates through the resident-kernel public path — the headline
    performance path must satisfy the same reference CI tolerances
    (CMakeLists.txt:101-115)."""
    r = travis_run_resident
    for k in ("th", "rv", "sd_conc"):
        assert r[0][k]["max_rel"] <= 1e-9, (k, r[0][k])
    assert r[20]["th"]["max_rel"] <= 1e-3, r[20]["th"]
    assert r[20]["rv"]["max_rel"] <= 2.1e-3, r[20]["rv"]
    assert r[20]["sd_conc"]["max_abs"] <= 1.0, r[20]["sd_conc"]
