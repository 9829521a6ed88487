"""Native (C) runtime components: build, bit-equality with the Python
fallbacks, and the golden-parity init running through them."""

import numpy as np
import pytest

from libcloudphxx_tpu import native


@pytest.mark.skipif(not native.available(),
                    reason="no C toolchain on this machine")
def test_native_mt19937_matches_numpy_legacy():
    st = native.MT19937State(44)
    mine = st.u01(4096)
    rs = np.random.RandomState(44)
    raw = rs.randint(0, 2 ** 32, size=4096, dtype=np.uint64)
    ref = raw.astype(np.uint32).astype(np.float32) / np.float32(2 ** 32)
    np.testing.assert_array_equal(mine, ref)


@pytest.mark.skipif(not native.available(),
                    reason="no C toolchain on this machine")
def test_native_transcendentals_match_libm():
    import ctypes
    import ctypes.util
    libm = ctypes.CDLL(ctypes.util.find_library("m") or "libm.so.6")
    libm.logf.restype = ctypes.c_float
    libm.logf.argtypes = [ctypes.c_float]
    libm.expf.restype = ctypes.c_float
    libm.expf.argtypes = [ctypes.c_float]
    rng = np.random.default_rng(3)
    x = np.float32(np.exp(rng.uniform(-30, 3, 4096)))
    got = native.vec_logf(x)
    ref = np.array([libm.logf(float(v)) for v in x], np.float32)
    np.testing.assert_array_equal(got, ref)
    y = np.float32(rng.uniform(-80, 80, 4096))
    np.testing.assert_array_equal(
        native.vec_expf(y),
        np.array([libm.expf(float(v)) for v in y], np.float32))


def test_refinit_stream_stable_under_native_toggle():
    """The refinit u01 stream must be identical whichever backend built it
    (the golden-parity gates depend on it)."""
    from libcloudphxx_tpu.lgrngn.refinit import MT19937U01
    a = MT19937U01(44).u01(1000)
    rs = np.random.RandomState(44)
    raw = rs.randint(0, 2 ** 32, size=1000, dtype=np.uint64)
    ref = raw.astype(np.uint32).astype(np.float32) / np.float32(2 ** 32)
    np.testing.assert_array_equal(a, ref)
