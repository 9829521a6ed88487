"""native — C components of the runtime, built on demand and ctypes-loaded.

The compute path of this framework is JAX/XLA/Pallas; the pieces that stay
host-side (the reference-compatible init sampler's mt19937 stream and
glibc-exact float32 transcendentals) are native C here, mirroring the
reference's split of device physics vs host glue.  The shared library is
compiled once per machine with the system compiler (no pybind11 — plain
ctypes ABI) and cached next to the source; every entry point has a pure
numpy/ctypes fallback so the package works without a toolchain.
"""

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "refinit_core.c")
_LIB = None
_TRIED = False


def _build(out_path):
    for cc in ("cc", "gcc", "g++", "clang"):
        try:
            subprocess.run(
                [cc, "-O2", "-fPIC", "-shared", "-o", out_path, _SRC, "-lm"],
                check=True, capture_output=True, timeout=120,
            )
            return True
        except (OSError, subprocess.SubprocessError):
            continue
    return False


def load():
    """The ctypes library, building it on first use; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_DIR, "refinit_core.so")
    if not os.path.exists(so) or (os.path.getmtime(so)
                                  < os.path.getmtime(_SRC)):
        # build into a temp file first so concurrent imports never load a
        # half-written library
        try:
            fd, tmp = tempfile.mkstemp(suffix=".so", dir=_DIR)
            os.close(fd)
            if not _build(tmp):
                os.unlink(tmp)
                return None
            os.replace(tmp, so)
        except OSError:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.mt19937_seed.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
    lib.mt19937_u01.argtypes = [ctypes.c_void_p, f32p, ctypes.c_int64]
    lib.vec_logf.argtypes = [f32p, f32p, ctypes.c_int64]
    lib.vec_expf.argtypes = [f32p, f32p, ctypes.c_int64]
    _LIB = lib
    return _LIB


class MT19937State:
    """Opaque mt19937 state living in native memory (624 words + index)."""

    def __init__(self, seed: int):
        self._buf = ctypes.create_string_buffer(624 * 4 + 8)
        load().mt19937_seed(ctypes.cast(self._buf, ctypes.c_void_p),
                            ctypes.c_uint32(seed))

    def u01(self, n: int) -> np.ndarray:
        out = np.empty(n, np.float32)
        load().mt19937_u01(
            ctypes.cast(self._buf, ctypes.c_void_p),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int64(n))
        return out


def _vec(fname, a):
    shape = np.shape(a)  # ascontiguousarray promotes 0-d to 1-d
    a = np.ascontiguousarray(a, np.float32)
    out = np.empty_like(a)
    f32p = ctypes.POINTER(ctypes.c_float)
    getattr(load(), fname)(a.ctypes.data_as(f32p),
                           out.ctypes.data_as(f32p),
                           ctypes.c_int64(a.size))
    return out.reshape(shape)


def vec_logf(a):
    return _vec("vec_logf", a)


def vec_expf(a):
    return _vec("vec_expf", a)


def available() -> bool:
    return load() is not None
