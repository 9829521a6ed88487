"""Reference-compatible super-droplet initialisation (mt19937, float32).

The reference's serial backend draws init randoms from std::mt19937 through
std::uniform_real_distribution<float> (src/detail/urand.hpp:20-88), and the
icicle host model instantiates the whole engine with real_t = float
(models/kinematic_2D/cases/icmw8_case1.hpp:21).  numpy's legacy
``RandomState`` uses the very same MT19937 core with the same small-integer
seeding, so the raw uint32 stream — and hence every u01 float — can be
replicated bit-for-bit.  This module re-creates the exact draw ORDER and the
exact float32 arithmetic of the reference's sd_conc init pipeline:

    init_dist_analysis_sd_conc   (particles_impl_init_dist_analysis.ipp:38-77)
    init_count_num / init_ijk    (particles_impl_init_ijk.ipp:36-52)
    init_dry_sd_conc             (particles_impl_init_dry_sd_conc.ipp:43-90)
    init_n_sd_conc               (particles_impl_init_n.ipp:47-137)
    init_xyz                     (particles_impl_init_xyz.ipp:17-35, :40+)

so that SD positions, dry radii and multiplicities match the reference
serial/float build to within one float ulp — the precondition for the fig_a
golden-data gates (sd_conc |delta| <= 1 after 20 advection steps).

Only the ``sd_conc`` init mode is reproduced here; it is what the GMD-2015
regression uses.  Everything else falls back to the native JAX init.
"""

import ctypes
import ctypes.util
import dataclasses

import jax.numpy as jnp
import numpy as np

from ..common import constants as c
from . import init as init_host
from .state import State, StaticConfig

f32 = np.float32

# The reference's float build calls glibc logf/expf; numpy's own f32
# SIMD log/exp differ from glibc by 1 ulp at some inputs, which is enough to
# flip integer multiplicities at the floor(+0.5) knife edge.  Route the f32
# transcendentals through libm itself.
_libm = ctypes.CDLL(ctypes.util.find_library("m") or "libm.so.6")
for _fn in ("logf", "expf"):
    getattr(_libm, _fn).restype = ctypes.c_float
    getattr(_libm, _fn).argtypes = [ctypes.c_float]
_logf_u = np.frompyfunc(lambda v: _libm.logf(float(v)), 1, 1)
_expf_u = np.frompyfunc(lambda v: _libm.expf(float(v)), 1, 1)


def _native():
    from .. import native
    return native if native.available() else None


def logf(a):
    """glibc logf, elementwise, float32-exact (native batch path when the
    toolchain built libcloudphxx_tpu.native, per-element ctypes otherwise)."""
    nat = _native()
    if nat is not None:
        return nat.vec_logf(np.asarray(a, f32))
    return np.asarray(_logf_u(np.asarray(a, f32)), f32)


def expf(a):
    """glibc expf, elementwise, float32-exact."""
    nat = _native()
    if nat is not None:
        return nat.vec_expf(np.asarray(a, f32))
    return np.asarray(_expf_u(np.asarray(a, f32)), f32)

# reference src/detail/config.hpp rd_min_init / rd_max_init
_RD_MIN_INIT = 1e-14
_RD_MAX_INIT = 1e-3


class MT19937U01:
    """Bit-exact replica of the reference serial RNG's u01 stream:
    float(mt19937_uint32) / 2^32 (libstdc++ generate_canonical<float, 24>).
    Uses the native mt19937 (libcloudphxx_tpu.native) when built; numpy's
    legacy RandomState shares the same core generator and seeding, so the
    fallback produces the identical stream."""

    def __init__(self, seed: int):
        nat = _native()
        if nat is not None:
            self._nat = nat.MT19937State(int(seed))
            self._rs = None
        else:
            self._nat = None
            self._rs = np.random.RandomState(seed)

    def u01(self, n: int) -> np.ndarray:
        if self._nat is not None:
            return self._nat.u01(n)
        raw = self._rs.randint(0, 2 ** 32, size=n, dtype=np.uint64)
        return raw.astype(np.uint32).astype(f32) / f32(4294967296.0)


def _dist_analysis_sd_conc_f32(fun, sd_conc, cell_vol, rd_min=-1.0,
                               rd_max=-1.0):
    """float32 replica of init_dist_analysis_sd_conc (the 1.01 bracketing
    walk).  ``fun`` is evaluated at float32 arguments and its result is cast
    to float32, mirroring the reference's real_t=float distro functor.
    Returns (log_rd_min, log_rd_max, multiplier) as float32."""
    if rd_min >= 0 and rd_max >= 0:
        mult = f32(logf(f32(rd_max) / f32(rd_min))[()] / f32(sd_conc)
                   * f32(cell_vol))
        return logf(f32(rd_min))[()], logf(f32(rd_max))[()], mult

    lo, hi = f32(_RD_MIN_INIT), f32(_RD_MAX_INIT)
    while True:
        # multiplier = log(rd_max/rd_min) / sd_conc * dt * dx*dy*dz, all f32
        mult = f32(f32(logf(hi / lo)[()] ) / f32(sd_conc) * f32(cell_vol))
        log_lo = logf(lo)[()]
        log_hi = logf(hi)[()]
        n_min = int(f32(f32(fun(log_lo)) * mult))  # n_t cast == truncation
        n_max = int(f32(f32(fun(log_hi)) * mult))
        if lo == f32(_RD_MIN_INIT) and n_min != 0:
            raise RuntimeError(
                "Initial dry radii distribution is non-zero for rd_min_init"
            )
        if hi == f32(_RD_MAX_INIT) and n_max != 0:
            raise RuntimeError(
                "Initial dry radii distribution is non-zero for rd_max_init"
            )
        if n_min == 0:
            lo = f32(lo * f32(1.01))
        elif n_max == 0:
            hi = f32(hi / f32(1.01))
        else:
            return log_lo, log_hi, mult


def init_SD_reference(cfg: StaticConfig, oi, state: State, seed: int,
                      rhod_host: np.ndarray, dv_host: np.ndarray) -> State:
    """sd_conc-mode SD init with the reference's exact mt19937 draw order and
    float32 arithmetic (see module docstring).  ``rhod_host``/``dv_host`` are
    per-cell arrays; they are consumed in float32 like the reference device
    vectors."""
    if not (oi.dry_distros and oi.sd_conc > 0):
        raise ValueError("reference init replica supports sd_conc mode only")

    n_cell = cfg.n_cell
    rng = MT19937U01(seed)
    rhod32 = np.asarray(rhod_host, f32)
    dv32 = np.asarray(dv_host, f32)
    # 0-D parcel: the reference's dv is 1 kg of dry air (dv = 1/rhod,
    # hskpng_Tpr.ipp:295-303, run before init_SD) and the distro-analysis
    # multiplier uses dv[0] (init_dist_analysis.ipp:27-33)
    cell_vol = (float(dv32[0]) if cfg.n_dims == 0
                else cfg.dx * cfg.dy * cfg.dz)
    rho_stp32 = f32(c.rho_stp)

    def key_parts(key):
        if isinstance(key, tuple):
            return key[0], (key[1] if len(key) > 1 else 0.0)
        return key, 0.0

    # pass 1: total lnrd range over all distros (init_SD_with_distros.ipp:18-27)
    analyses = {}
    tot_rng = f32(0.0)
    for key, fun in oi.dry_distros.items():
        analyses[key] = _dist_analysis_sd_conc_f32(
            fun, oi.sd_conc, cell_vol, oi.rd_min, oi.rd_max)
        tot_rng = f32(tot_rng + f32(analyses[key][1] - analyses[key][0]))

    lnrd_l, n_l, kpa_l, ijk_l, insol_l, x_l, z_l, y_l = \
        [], [], [], [], [], [], [], []

    for key, fun in oi.dry_distros.items():
        kappa, rd_insol = key_parts(key)
        log_lo, log_hi, mult = analyses[key]
        fraction = f32(f32(log_hi - log_lo) / tot_rng)
        # multiplier *= sd_conc / int(fraction*sd_conc + .5)  [INTEGER division,
        # init_SD_with_distros_sd_conc.ipp:28]
        count_round = int(f32(fraction * f32(oi.sd_conc)) + 0.5)
        if count_round == 0:
            continue  # this mode's share of sd_conc rounds to no SDs
        mult = f32(mult * f32(int(oi.sd_conc) // count_round))
        # count_num = n_t(fraction * sd_conc)  [truncation]
        count = int(f32(fraction * f32(oi.sd_conc)))
        if count == 0:
            continue
        n_to_init = n_cell * count

        # ijk: cell-major, count SDs per cell (init_ijk.ipp)
        ijk = np.repeat(np.arange(n_cell, dtype=np.int64), count)

        # --- dry radii (init_dry_sd_conc.ipp calc_lnrd)
        u01 = rng.u01(n_to_init)
        stratum = np.tile(np.arange(count, dtype=np.uint64), n_cell)
        t = stratum.astype(f32) + u01          # uint + float -> float, f32
        lnrd = f32(log_lo + t * f32(log_hi - log_lo) / f32(count))
        rd3 = expf(f32(3.0) * lnrd)

        # --- multiplicities (init_n.ipp:47-137; lnrd recomputed from rd3 as
        # real_t(log(x) / 3.) — logf widened, divided in double, cast back)
        lnrd_back = f32(logf(rd3).astype(np.float64) / 3.0)
        val = f32(mult * init_host._eval_distro(fun, lnrd_back).astype(f32))
        if not oi.aerosol_independent_of_rhod:
            val = f32(val * rhod32[ijk] / rho_stp32)
        factor = init_host.conc_factor_cells(cfg, oi)
        if factor is not None:
            # particles_impl_init_n.ipp:100-110 (between the STP correction
            # and the cell-volume adjustment)
            val = f32(val * factor.astype(f32)[ijk])
        if cfg.n_dims > 0:
            val = f32(val * dv32[ijk] / f32(f32(cfg.dx) * f32(cfg.dy)
                                            * f32(cfg.dz)))
        multiplicity = np.floor(val + f32(0.5)).astype(np.float64)

        # --- positions (init_xyz.ipp; draw order x, y, z — absent dims skip)
        i = ijk // (max(1, cfg.nz) * max(1, cfg.ny))
        j = (ijk // max(1, cfg.nz)) % max(1, cfg.ny)
        k = ijk % max(1, cfg.nz)
        dims = []
        if oi.nx > 0:
            dims.append(("x", i, oi.x0, oi.x1, oi.dx, x_l))
        if oi.ny > 0:
            dims.append(("y", j, oi.y0, oi.y1, oi.dy, y_l))
        if oi.nz > 0:
            dims.append(("z", k, oi.z0, oi.z1, oi.dz, z_l))
        for _, ii, p0, p1, dp, acc in dims:
            u = rng.u01(n_to_init)
            hi_b = np.minimum(f32(p1), (ii + 1).astype(f32) * f32(dp))
            lo_b = np.maximum(f32(p0), ii.astype(f32) * f32(dp))
            # u01*min(...) is f32; (1.-u01)*max(...) promotes to double,
            # the sum is cast back to real_t (init_xyz.ipp:33)
            pos = f32((u * hi_b).astype(np.float64)
                      + (1.0 - u.astype(np.float64)) * lo_b.astype(np.float64))
            acc.append(pos.astype(np.float64))

        lnrd_l.append(lnrd)
        n_l.append(multiplicity)
        kpa_l.append(np.full(n_to_init, kappa))
        ijk_l.append(ijk)
        insol_l.append(np.full(n_to_init, rd_insol))
        if oi.nx == 0:
            x_l.append(np.zeros(n_to_init))
        if oi.ny == 0:
            y_l.append(np.zeros(n_to_init))
        if oi.nz == 0:
            z_l.append(np.zeros(n_to_init))

    mult_all = np.concatenate(n_l)
    # the reference stores rd3 as float32 (expf); keep those exact values
    rd3_all = np.concatenate(
        [expf(f32(3.0) * a) for a in lnrd_l]
    ).astype(np.float64)
    ijk_all = np.concatenate(ijk_l).astype(np.int32)
    n_part = mult_all.size
    if n_part > cfg.n_sd_max:
        raise RuntimeError(
            f"lgrngn init: n_part ({n_part}) exceeds n_sd_max ({cfg.n_sd_max})"
        )
    pad = cfg.n_sd_max - n_part
    dtype = state.rd3.dtype

    def padded(arr, fill=0.0):
        return jnp.asarray(np.concatenate([arr, np.full(pad, fill)]), dtype)

    return dataclasses.replace(
        state,
        n=padded(mult_all),
        rd3=padded(rd3_all, fill=1e-30),
        kpa=padded(np.concatenate(kpa_l)),
        x=padded(np.concatenate(x_l)),
        y=padded(np.concatenate(y_l)),
        z=padded(np.concatenate(z_l)),
        ijk=jnp.asarray(
            np.concatenate([ijk_all, np.zeros(pad, np.int32)]), jnp.int32),
        vt=jnp.zeros((cfg.n_sd_max,), dtype),
        rd2_insol=padded(np.concatenate(insol_l) ** 2),
    )
