"""Kernel-resident microphysics step: cond + coal + transport in ONE
Pallas TPU kernel.

PERF_r03 established that the dense-layout step is bound by the ~1 ms XLA
dispatch floor times the kernel count, not by FLOPs: 10 condensation
substeps + 10 coalescence substeps + transport cost ~35 separate XLA
kernels even after fusion.  This kernel runs the ENTIRE Lagrangian model
step (reference step_sync + step_async minus re-binning,
src/particles_step.ipp:161-494) on-core:

  - per-cell substepped condensation with the implicit per-droplet
    root-find (percell path, particles_step.ipp:237-256 +
    cond_common.ipp:187-338) — row reductions for the latent-heat update,
  - the coalescence substep loop (particles_impl_coal.ipp:273-546) with
    the in-VMEM bitonic shuffle and on-core PRNG of ops/pallas_coal,
  - terminal-velocity refreshes (hskpng_vterm),
  - SD advection (implicit/euler), sedimentation, subsidence, wall
    handling and puddle accumulation (adve.ipp:28-93, sedi.ipp:13-24,
    bcnd.ipp:214-365).

Everything is row-local (each grid cell owns one row of the occupancy
matrix), so one grid dimension over row blocks suffices; only the
post-transport re-binning (cross-row) stays outside (lgrngn/dense.rebin).
All physics functions are the SAME jnp code as the XLA dense path
(dense.pair_and_collide, condensation._advance_rw2_core, common.*), so
the two backends cannot drift.

Calling convention (the round-3 lesson, PERF_r03.md): the six mutated SD
planes alias their outputs in place, and cell vectors travel as (rows, 1)
column blocks — zero layout copies around the call.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

from .pallas_coal import _u01, _vt_in_kernel, bitonic_sort_rows

# input layout bookkeeping
_SD_PLANES = 6          # n, rw2, rd3, kpa, x, z
_CELL_VECS = 15         # thadv rvadv th0 rv0 rhod dv lamD lamK Cl Cr Cb Ca
#                         i_row k_row w_LS


def _kernel(cfg, sstp_cond, sstp_coal, dt, RH_max, do_coal, do_sedi,
            do_subs, block_rows,
            seed_ref, params_ref,
            n_ref, rw2_ref, rd3_ref, kpa_ref, x_ref, z_ref,
            thadv_ref, rvadv_ref, th0_ref, rv0_ref, rhod_ref, dv_ref,
            lamD_ref, lamK_ref, cl_ref, cr_ref, cb_ref, ca_ref,
            irow_ref, krow_ref, wls_ref,
            n_out, rw2_out, rd3_out, kpa_out, vt_out, x_out, z_out,
            th_out, rv_out, T_out, p_out, RH_out, eta_out, puddle_out):
    from ..common import constants as c
    from ..common import theta_dry
    from ..common import vterm as cv
    from ..common.fastmath import cbrt_pos
    from ..lgrngn import hskpng
    from ..lgrngn.condensation import _advance_rw2_core
    from ..lgrngn.dense import pair_and_collide
    from ..lgrngn.enums import as_t

    if do_coal:
        # PRNG used only by the coalescence shuffle; seeding is conditional
        # so the cond/transport-only variant stays CPU-interpretable
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    n = n_ref[:]
    rw2 = rw2_ref[:]
    rd3 = rd3_ref[:]
    kpa = kpa_ref[:]
    x = x_ref[:]
    z = z_ref[:]
    rhod = rhod_ref[:]
    dv = dv_ref[:]
    lam_D = lamD_ref[:]
    lam_K = lamK_ref[:]
    params = jnp.stack([params_ref[0]])

    # ---------------- condensation: percell substepping -----------------
    # (reference particles_step.ipp:237-256 + sstp_percell_step.ipp:7-49;
    # same math as lgrngn/dense.step_cond)
    th0 = th0_ref[:]
    rv0 = rv0_ref[:]
    dth = (thadv_ref[:] - th0) / sstp_cond
    drv_adv = (rvadv_ref[:] - rv0) / sstp_cond
    dt_sub_c = dt / sstp_cond
    wgt = n * jnp.float32((4.0 / 3) * c.pi * c.rho_w) / (dv * rhod)
    # vt is STALE during cond (dense.step_cond uses d.vt, the refresh at
    # the end of the previous step_async).  That refresh used T/p derived
    # from th0/rv0 (= sstp_tmp, saved at the previous cond phase's end) and
    # the CURRENT rw2 (transport does not change rw2), so recomputing it
    # here from (rw2, th0, rv0) reproduces the stored plane exactly —
    # saving one input plane.
    T_prev = theta_dry.T(th0, rhod)
    p_prev = theta_dry.p(rhod, rv0, T_prev)
    eta_prev = cv.visc(T_prev)
    vt = _vt_in_kernel(cfg, rw2, T_prev, p_prev, rhod, eta_prev)

    def cond_sub(_, carry):
        rw2, th, rv = carry
        th = th + dth
        rv = rv + drv_adv
        T = theta_dry.T(th, rhod)
        p = theta_dry.p(rhod, rv, T)
        RH = hskpng.RH_of(cfg, p, rv, T)
        eta = cv.visc(T)
        rw2n = _advance_rw2_core(
            dt_sub_c, rw2, rd3, kpa, vt, rhod, rv, T, p, RH, eta,
            lam_D, lam_K, jnp.float32(RH_max))
        drw3 = rw2n * jnp.sqrt(rw2n) - rw2 * jnp.sqrt(jnp.maximum(rw2, 0.0))
        dcell = -jnp.sum(wgt * drw3, axis=1, keepdims=True)
        rv = rv + dcell
        th = th + dcell * theta_dry.d_th_d_rv(T, th)
        return rw2n, th, rv

    rw2, th, rv = jax.lax.fori_loop(
        0, sstp_cond, cond_sub, (rw2, th0, rv0))
    T = theta_dry.T(th, rhod)
    p = theta_dry.p(rhod, rv, T)
    RH = hskpng.RH_of(cfg, p, rv, T)
    eta = cv.visc(T)

    # ---------------- coalescence substep loop ---------------------------
    if do_coal:
        dt_sub = dt / sstp_coal

        def coal_sub(_, carry):
            n, rw2, rd3, kpa, x, z = carry
            vt = _vt_in_kernel(cfg, rw2, T, p, rhod, eta)
            u = _u01(n.shape)
            skey = jnp.where(n > 0, u, 2.0)
            _, (n, rw2, rd3, kpa, vt, x, z) = bitonic_sort_rows(
                skey, (n, rw2, rd3, kpa, vt, x, z))
            count = jnp.sum((n > 0).astype(n.dtype), axis=1, keepdims=True)
            u01 = _u01(n.shape)
            n, rw2, rd3, kpa, _o = pair_and_collide(
                cfg, params, (n, rw2, rd3, kpa, vt), count,
                dv, rhod, eta, dt_sub, u01,
                cbrt_fn=lambda v: cbrt_pos(jnp.maximum(v, 1e-38)))
            return (n, rw2, rd3, kpa, x, z)

        n, rw2, rd3, kpa, x, z = jax.lax.fori_loop(
            0, sstp_coal, coal_sub, (n, rw2, rd3, kpa, x, z))

    # final vterm refresh (hskpng_vterm_invalid after the last substep)
    vt = _vt_in_kernel(cfg, rw2, T, p, rhod, eta)

    # ---------------- advection + sedi + subs + walls --------------------
    # (same math as lgrngn/dense.adve_sedi_bcnd, row-local)
    i_row = irow_ref[:]
    k_row = krow_ref[:]
    C_l = cl_ref[:]
    C_r = cr_ref[:]
    C_b = cb_ref[:]
    C_a = ca_ref[:]
    dx = jnp.float32(cfg.dx)
    dz = jnp.float32(cfg.dz)

    if as_t(cfg.adve_scheme) == as_t.implicit:
        dCx = C_r - C_l
        x = (x + dx * (C_l - i_row * dCx)) / (1.0 - dCx)
        dCz = C_a - C_b
        z = (z + dz * (C_b - k_row * dCz)) / (1.0 - dCz)
    else:  # euler
        dCx = C_r - C_l
        x = x + dCx * (x - dx * i_row) + dx * C_l
        dCz = C_a - C_b
        z = z + dCz * (z - dz * k_row) + dz * C_b

    if do_sedi:
        z = z - jnp.float32(dt) * vt
    if do_subs:
        z = z - jnp.float32(dt) * wls_ref[:]

    x0 = jnp.float32(cfg.x0)
    x1 = jnp.float32(cfg.x1)
    z0 = jnp.float32(cfg.z0)
    z1 = jnp.float32(cfg.z1)
    liq_vol = dry_vol = liq_num = prt_num = jnp.float32(0.0)
    if not cfg.open_side_walls:
        q = x - x0
        w = x1 - x0
        x = x0 + (q - jnp.floor(q / w) * w)
    else:
        n = jnp.where((x >= x1) | (x < x0), 0.0, n)
    if cfg.periodic_topbot_walls:
        q = z - z0
        w = z1 - z0
        z = z0 + (q - jnp.floor(q / w) * w)
    else:
        n = jnp.where(z >= z1, 0.0, n)
        fell = (z < z0) & (n > 0)
        nf = jnp.where(fell, n, 0.0)
        vol_c = jnp.float32(4.0 / 3 * c.pi)
        liq_vol = jnp.sum(vol_c * nf * rw2 * jnp.sqrt(jnp.maximum(rw2, 0.0)))
        dry_vol = jnp.sum(vol_c * nf * rd3)
        liq_num = jnp.sum(jnp.where(rw2 > 0, nf, 0.0))
        prt_num = jnp.sum(nf)
        n = jnp.where(fell, 0.0, n)

    n_out[:] = n
    rw2_out[:] = rw2
    rd3_out[:] = rd3
    kpa_out[:] = kpa
    vt_out[:] = vt
    x_out[:] = x
    z_out[:] = z
    th_out[:] = th
    rv_out[:] = rv
    T_out[:] = T
    p_out[:] = p
    RH_out[:] = RH
    eta_out[:] = eta
    # per-block puddle partials in a tile-aligned (1, 8, 128) block (lane
    # 0-3 of sublane 0: liq_vol, dry_vol, liq_num, prtcl_num), summed by
    # the caller; Mosaic requires the trailing dims be (8k, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 2)
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 1)
    on = lambda i, v: jnp.where((sub == 0) & (lane == i), v, 0.0)
    puddle_out[:] = on(0, liq_vol) + on(1, dry_vol) \
        + on(2, liq_num) + on(3, prt_num)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "sstp_cond", "sstp_coal", "dt", "RH_max",
                     "do_coal", "do_sedi", "do_subs", "block_rows",
                     "interpret"),
)
def step_resident(cfg, sstp_cond, sstp_coal, dt, RH_max, do_coal, do_sedi,
                  do_subs, seed, params,
                  n, rw2, rd3, kpa, x, z,
                  thadv, rvadv, th0, rv0, rhod, dv, lam_D, lam_K,
                  C_l, C_r, C_b, C_a, w_LS_cells,
                  *, block_rows=128, interpret=False):
    """One full microphysics step (cond + coal + transport, re-binning
    excluded) as a single Pallas kernel over row blocks.

    SD planes (n_cell, cap) f32; cell vectors (n_cell,) f32.  Returns
    (n, rw2, rd3, kpa, vt, x, z, th, rv, T, p, RH, eta, puddle4)."""
    n_cell, cap = n.shape
    if cap & (cap - 1):
        # the in-kernel bitonic network silently MIS-SORTS at widths that
        # are not powers of two — refuse loudly (callers gate via
        # dense.resident_ok; this protects direct users)
        raise ValueError(f"step_resident: cap must be a power of two, "
                         f"got {cap}")
    nblk = pl.cdiv(n_cell, block_rows)
    pad_rows = nblk * block_rows - n_cell

    def prep(a):
        a = a.astype(jnp.float32)
        if pad_rows:
            a = jnp.pad(a, ((0, pad_rows), (0, 0)))
        return a

    def prep_cell(a, fill):
        a = a.astype(jnp.float32).reshape(n_cell, 1)
        if pad_rows:
            a = jnp.pad(a, ((0, pad_rows), (0, 0)),
                        constant_values=fill)
        return a

    nz = cfg.nz
    rows = jnp.arange(n_cell, dtype=jnp.int32)
    i_row = (rows // nz).astype(jnp.float32)
    k_row = (rows % nz).astype(jnp.float32)

    arrays = tuple(prep(a) for a in (n, rw2, rd3, kpa, x, z))
    cells = tuple(
        prep_cell(a, f) for a, f in (
            (thadv, 300.0), (rvadv, 0.01), (th0, 300.0), (rv0, 0.01),
            (rhod, 1.0), (dv, 1.0), (lam_D, 1e-7), (lam_K, 1e-7),
            (C_l, 0.0), (C_r, 0.0), (C_b, 0.0), (C_a, 0.0),
            (i_row, 0.0), (k_row, 0.0), (w_LS_cells, 0.0)))
    params32 = jnp.concatenate([
        jnp.asarray(params, jnp.float32).reshape(-1),
        jnp.ones((1,), jnp.float32)])
    seed32 = jnp.asarray(seed, jnp.int32).reshape((1,))

    spec = pl.BlockSpec((block_rows, cap), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((block_rows, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    scal = pl.BlockSpec(memory_space=pltpu.SMEM)

    sd_shape = jax.ShapeDtypeStruct(arrays[0].shape, jnp.float32)
    cell_shape = jax.ShapeDtypeStruct((nblk * block_rows, 1), jnp.float32)
    outs = pl.pallas_call(
        functools.partial(_kernel, cfg, sstp_cond, sstp_coal, dt, RH_max,
                          do_coal, do_sedi, do_subs, block_rows),
        grid=(nblk,),
        out_shape=tuple([sd_shape] * 7 + [cell_shape] * 6
                        + [jax.ShapeDtypeStruct((nblk, 8, 128),
                                                jnp.float32)]),
        in_specs=[scal, scal] + [spec] * _SD_PLANES + [cspec] * 15,
        out_specs=tuple([spec] * 7 + [cspec] * 6 + [pspec]),
        # alias the six mutated SD planes in place (n,rw2,rd3,kpa,x,z ->
        # outputs 0-3, 5, 6); the round-3 convention that removes all
        # layout copies around the call
        input_output_aliases={2: 0, 3: 1, 4: 2, 5: 3, 6: 5, 7: 6},
        interpret=interpret,
    )(seed32, params32, *arrays, *cells)

    sd = tuple(o[:n_cell] for o in outs[:7])
    cell_out = tuple(o[:n_cell, 0] for o in outs[7:13])
    puddle4 = jnp.sum(outs[13][:, 0, :4], axis=0)
    return sd + cell_out + (puddle4,)
