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
from .pallas_compact import stable_partition_rows

# input layout bookkeeping
_SD_PLANES = 6          # n, rw2, rd3, kpa, x, z
_CELL_VECS = 16         # thadv rvadv th0 rv0 rhod dv lamD lamK Cl Cr Cb Ca
#                         i_row k_row w_LS p0


def _xmerge_values(nz, q, keys_lcr, planes_lcr):
    """The x-merge on VALUES: dest row r takes its own stays plus the
    window-compacted right-movers of row r-nz and left-movers of row r+nz
    (x-periodic through the neighbour copies).  ``keys_lcr`` is the
    (left, centre, right) triple of xkey blocks (q, cap); ``planes_lcr`` a
    list of such triples.  Returns (out_planes, drops) with out_planes
    compacted (q, cap) blocks, alive lanes first.

    Shared by the standalone rebin_x kernel and the x-merge prologue of
    the resident step (the deferred-x pipeline)."""
    f32 = jnp.float32
    k_l, k_c, k_r = keys_lcr
    cap = k_c.shape[1]
    M = cap // 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (q, cap), 1)
    in_win = (lane < M).astype(jnp.float32)

    keep = jnp.where(k_c == 2.0, f32(1.0), f32(0.0)) \
        + jnp.where(k_c < 2.0, f32(1.0), f32(0.0)) * (1.0 - in_win)

    def window(l, c, r):
        w = jnp.concatenate([l, c, r], axis=0)
        # right-movers of global row r-nz sit at window row q + j - nz;
        # left-movers of row r+nz at q + j + nz (slices wrap through the
        # neighbour copies, which implements x-periodicity for any nblk).
        # pltpu.roll + an aligned [0, q) slice: a direct slice at offset
        # q - nz is sublane-misaligned and Mosaic cannot concatenate the
        # resulting layout
        wr = pltpu.roll(w, shift=(2 * q + nz) % (3 * q), axis=0)[:q]
        wl = pltpu.roll(w, shift=(2 * q - nz) % (3 * q), axis=0)[:q]
        return wr, wl

    kw_r, kw_l = window(k_l, k_c, k_r)
    sel_r = jnp.where(kw_r == 1.0, f32(1.0), f32(0.0)) * in_win
    sel_l = jnp.where(kw_l == 0.0, f32(1.0), f32(0.0)) * in_win

    planes = []
    for (l, c, r) in planes_lcr:
        wr, wl = window(l, c, r)
        # right-movers in lanes [0, M), left-movers rotated to [M, 2M):
        # one full-width segment (Mosaic cannot concat lane-offset slices)
        planes.append(jnp.concatenate(
            [c * keep, wr * sel_r + jnp.roll(wl * sel_l, M, axis=1)],
            axis=1))

    m_alive = jnp.concatenate(
        [keep, sel_r + jnp.roll(sel_l, M, axis=1)], axis=1) \
        * jnp.where(planes[0] > 0, f32(1.0), f32(0.0))
    fkey = jnp.where(m_alive > 0, f32(0.0), f32(1.0))
    # alive-to-front: a stable binary partition (log L shift stages)
    # replaces the r4 bitonic compaction (log^2 L compare-exchanges)
    outs_p, _nf = stable_partition_rows(m_alive > 0,
                                        (fkey,) + tuple(planes))
    fkey, planes = outs_p[0], list(outs_p[1:])
    lane2 = jax.lax.broadcasted_iota(jnp.int32, fkey.shape, 1)
    drops = jnp.sum(jnp.where((fkey == 0.0) & (lane2 >= cap),
                              f32(1.0), f32(0.0)))
    outs = tuple(p[:, :cap] for p in planes)
    outs = (jnp.where(fkey[:, :cap] == 0.0, outs[0], f32(0.0)),) + outs[1:]
    return outs, drops


def _kernel(cfg, sstp_cond, sstp_coal, dt, RH_max, do_cond, do_coal,
            do_adve, do_sedi, do_subs, block_rows, do_rebin, do_xmerge,
            r_max_um, eff_clamp, x_wrap, coal_pairing, *refs):
    seed_ref, params_ref = refs[0], refs[1]
    pos = 2
    eff_ref = None
    if eff_clamp:
        # tabulated collision efficiencies as one whole-table VMEM block
        # (clamped_efficiency_table), shared by every grid step
        eff_ref = refs[pos]
        pos += 1
    if do_xmerge:
        win = refs[pos:pos + 21]
        pos += 21
    else:
        (n_ref, rw2_ref, rd3_ref, kpa_ref, x_ref, z_ref) = refs[pos:pos + 6]
        pos += 6
    (thadv_ref, rvadv_ref, th0_ref, rv0_ref, rhod_ref, dv_ref,
     lamD_ref, lamK_ref, cl_ref, cr_ref, cb_ref, ca_ref,
     irow_ref, krow_ref, wls_ref, p0_ref) = refs[pos:pos + 16]
    pos += 16
    (n_out, rw2_out, rd3_out, kpa_out, vt_out, x_out, z_out,
     xkey_out, th_out, rv_out, T_out, p_out, RH_out, eta_out,
     puddle_out) = refs[pos:pos + 15]
    from ..common import constants as c
    from ..common import theta_dry, theta_std
    from ..common import vterm as cv
    from ..common.fastmath import cbrt_pos
    from ..lgrngn import hskpng
    from ..lgrngn.condensation import _advance_rw2_core
    from ..lgrngn.dense import pair_and_collide
    from ..lgrngn.enums import as_t

    p0 = p0_ref[:]

    def closure(th, rv, rhod):
        # per-cell T/p/RH/eta (dense._Tpr, hskpng_Tpr.ipp:219-305):
        # th_dry or th_std, variable or prescribed pressure — static
        # branches on the config
        if cfg.th_dry:
            T = theta_dry.T(th, rhod)
        else:
            T = th * theta_std.exner(p0)
        pp = p0 if cfg.const_p else theta_dry.p(rhod, rv, T)
        RH = hskpng.RH_of(cfg, pp, rv, T)
        eta = cv.visc(T)
        return T, pp, RH, eta

    if do_coal:
        # PRNG used only by the coalescence shuffle; seeding is conditional
        # so the cond/transport-only variant stays CPU-interpretable
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    drops_x = jnp.float32(0.0)
    coal_ovf = jnp.float32(0.0)
    if do_xmerge:
        # deferred x pass of the PREVIOUS step's re-binning: reconstruct
        # row-correct planes from the [left | centre | right] block window
        # before any physics reads them
        triple = lambda j: tuple(win[3 * j + t][:] for t in range(3))
        (n, rw2, rd3, kpa, x, z), drops_x = _xmerge_values(
            cfg.nz, block_rows, triple(6), [triple(j) for j in range(6)])
    else:
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

    do_transport = do_adve or do_sedi or do_subs
    # ---------------- condensation: percell substepping -----------------
    # (reference particles_step.ipp:237-256 + sstp_percell_step.ipp:7-49;
    # same math as lgrngn/dense.step_cond).  With do_cond=False (the
    # transport-only phase of the public 3-phase API) th0/rv0 carry the
    # POST-cond cell values and only the T/p/RH/eta closure runs.
    th0 = th0_ref[:]
    rv0 = rv0_ref[:]
    if do_cond:
        dth = (thadv_ref[:] - th0) / sstp_cond
        drv_adv = (rvadv_ref[:] - rv0) / sstp_cond
        dt_sub_c = dt / sstp_cond
        wgt = n * jnp.float32((4.0 / 3) * c.pi * c.rho_w) / (dv * rhod)
        # vt is STALE during cond (dense.step_cond uses d.vt, the refresh
        # at the end of the previous step_async).  That refresh used T/p
        # derived from th0/rv0 (= sstp_tmp, saved at the previous cond
        # phase's end) and the CURRENT rw2 (transport does not change
        # rw2), so recomputing it here from (rw2, th0, rv0) reproduces the
        # stored plane exactly — saving one input plane.
        T_prev, p_prev, _RH_prev, eta_prev = closure(th0, rv0, rhod)
        vt = _vt_in_kernel(cfg, rw2, T_prev, p_prev, rhod, eta_prev)

        def cond_sub(_, carry):
            rw2, th, rv = carry
            th = th + dth
            rv = rv + drv_adv
            T, p, RH, eta = closure(th, rv, rhod)
            rw2n = _advance_rw2_core(
                dt_sub_c, rw2, rd3, kpa, vt, rhod, rv, T, p, RH, eta,
                lam_D, lam_K, jnp.float32(RH_max))
            drw3 = rw2n * jnp.sqrt(rw2n) \
                - rw2 * jnp.sqrt(jnp.maximum(rw2, 0.0))
            dcell = -jnp.sum(wgt * drw3, axis=1, keepdims=True)
            rv = rv + dcell
            th = th + dcell * theta_dry.d_th_d_rv(T, th)
            return rw2n, th, rv

        rw2, th, rv = jax.lax.fori_loop(
            0, sstp_cond, cond_sub, (rw2, th0, rv0))
    else:
        th, rv = th0, rv0
    T, p, RH, eta = closure(th, rv, rhod)

    # ---------------- coalescence substep loop ---------------------------
    if do_coal:
        dt_sub = dt / sstp_coal
        if eff_ref is not None:
            from ..lgrngn.coalescence import interpolated_efficiency_sweep
            eff_tbl = eff_ref[:]
            eff_fn = functools.partial(interpolated_efficiency_sweep,
                                       eff_clamp)
        else:
            eff_tbl, eff_fn = None, None

        if coal_pairing == "stride":
            # XOR-stride pairing (dense.pair_and_collide_stride): ONE
            # random bitonic shuffle per stride cycle, partners fetched
            # by lane rolls in between — the per-substep shuffle sort
            # was ~3.5 ms of the 16.4 ms step (PERF_r04.md).  Strides
            # are 2^sidx, so the dynamic stride value is a shift; only
            # the rolls need static amounts (lax.switch over the cycle).
            from ..lgrngn.dense import pair_and_collide_partners
            cap_w = n.shape[1]
            n_strides = 1
            while (1 << n_strides) <= cap_w // 4 and n_strides < 6:
                n_strides += 1
            lane = jax.lax.broadcasted_iota(jnp.int32, n.shape, 1)

            def shuffle(planes):
                u = _u01(planes[0].shape)
                skey = jnp.where(planes[0] > 0, u, 2.0)
                _, planes = bitonic_sort_rows(skey, planes)
                return planes

            def fetch(stride, ride):
                return tuple(
                    jnp.where((lane & stride) == 0,
                              jnp.roll(a, -stride, axis=1),
                              jnp.roll(a, stride, axis=1))
                    for a in ride)

            def coal_sub(i, carry):
                sidx = jax.lax.rem(i, n_strides)
                planes = jax.lax.cond(sidx == 0, shuffle,
                                      lambda q: q, carry[:6])
                n, rw2, rd3, kpa, x, z = planes
                vt = _vt_in_kernel(cfg, rw2, T, p, rhod, eta)
                u01 = _u01(n.shape)
                ride = (n, rw2, rd3, kpa, vt, u01)
                pn, prw2, prd3, pkpa, pvt, pu01 = jax.lax.switch(
                    sidx,
                    [functools.partial(fetch, 1 << s)
                     for s in range(n_strides)],
                    ride)
                stride_dyn = jax.lax.shift_left(jnp.int32(1), sidx)
                is_a = (lane & stride_dyn) == 0
                n, rw2, rd3, kpa, _o = pair_and_collide_partners(
                    cfg, params, (n, rw2, rd3, kpa, vt),
                    (pn, prw2, prd3, pkpa, pvt), is_a,
                    dv, rhod, eta, dt_sub, u01, pu01,
                    eff_table=eff_tbl, r_max_um=r_max_um, eff_fn=eff_fn,
                    cbrt_fn=lambda v: cbrt_pos(jnp.maximum(v, 1e-38)))
                ovf = jnp.maximum(carry[6],
                                  jnp.where(_o, jnp.float32(1.0),
                                            jnp.float32(0.0)))
                return (n, rw2, rd3, kpa, x, z, ovf)

            n, rw2, rd3, kpa, x, z, coal_ovf = jax.lax.fori_loop(
                0, sstp_coal, coal_sub,
                (n, rw2, rd3, kpa, x, z, jnp.float32(0.0)))
        else:
            # Reference-faithful per-substep shuffle.  Ride-thin: x and z
            # are not read by the pairing math, so a lane-id plane rides
            # the per-substep sorts in their place and ONE final unsort
            # (ascending id) restores the original lane order,
            # re-aligning the mutated planes with the untouched x/z.
            # vt is recomputed AFTER each shuffle from the sorted rw2 —
            # the same per-SD values, one ride cheaper.  5 rides per
            # stage instead of 7; the PRNG draw order is unchanged, so
            # pairing (and hence physics) is bitwise identical to the
            # ride-everything loop.
            def coal_sub(_, carry):
                n, rw2, rd3, kpa, idp, ovf = carry
                u = _u01(n.shape)
                skey = jnp.where(n > 0, u, 2.0)
                _, (n, rw2, rd3, kpa, idp) = bitonic_sort_rows(
                    skey, (n, rw2, rd3, kpa, idp))
                vt = _vt_in_kernel(cfg, rw2, T, p, rhod, eta)
                count = jnp.sum((n > 0).astype(n.dtype), axis=1,
                                keepdims=True)
                u01 = _u01(n.shape)
                n, rw2, rd3, kpa, _o = pair_and_collide(
                    cfg, params, (n, rw2, rd3, kpa, vt), count,
                    dv, rhod, eta, dt_sub, u01,
                    eff_table=eff_tbl, r_max_um=r_max_um, eff_fn=eff_fn,
                    cbrt_fn=lambda v: cbrt_pos(jnp.maximum(v, 1e-38)))
                ovf = jnp.maximum(ovf, jnp.where(_o, jnp.float32(1.0),
                                                 jnp.float32(0.0)))
                return (n, rw2, rd3, kpa, idp, ovf)

            id0 = jax.lax.broadcasted_iota(
                jnp.int32, n.shape, 1).astype(jnp.float32)
            n, rw2, rd3, kpa, idp, coal_ovf = jax.lax.fori_loop(
                0, sstp_coal, coal_sub,
                (n, rw2, rd3, kpa, id0, jnp.float32(0.0)))
            _, (n, rw2, rd3, kpa) = bitonic_sort_rows(
                idp, (n, rw2, rd3, kpa))

    # final vterm refresh (hskpng_vterm_invalid after the last substep /
    # hskpng_vterm_all at step_async entry).  The cond-only phase keeps
    # the stale plane instead — the XLA step_cond never touches vt.
    if do_transport or not do_cond:
        vt = _vt_in_kernel(cfg, rw2, T, p, rhod, eta)

    # ---------------- advection + sedi + subs + walls --------------------
    # (same math as lgrngn/dense.adve_sedi_bcnd, row-local)
    i_row = irow_ref[:]
    k_row = krow_ref[:]
    dx = jnp.float32(cfg.dx)
    dz = jnp.float32(cfg.dz)

    if do_adve:
        C_l = cl_ref[:]
        C_r = cr_ref[:]
        C_b = cb_ref[:]
        C_a = ca_ref[:]
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

    liq_vol = dry_vol = liq_num = prt_num = jnp.float32(0.0)
    if do_transport:
        x0 = jnp.float32(cfg.x0)
        x1 = jnp.float32(cfg.x1)
        z0 = jnp.float32(cfg.z0)
        z1 = jnp.float32(cfg.z1)
        if not x_wrap:
            # mesh shard: x stays unwrapped — cross-shard movers and
            # open-wall kills belong to the distributed re-binning
            # (parallel/dense_mesh.rebin_sharded)
            pass
        elif not cfg.open_side_walls:
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
            liq_vol = jnp.sum(
                vol_c * nf * rw2 * jnp.sqrt(jnp.maximum(rw2, 0.0)))
            dry_vol = jnp.sum(vol_c * nf * rd3)
            liq_num = jnp.sum(jnp.where(rw2 > 0, nf, 0.0))
            prt_num = jnp.sum(nf)
            n = jnp.where(fell, 0.0, n)

    # ---------------- in-kernel re-binning: z phase ----------------------
    # (the post_copy hskpng_ijk equivalent, post_copy.ipp:18-36, done as
    # structural exchange like lgrngn/dense._rebin_neighbor but in VMEM:
    # classify dk = k_tgt - k, compact movers to the lane front with one
    # bitonic pass, merge [self-stays | ups from row-1 | downs from row+1]
    # and re-compact.  Alive z-movers never wrap x-columns (the walls just
    # above kill every SD leaving [z0, z1)), so the axis-0 rolls need no
    # masking at column boundaries as long as each block is a whole number
    # of x-columns (block_rows % nz == 0, enforced by step_resident).
    far_flag = jnp.float32(0.0)
    drops = drops_x
    if do_rebin:
        cap = n.shape[1]
        M = cap // 2
        nz_f = jnp.float32(cfg.nz)
        nx_f = jnp.float32(cfg.nx)
        alive = n > 0
        # same cell math as hskpng.ijk_of_xyz at f32 (the grid starts at 0,
        # not x0 — init_grid.ipp:33-52)
        k_tgt = jnp.clip(jnp.floor(z / dz), 0.0, nz_f - 1.0)
        dk = k_tgt - k_row
        far_z = alive & (jnp.abs(dk) > 1.0)
        f32 = jnp.float32
        zkey = jnp.where(alive & (dk == 1.0), f32(0.0),
                         jnp.where(alive & (dk == -1.0), f32(1.0),
                                   jnp.where(alive, f32(2.0), f32(3.0))))
        zkey = jnp.where(far_z, f32(2.0), zkey)  # stay put; global-rebin fixes
        # movers-to-front is all the merge below needs (it reads zkey by
        # VALUE): one stable binary partition, not a 4-class sort
        (zkey, n, rw2, rd3, kpa, vt, x, z), _nf = stable_partition_rows(
            zkey < 2.0, (zkey, n, rw2, rd3, kpa, vt, x, z))
        lane = jax.lax.broadcasted_iota(jnp.int32, zkey.shape, 1)
        in_win = (lane < M).astype(jnp.float32)
        nmov = jnp.sum(jnp.where(zkey < 2.0, f32(1.0), f32(0.0)),
                       axis=1, keepdims=True)
        win_ovf = jnp.max(jnp.where(nmov > M, f32(1.0), f32(0.0)))

        planes = (n, rw2, rd3, kpa, vt, x, z)
        # movers beyond the transfer window stay in place (flagged)
        keep = jnp.where(zkey == 2.0, f32(1.0), f32(0.0)) \
            + jnp.where(zkey < 2.0, f32(1.0), f32(0.0)) * (1.0 - in_win)
        # pltpu.roll: the dedicated sublane-rotate primitive — jnp.roll
        # along axis 0 leaves a sublane-offset layout Mosaic cannot feed
        # into tpu.concatenate
        rows_blk = zkey.shape[0]
        roll0 = lambda a, sh: pltpu.roll(a, shift=sh % rows_blk, axis=0)
        up_k = roll0(zkey, 1)      # row r-1's SDs at row r
        dn_k = roll0(zkey, -1)
        sel_up = jnp.where(up_k == 0.0, f32(1.0), f32(0.0)) * in_win
        sel_dn = jnp.where(dn_k == 1.0, f32(1.0), f32(0.0)) * in_win

        # ups (masked to lanes < M) and downs (rotated into lanes
        # [M, 2M)) pack into ONE full-width segment: Mosaic cannot
        # concatenate lane-offset slices, but full-width rolls are free
        def seg(p):
            up = roll0(p, 1) * sel_up
            dn = jnp.roll(roll0(p, -1) * sel_dn, M, axis=1)
            return jnp.concatenate([p * keep, up + dn], axis=1)

        merged = tuple(seg(p) for p in planes)
        m_alive = jnp.concatenate(
            [keep, sel_up + jnp.roll(sel_dn, M, axis=1)], axis=1) \
            * jnp.where(merged[0] > 0, f32(1.0), f32(0.0))

        # x classification for the NEXT pass (ops/pallas_step.rebin_x):
        # left-mover 0 / right-mover 1 / stay 2 / dead 3; movers are
        # compacted to the lane front by the same sort that re-compacts
        # the z merge, so the x pass can take a fixed [0, M) window.
        i_tgt = jnp.clip(jnp.floor(merged[5] / dx), 0.0, nx_f - 1.0)
        di = i_tgt - i_row
        is_l = (di == -1.0) | (di == nx_f - 1.0)
        is_r = (di == 1.0) | (di == -(nx_f - 1.0))
        is_s = di == 0.0
        far_x = (m_alive > 0) & ~(is_l | is_r | is_s)
        xkey = jnp.where(m_alive == 0, f32(3.0),
                         jnp.where(is_l, f32(0.0),
                                   jnp.where(is_r, f32(1.0), f32(2.0))))
        nmovx = jnp.sum(jnp.where(xkey < 2.0, f32(1.0), f32(0.0)), axis=1,
                        keepdims=True)
        win_ovf = jnp.maximum(
            win_ovf, jnp.max(jnp.where(nmovx > M, f32(1.0), f32(0.0))))
        far_flag = win_ovf + jnp.max(jnp.where(far_z, f32(1.0), f32(0.0))) \
            + jnp.max(jnp.where(far_x, f32(1.0), f32(0.0)))

        # the x pass needs movers in the [0, M) window (read by value) and
        # the dead compacted past every live SD before the [:, :cap] trim:
        # two stable binary partitions (movers front, then alive front —
        # stability keeps movers first) replace the 4-class bitonic sort
        outs_p, _nf2 = stable_partition_rows(xkey < 2.0, (xkey,) + merged)
        outs_p, _nf2 = stable_partition_rows(outs_p[0] < 3.0, outs_p)
        xkey, merged = outs_p[0], outs_p[1:]
        lane2 = jax.lax.broadcasted_iota(jnp.int32, xkey.shape, 1)
        drops = drops + jnp.sum(jnp.where((xkey < 3.0) & (lane2 >= cap),
                                          f32(1.0), f32(0.0)))
        n, rw2, rd3, kpa, vt, x, z = tuple(p[:, :cap] for p in merged)
        n = jnp.where(xkey[:, :cap] < 3.0, n, f32(0.0))
        xkey_out[:] = xkey[:, :cap]
    else:
        xkey_out[:] = jnp.zeros_like(n)

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
    # 0-3 of sublane 0: liq_vol, dry_vol, liq_num, prtcl_num; lane 4: the
    # far-mover/window-overflow flag, lane 5: re-bin drops), summed by
    # the caller; Mosaic requires the trailing dims be (8k, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 2)
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 1)
    on = lambda i, v: jnp.where((sub == 0) & (lane == i), v, 0.0)
    puddle_out[:] = on(0, liq_vol) + on(1, dry_vol) \
        + on(2, liq_num) + on(3, prt_num) + on(4, far_flag) \
        + on(5, drops) + on(6, coal_ovf)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "sstp_cond", "sstp_coal", "dt", "RH_max",
                     "do_coal", "do_sedi", "do_subs", "do_cond", "do_adve",
                     "block_rows", "do_rebin", "interpret", "r_max_um",
                     "eff_clamp", "x_wrap", "coal_pairing"),
)
def step_resident(cfg, sstp_cond, sstp_coal, dt, RH_max, do_coal, do_sedi,
                  do_subs, seed, params,
                  n, rw2, rd3, kpa, x, z,
                  thadv, rvadv, th0, rv0, rhod, dv, lam_D, lam_K,
                  C_l, C_r, C_b, C_a, w_LS_cells, p0_cells=None,
                  xkey=None, eff_table=None,
                  *, do_cond=True, do_adve=True, block_rows=128,
                  do_rebin=False, interpret=False, r_max_um=0.0,
                  eff_clamp=0, x_wrap=True, coal_pairing="stride"):
    """One full microphysics step (cond + coal + transport) as a single
    Pallas kernel over row blocks.

    The phase flags carve out the public 3-phase API's split dispatch
    (lgrngn/dense_front): ``do_cond=True, do_adve=do_sedi=do_subs=
    do_coal=False`` is the step_cond half (th0/rv0 = pre-sync values,
    thadv/rvadv = freshly advected fields); ``do_cond=False`` with the
    transport toggles is the step_async half (th0/rv0 = the POST-cond
    cell values; thadv/rvadv unused).  Default flags = the fused
    whole-step kernel of the device-resident model loop.

    With ``do_rebin`` the kernel also resolves the z axis of the
    post-transport re-binning in VMEM and classifies SDs for the x pass
    (rebin_x below); ``block_rows`` must then be a whole number of
    x-columns (a multiple of cfg.nz) that divides n_cell.

    With ``xkey`` (the previous step's x classification) the kernel ALSO
    applies the deferred x pass as a prologue, reading the SD planes
    through a [left | centre | right] block window — the steady-state
    pipeline is then ONE kernel per model step, with rebin_x needed only
    as an end-of-run flush.

    SD planes (n_cell, cap) f32; cell vectors (n_cell,) f32.  Returns
    (n, rw2, rd3, kpa, vt, x, z, xkey, th, rv, T, p, RH, eta, puddle)
    where puddle lanes 4/5 carry the far-mover flag and re-bin drops."""
    n_cell, cap = n.shape
    do_xmerge = xkey is not None
    if (eff_table is not None) != (eff_clamp > 0):
        raise ValueError("step_resident: eff_table and eff_clamp must be "
                         "passed together (clamped_efficiency_table)")
    if eff_table is not None and eff_table.shape != (128, 128):
        raise ValueError("step_resident: eff_table must be the (128, 128) "
                         "clamped block")
    if do_rebin and not x_wrap:
        # the in-kernel re-binning derives x targets from wrapped
        # positions; a mesh shard re-bins through rebin_sharded instead
        raise ValueError("step_resident: do_rebin requires x_wrap")
    if do_xmerge and not do_rebin:
        # without do_rebin the block-divisibility check below is skipped
        # and pad rows zero-fill, making padded xkey lanes read as
        # 0.0 == left-mover — which would corrupt the prologue merge
        raise ValueError("step_resident: xkey requires do_rebin")
    if do_rebin and not (do_adve or do_sedi or do_subs):
        raise ValueError("step_resident: do_rebin without any transport")
    if cap & (cap - 1):
        # the in-kernel bitonic network silently MIS-SORTS at widths that
        # are not powers of two — refuse loudly (callers gate via
        # dense.resident_ok; this protects direct users)
        raise ValueError(f"step_resident: cap must be a power of two, "
                         f"got {cap}")
    if do_rebin and (block_rows % cfg.nz or n_cell % block_rows):
        raise ValueError(
            f"step_resident: do_rebin needs block_rows ({block_rows}) to be "
            f"a multiple of nz ({cfg.nz}) dividing n_cell ({n_cell})")
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

    arrays = tuple(prep(a) for a in (n, rw2, rd3, kpa, x, z)
                   + ((xkey,) if do_xmerge else ()))
    if p0_cells is None:
        p0_cells = jnp.full_like(jnp.asarray(rhod, jnp.float32), 1e5)
    cells = tuple(
        prep_cell(a, f) for a, f in (
            (thadv, 300.0), (rvadv, 0.01), (th0, 300.0), (rv0, 0.01),
            (rhod, 1.0), (dv, 1.0), (lam_D, 1e-7), (lam_K, 1e-7),
            (C_l, 0.0), (C_r, 0.0), (C_b, 0.0), (C_a, 0.0),
            (i_row, 0.0), (k_row, 0.0), (w_LS_cells, 0.0),
            (p0_cells, 1e5)))
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

    # the efficiency table (when present) sits between params and the SD
    # planes: one whole-table block every grid step reads
    n_eff = 1 if eff_table is not None else 0
    eff_args = ()
    eff_specs = []
    if n_eff:
        eff_args = (jnp.asarray(eff_table, jnp.float32),)
        eff_specs = [pl.BlockSpec((128, 128), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)]

    if do_xmerge:
        # each of the 7 SD arrays (6 planes + xkey) is read three times
        # through left/centre/right index maps; in-place aliasing would
        # race the sequential grid (block i's write vs block i+1's window
        # read), so the outputs get fresh buffers
        spec_l = pl.BlockSpec((block_rows, cap),
                              lambda i: ((i + nblk - 1) % nblk, 0),
                              memory_space=pltpu.VMEM)
        spec_r = pl.BlockSpec((block_rows, cap),
                              lambda i: ((i + 1) % nblk, 0),
                              memory_space=pltpu.VMEM)
        sd_specs = [spec_l, spec, spec_r] * 7
        sd_args = []
        for a in arrays:
            sd_args += [a, a, a]
        aliases = {}
    else:
        sd_specs = [spec] * _SD_PLANES
        sd_args = list(arrays)
        # alias the six mutated SD planes in place (n,rw2,rd3,kpa,x,z ->
        # outputs 0-3, 5, 6); the round-3 convention that removes all
        # layout copies around the call
        aliases = {2 + n_eff: 0, 3 + n_eff: 1, 4 + n_eff: 2,
                   5 + n_eff: 3, 6 + n_eff: 5, 7 + n_eff: 6}

    sd_shape = jax.ShapeDtypeStruct(arrays[0].shape, jnp.float32)
    cell_shape = jax.ShapeDtypeStruct((nblk * block_rows, 1), jnp.float32)
    outs = pl.pallas_call(
        functools.partial(_kernel, cfg, sstp_cond, sstp_coal, dt, RH_max,
                          do_cond, do_coal, do_adve, do_sedi, do_subs,
                          block_rows, do_rebin, do_xmerge,
                          r_max_um, eff_clamp, x_wrap, coal_pairing),
        grid=(nblk,),
        out_shape=tuple([sd_shape] * 8 + [cell_shape] * 6
                        + [jax.ShapeDtypeStruct((nblk, 8, 128),
                                                jnp.float32)]),
        in_specs=[scal, scal] + eff_specs + sd_specs + [cspec] * 16,
        out_specs=tuple([spec] * 8 + [cspec] * 6 + [pspec]),
        input_output_aliases=aliases,
        interpret=interpret,
        # the default 16 MB scoped-vmem limit is too small for (a) the
        # unrolled efficiency sweep's live temporaries (22.2 MB at bench
        # shape) and (b) the partition epilogue's two per-direction
        # streams at row capacity 256 (16.31 MB — the r5 sustained-rain
        # redo path compiles cap-256 kernels); physical VMEM is 128 MB
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 << 20),
    )(seed32, params32, *eff_args, *sd_args, *cells)

    sd = tuple(o[:n_cell] for o in outs[:8])
    cell_out = tuple(o[:n_cell, 0] for o in outs[8:14])
    puddle = jnp.sum(outs[14][:, 0, :7], axis=0)
    return sd + cell_out + (puddle,)


# ------------------------------------------------------------------------
# x pass of the in-kernel re-binning: dest row r takes its own stays plus
# the window-compacted right-movers of row r-nz and left-movers of row
# r+nz (x-periodic).  The classification + compaction happened inside
# step_resident's epilogue (the xkey plane), so this kernel is one merge +
# one bitonic compaction, reading a [left | centre | right] block window
# through three index maps.
def _xmerge_kernel(cfg, block_rows, mp_iters, mp_fct, *refs):
    (n_l, n_c, n_r, rw2_l, rw2_c, rw2_r,
     rd3_l, rd3_c, rd3_r, kpa_l, kpa_c, kpa_r,
     vt_l, vt_c, vt_r, x_l, x_c, x_r, z_l, z_c, z_r,
     k_l, k_c, k_r) = refs[:24]
    pos = 24
    if mp_iters:
        th_ref, rv_ref, gcx_ref, gcz_ref, G_ref = refs[pos:pos + 5]
        pos += 5
    (n_out, rw2_out, rd3_out, kpa_out, vt_out, x_out, z_out,
     flags_out) = refs[pos:pos + 8]
    pos += 8
    planes_lcr = [(l[:], c[:], r[:]) for (l, c, r) in
                  ((n_l, n_c, n_r), (rw2_l, rw2_c, rw2_r),
                   (rd3_l, rd3_c, rd3_r), (kpa_l, kpa_c, kpa_r),
                   (vt_l, vt_c, vt_r), (x_l, x_c, x_r), (z_l, z_c, z_r))]
    outs_v, drops = _xmerge_values(
        cfg.nz, block_rows, (k_l[:], k_c[:], k_r[:]), planes_lcr)
    outs = (n_out, rw2_out, rd3_out, kpa_out, vt_out, x_out, z_out)
    for o, p in zip(outs, outs_v):
        o[:] = p
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 2)
    sub3 = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 1)
    flags_out[:] = jnp.where((sub3 == 0) & (lane3 == 0), drops, 0.0)
    if mp_iters:
        # the NEXT step's Eulerian MPDATA advection of (th, rv), computed
        # once in grid step 0 — an independent whole-grid epilogue that
        # rides this dispatch instead of paying its own ~0.85 ms kernel
        # floor (PERF_r05).  The r4 in-MAIN-kernel fusion stays blocked
        # on the (nx, nz) -> (n_cell, 1) reshape; here the result is a
        # standalone output, so no reshape is needed.
        tha_ref, rva_ref = refs[pos:pos + 2]
        from ..models.mpdata import _advect_body

        @pl.when(pl.program_id(0) == 0)
        def _():
            Gv = G_ref[:]
            gcx, gcz = gcx_ref[:], gcz_ref[:]
            tha_ref[:] = _advect_body(th_ref[:], gcx, gcz, Gv,
                                      mp_iters, mp_fct)
            rva_ref[:] = _advect_body(rv_ref[:], gcx, gcz, Gv,
                                      mp_iters, mp_fct)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "block_rows", "interpret", "mp_iters",
                     "mp_fct"),
)
def rebin_x(cfg, n, rw2, rd3, kpa, vt, x, z, xkey,
            *, block_rows, interpret=False, mpdata_fields=None,
            mp_iters=0, mp_fct=False):
    """The x pass of the in-kernel re-binning (see _xmerge_kernel).

    With ``mpdata_fields`` = (th, rv, gc_x, gc_z, G) and ``mp_iters`` > 0
    the kernel ALSO advects the two scalars (the next model step's MPDATA,
    models/mpdata._advect_body) as a grid-step-0 epilogue, saving one
    whole-grid dispatch per step.

    Returns (n, rw2, rd3, kpa, vt, x, z, drops[, th_adv, rv_adv])."""
    n_cell, cap = n.shape
    if cap & (cap - 1):
        raise ValueError(f"rebin_x: cap must be a power of two, got {cap}")
    if block_rows % cfg.nz or n_cell % block_rows:
        raise ValueError(
            f"rebin_x: block_rows ({block_rows}) must be a multiple of nz "
            f"({cfg.nz}) dividing n_cell ({n_cell})")
    if (mpdata_fields is not None) != (mp_iters > 0):
        raise ValueError("rebin_x: mpdata_fields and mp_iters go together")
    nblk = n_cell // block_rows

    spec_c = pl.BlockSpec((block_rows, cap), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    spec_l = pl.BlockSpec((block_rows, cap),
                          lambda i: ((i + nblk - 1) % nblk, 0),
                          memory_space=pltpu.VMEM)
    spec_r = pl.BlockSpec((block_rows, cap),
                          lambda i: ((i + 1) % nblk, 0),
                          memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)  # whole array

    arrays = []
    for a in (n, rw2, rd3, kpa, vt, x, z, xkey):
        a = a.astype(jnp.float32)
        arrays += [a, a, a]
    mp_args, mp_in_specs, mp_out_shapes, mp_out_specs = (), [], [], []
    if mp_iters:
        th2, rv2, gcx, gcz, G = mpdata_fields
        G = jnp.broadcast_to(jnp.asarray(G, th2.dtype), th2.shape)
        mp_args = tuple(jnp.asarray(a, jnp.float32)
                        for a in (th2, rv2, gcx, gcz, G))
        mp_in_specs = [wspec] * 5
        mp_out_shapes = [jax.ShapeDtypeStruct(th2.shape, jnp.float32)] * 2
        mp_out_specs = [wspec] * 2
    sd_shape = jax.ShapeDtypeStruct((n_cell, cap), jnp.float32)
    outs = pl.pallas_call(
        functools.partial(_xmerge_kernel, cfg, block_rows, mp_iters,
                          mp_fct),
        grid=(nblk,),
        out_shape=tuple([sd_shape] * 7
                        + [jax.ShapeDtypeStruct((nblk, 8, 128),
                                                jnp.float32)]
                        + mp_out_shapes),
        in_specs=[spec_l, spec_c, spec_r] * 8 + mp_in_specs,
        out_specs=tuple([spec_c] * 7 + [pspec] + mp_out_specs),
        interpret=interpret,
        # the width-2cap partition streams need > 16 MB scoped vmem at
        # row capacity 256 (21.3 MB measured; physical VMEM is 128 MB)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 << 20),
    )(*arrays, *mp_args)
    drops = jnp.sum(outs[7][:, 0, 0])
    return outs[:7] + (drops,) + tuple(outs[8:])
