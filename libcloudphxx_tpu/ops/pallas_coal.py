"""Pallas TPU kernel for the dense-layout coalescence substep loop.

The cell-major coalescence substep (lgrngn/dense.py coal) is, per substep:
a batched lane-wise shuffle-sort (the reference's random pairing,
particles_impl_coal.ipp:439-450), the pair-collision math, and a terminal-
velocity refresh.  Under plain XLA each substep costs several dispatches
(multi-operand sort, RNG, kernel evaluation) at the ~ms kernel floor; this
kernel runs the WHOLE sstp_coal loop on-chip: rows live in VMEM, the
shuffle is an in-register bitonic sort network over the 128 lanes, random
numbers come from the on-core PRNG, and the collision math is the SAME
pair_and_collide / kernel_value / vterm jnp code the XLA path uses.

Supported (gated by the caller): golovin / geometric / long collision
kernels (no efficiency-table gathers in-kernel) and the formula-based
terminal velocities (beard77 / beard77fast both use the direct beard77
polynomial here — the 10k-bin vt0 cache is itself a discretisation of it —
plus khvorostyanov).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def _xor_shuffle(x, j, lane):
    """x[..., lane ^ j] for power-of-two j: lane^j is lane+j where bit j is
    clear, lane-j where set, so two static rolls + a select cover it
    (static concats — Mosaic has no lane-gather)."""
    fwd = jnp.roll(x, -j, axis=1)
    bwd = jnp.roll(x, j, axis=1)
    return jnp.where((lane & j) == 0, fwd, bwd)


def bitonic_sort_rows(key, vals):
    """Ascending bitonic sort of ``key`` along the last axis (a power of
    two); ``vals`` ride as values.  (rows, L) arrays."""
    r, L = key.shape
    if L & (L - 1):
        raise ValueError(
            f"bitonic_sort_rows: width must be a power of two, got {L}")
    lane = jax.lax.broadcasted_iota(jnp.int32, (r, L), 1)
    k = 2
    while k <= L:
        j = k // 2
        while j >= 1:
            pk = _xor_shuffle(key, j, lane)
            # take-partner predicate in pure mask algebra: Mosaic rejects
            # bool==bool and i1-valued where-branches (arith.trunci)
            jb = (lane & j) != 0
            kb = (lane & k) != 0
            neq = jb ^ kb
            take = ((~neq) & (key > pk)) | (neq & (key < pk))
            key = jnp.where(take, pk, key)
            vals = tuple(
                jnp.where(take, _xor_shuffle(v, j, lane), v) for v in vals)
            j //= 2
        k *= 2
    return key, vals


def _u01(shape):
    """Uniform [0, 1) f32 from the on-core PRNG via the mantissa-fill
    bitcast (uint->float converts don't lower in Mosaic): set the exponent
    to 127 and the mantissa to 23 random bits -> [1, 2), subtract 1."""
    bits = pltpu.prng_random_bits(shape)
    mant = jax.lax.shift_right_logical(
        pltpu.bitcast(bits, jnp.int32), jnp.int32(9))
    f = pltpu.bitcast(jax.lax.bitwise_or(mant, jnp.int32(0x3F800000)),
                      jnp.float32)
    return f - jnp.float32(1.0)


def _vt_in_kernel(cfg, rw2, T, p, rhod, eta):
    """Formula-based terminal velocity (see module docstring)."""
    from ..common import vterm as cv
    from ..lgrngn.enums import vt_t
    rw = jnp.sqrt(jnp.maximum(rw2, 1e-30))
    formula = vt_t(cfg.terminal_velocity)
    if formula in (vt_t.beard77, vt_t.beard77fast):
        v = cv.vt_beard77_fact(rw, p, rhod, eta) * cv.vt_beard77_v0(rw)
    elif formula == vt_t.beard76:
        v = cv.vt_beard76(rw, T, p, rhod, eta)
    elif formula == vt_t.khvorostyanov_spherical:
        v = cv.vt_khvorostyanov(rw, T, rhod, eta, spherical=True)
    elif formula == vt_t.khvorostyanov_nonspherical:
        v = cv.vt_khvorostyanov(rw, T, rhod, eta, spherical=False)
    else:
        v = jnp.zeros_like(rw)
    return jnp.where(rw2 > 0, v, 0.0)


def _kernel(cfg, sstp_coal, dt_sub, seed_ref, params_ref,
            n_ref, rw2_ref, rd3_ref, kpa_ref, x_ref, z_ref,
            T_ref, p_ref, rhod_ref, eta_ref, dv_ref,
            n_out, rw2_out, rd3_out, kpa_out, vt_out, x_out, z_out):
    from ..lgrngn.dense import pair_and_collide
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    n = n_ref[:]
    rw2 = rw2_ref[:]
    rd3 = rd3_ref[:]
    kpa = kpa_ref[:]
    x = x_ref[:]
    z = z_ref[:]
    T = T_ref[:]
    p = p_ref[:]
    rhod = rhod_ref[:]
    eta = eta_ref[:]
    dv = dv_ref[:]
    # SMEM loads scalars only on hardware; the supported kernels (golovin,
    # geometric[, long]) use at most params[0]
    params = jnp.stack([params_ref[0]])
    from ..common.fastmath import cbrt_pos

    def substep(_, carry):
        n, rw2, rd3, kpa, x, z = carry
        # hskpng_vterm_invalid equivalent: refresh vt from current rw2
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
        # the overflow flag is unused here: the kernel is gated to
        # non-pure-const-multi configs (increase_sstp_coal stays on XLA)
        return (n, rw2, rd3, kpa, x, z)

    # rolled loop: the unrolled 10-substep body made the Mosaic program
    # pathologically slow to compile
    n, rw2, rd3, kpa, x, z = jax.lax.fori_loop(
        0, sstp_coal, substep, (n, rw2, rd3, kpa, x, z))
    vt = _vt_in_kernel(cfg, rw2, T, p, rhod, eta)

    n_out[:] = n
    rw2_out[:] = rw2
    rd3_out[:] = rd3
    kpa_out[:] = kpa
    vt_out[:] = vt
    x_out[:] = x
    z_out[:] = z


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "sstp_coal", "dt_sub", "block_rows",
                     "interpret"),
)
def coal_pallas(cfg, sstp_coal, dt_sub, seed, params,
                n, rw2, rd3, kpa, x, z, T, p, rhod, eta, dv,
                *, block_rows=128, interpret=False):
    """Run the whole coalescence substep loop as one Pallas kernel.

    SD blocks (n_cell, cap); cell vectors (n_cell,) broadcast to rows by
    the caller.  Returns (n, rw2, rd3, kpa, vt, x, z, overflow_flag)."""
    n_cell, cap = n.shape
    nblk = pl.cdiv(n_cell, block_rows)
    pad_rows = nblk * block_rows - n_cell

    def prep(a):
        a = a.astype(jnp.float32)
        if pad_rows:
            a = jnp.pad(a, ((0, pad_rows), (0, 0)))
        return a

    # SD planes are full (rows, cap) blocks; cell vectors travel as
    # (rows, 1) columns and broadcast in-kernel — materialised broadcasts
    # cost ~160 ms of layout conversion around the call
    arrays = tuple(prep(a) for a in (n, rw2, rd3, kpa, x, z))
    cells = tuple(prep(a.reshape(n_cell, 1)) for a in
                  (T, p, rhod, eta, dv))
    # pad with a neutral 1.0 so the array is never empty: the geometric
    # kernel multiplies by params[0] whenever params is non-empty
    # (kernel_value), and geo * 1.0 == plain geometric
    params32 = jnp.concatenate([
        jnp.asarray(params, jnp.float32).reshape(-1),
        jnp.ones((1,), jnp.float32)])
    seed32 = jnp.asarray(seed, jnp.int32).reshape((1,))

    spec = pl.BlockSpec((block_rows, cap), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((block_rows, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    scal = pl.BlockSpec(memory_space=pltpu.SMEM)
    outs = pl.pallas_call(
        functools.partial(_kernel, cfg, sstp_coal, dt_sub),
        grid=(nblk,),
        out_shape=tuple(
            [jax.ShapeDtypeStruct(arrays[0].shape, jnp.float32)] * 7),
        in_specs=[scal, scal] + [spec] * 6 + [cspec] * 5,
        out_specs=tuple([spec] * 7),
        # alias the six mutated SD planes in place (n,rw2,rd3,kpa,x,z ->
        # outputs 0-3,5,6): without this, embedding the call in a fused
        # program makes XLA materialise copies of every operand around it
        input_output_aliases={2: 0, 3: 1, 4: 2, 5: 3, 6: 5, 7: 6},
        interpret=interpret,
    )(seed32, params32, *arrays, *cells)
    if pad_rows:
        outs = tuple(o[:n_cell] for o in outs)
    return outs
