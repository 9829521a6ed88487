"""Stable in-row stream compaction — the cheap replacement for the
bitonic sorts in the re-binning family.

The re-binning phases never need a full sort: they need stable
PARTITIONS ("movers to the lane front", "alive before dead") whose
classes are later read by VALUE, not by rank.  A stable binary partition
of a (rows, L) block costs ~log2(L) shift stages instead of the bitonic
network's ~log2(L)^2/2 compare-exchange stages, and — unlike the bitonic
network, which silently mis-sorts at non-power-of-two widths (the r4
bug, PERF_r04.md) — it is correct at ANY width.

Algorithm (classic SIMD stream compaction, done with lane rolls):
each front element moves LEFT by dist = #back-elements before it; each
back element moves RIGHT by dist = #front-elements after it.  Distances
are monotone along the row, so moving every element by the binary
decomposition of its distance (LSB first) is collision-free: two
elements at lanes i < i+2^s with positions dest+remaining can only meet
if their original lanes coincided.  Front and back elements stream
through each other, so the two directions run on separate copies and
merge by ``lane < n_front`` at the end.

Pure jnp over the lane axis — runs identically inside a Pallas TPU
kernel (jnp.roll on lanes lowers to Mosaic like the bitonic's
_xor_shuffle) and as plain XLA (the CPU conformance/equivalence tests).

Reference analog: thrust::stable_partition / sort_by_key in the
re-binning housekeeping (src/impl/housekeeping/particles_impl_hskpng_
sort.ipp:15-70, distributed_memory/particles_impl_post_copy.ipp:18-36).
"""

import jax
import jax.numpy as jnp


def _shl(x, j, lane, fill=0):
    """x shifted left by j lanes (lane i reads lane i+j), filling with
    ``fill`` — roll + mask, the only lane-move Mosaic offers."""
    L = x.shape[-1]
    return jnp.where(lane < L - j, jnp.roll(x, -j, axis=-1),
                     jnp.full_like(x, fill))


def _shr(x, j, lane, fill=0):
    """x shifted right by j lanes (lane i reads lane i-j)."""
    return jnp.where(lane >= j, jnp.roll(x, j, axis=-1),
                     jnp.full_like(x, fill))


def stable_partition_rows(front, planes):
    """Stable partition of each row: lanes where ``front`` is set move to
    the row front (order preserved), the rest to the back (order
    preserved).  ``front`` is an int32/bool (rows, L) mask; ``planes`` a
    tuple of (rows, L) arrays that move together.

    Returns (planes_partitioned, n_front) with n_front (rows, 1) int32."""
    lane = jax.lax.broadcasted_iota(jnp.int32, front.shape, front.ndim - 1)
    L = front.shape[-1]
    f = front.astype(jnp.int32)
    b = 1 - f

    # inclusive prefix sums along lanes (Hillis-Steele)
    cf, cb = f, b
    j = 1
    while j < L:
        cf = cf + _shr(cf, j, lane)
        cb = cb + _shr(cb, j, lane)
        j *= 2
    n_front = jnp.max(cf, axis=-1, keepdims=True)

    # front elements move left by #back before; back elements move right
    # by #front after
    dist_f = cb - b
    dist_b = n_front - cf

    vf, db_ = f, dist_b
    vb = b
    df_ = dist_f
    arrs_f = list(planes)
    arrs_b = list(planes)
    j = 1
    while j < L:
        # leftward stream (front elements)
        src_v = _shl(vf, j, lane)
        src_d = _shl(df_, j, lane)
        take = (src_v > 0) & ((src_d & j) != 0)
        stay = (vf > 0) & ((df_ & j) == 0)
        arrs_f = [jnp.where(take, _shl(a, j, lane), a) for a in arrs_f]
        df_ = jnp.where(take, src_d, df_)
        vf = (take | stay).astype(jnp.int32)
        # rightward stream (back elements)
        src_v = _shr(vb, j, lane)
        src_d = _shr(db_, j, lane)
        take = (src_v > 0) & ((src_d & j) != 0)
        stay = (vb > 0) & ((db_ & j) == 0)
        arrs_b = [jnp.where(take, _shr(a, j, lane), a) for a in arrs_b]
        db_ = jnp.where(take, src_d, db_)
        vb = (take | stay).astype(jnp.int32)
        j *= 2

    in_front = lane < n_front
    outs = tuple(jnp.where(in_front, af, ab)
                 for af, ab in zip(arrs_f, arrs_b))
    return outs, n_front
