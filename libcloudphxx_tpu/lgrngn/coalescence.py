"""Monte-Carlo all-or-nothing coalescence (Shima et al. 2009 SDM).

TPU-native equivalent of reference src/impl/coalescence/particles_impl_coal.ipp
and src/detail/kernels.hpp.  The thrust shuffle-sort + adjacent-pair for_each
becomes: one argsort of (cell, random) keys (dead slots pushed past all
cells), vectorized pair probability/collision math over every adjacent even
position, and conflict-free scatters back to the attribute arrays (each SD
belongs to at most one pair).
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..common import constants as c
from . import vterm as vterm_mod
from .enums import kernel_t
from .state import State, StaticConfig


def kernel_value(cfg: StaticConfig, params, n_a, n_b, rw2_a, rw2_b,
                 vt_a, vt_b, rd3_a, rd3_b):
    """Collision kernel K(a,b) including the max-multiplicity factor
    (reference kernels.hpp:40-207).  ``params`` = opts_init.kernel_parameters
    as a device array (may be empty)."""
    kern = kernel_t(cfg.kernel)
    n_max = jnp.maximum(n_a, n_b)
    if kern == kernel_t.golovin:
        # (kernels.hpp:40-80)
        b = params[0]
        return (
            c.pi * 4.0 / 3.0 * b * n_max
            * (rw2_a * jnp.sqrt(rw2_a) + rw2_b * jnp.sqrt(rw2_b))
        )

    # geometric base (kernels.hpp:84-125)
    rw_a = jnp.sqrt(rw2_a)
    rw_b = jnp.sqrt(rw2_b)
    geo = (
        c.pi * n_max * jnp.abs(vt_a - vt_b)
        * (rw2_a + rw2_b + 2.0 * rw_a * rw_b)
    )
    if kern == kernel_t.geometric:
        return geo
    if kern == kernel_t.long:
        # Long 1974 efficiency below 50 um (kernels.hpp:146-176)
        r_L = jnp.maximum(rw_a, rw_b)
        r_s = jnp.minimum(rw_a, rw_b)
        eff = jnp.where(
            r_s <= 3e-6, 0.0, 4.5e8 * r_L * r_L * (1.0 - 3e-6 / r_s)
        )
        return jnp.where(r_L < 50e-6, geo * eff, geo)
    if kern == kernel_t.hall or kern.name.startswith(("hall", "vohl")):
        # tabulated efficiencies arrive in a later milestone; geometric
        # with unit efficiency keeps the API alive until then
        return geo
    raise NotImplementedError(f"lgrngn: kernel {kern} not implemented yet")


def coal_substep(cfg: StaticConfig, state: State, params, dt, key) -> State:
    """One coalescence substep over the whole population
    (reference particles_impl_coal.ipp:273-546)."""
    n_sd = cfg.n_sd_max
    dead = state.n <= 0
    cellkey = jnp.where(dead, cfg.n_cell, state.ijk)

    k_shuffle, k_u01 = jax.random.split(key)
    shuffle = jax.random.uniform(k_shuffle, (n_sd,))
    # random permutation within each cell: lexsort by (cell, random)
    order = jnp.lexsort((shuffle, cellkey))
    sijk = cellkey[order]

    live = (~dead).astype(state.n.dtype)
    count = jax.ops.segment_sum(live, cellkey, num_segments=cfg.n_cell + 1)
    count = count[: cfg.n_cell]
    # Shima 2009 sec 5.1.3 scale factor n(n-1)/2 / floor(n/2)
    # (coal.ipp:99-107)
    half = jnp.floor(count / 2)
    scale = jnp.where(count > 1, count * (count - 1) / 2.0 / half, 0.0)
    off = jnp.cumsum(count) - count  # exclusive scan (coal.ipp:313-327)

    pos = jnp.arange(n_sd)
    in_domain = sijk < cfg.n_cell
    off_here = jnp.where(in_domain, off[jnp.minimum(sijk, cfg.n_cell - 1)], 0)
    cix = pos - off_here

    # candidate pairs: even in-cell index, neighbour in the same cell
    # (coal.ipp:196-216)
    nxt = jnp.minimum(pos + 1, n_sd - 1)
    is_pair = (
        (cix % 2 == 0)
        & in_domain
        & (sijk[nxt] == sijk)
        & (nxt != pos)
    )

    a = order
    b = order[nxt]
    g = lambda arr, idx: arr[idx]
    n_a, n_b = g(state.n, a), g(state.n, b)
    rw2_a, rw2_b = g(state.rw2, a), g(state.rw2, b)
    rd3_a, rd3_b = g(state.rd3, a), g(state.rd3, b)
    kpa_a, kpa_b = g(state.kpa, a), g(state.kpa, b)
    vt_a, vt_b = g(state.vt, a), g(state.vt, b)
    cell = jnp.minimum(sijk, cfg.n_cell - 1)
    dv = state.dv[cell]

    K = kernel_value(cfg, params, n_a, n_b, rw2_a, rw2_b, vt_a, vt_b,
                     rd3_a, rd3_b)
    prob = dt / dv * scale[cell] * K
    prob = jnp.where(is_pair, prob, 0.0)

    # integer collisions + Bernoulli remainder (all-or-nothing
    # multi-collision, coal.ipp:218-236)
    col_no = jnp.floor(prob)
    u01 = jax.random.uniform(k_u01, (n_sd,))
    col_no = col_no + (u01 < prob - col_no)

    # big = higher-multiplicity SD loses multiplicity; small absorbs mass
    # (>= so equal multiplicities flag the 'a' droplet for recycling,
    # coal.ipp:243-246)
    a_is_big = n_a >= n_b
    n_big = jnp.where(a_is_big, n_a, n_b)
    n_small = jnp.where(a_is_big, n_b, n_a)
    ratio = jnp.where(n_small > 0, jnp.floor(n_big / jnp.maximum(n_small, 1)), 0.0)
    col_no = jnp.minimum(col_no, ratio)
    happened = is_pair & (col_no > 0)

    big = jnp.where(a_is_big, a, b)
    small = jnp.where(a_is_big, b, a)
    rw2_big = jnp.where(a_is_big, rw2_a, rw2_b)
    rw2_small = jnp.where(a_is_big, rw2_b, rw2_a)
    rd3_big = jnp.where(a_is_big, rd3_a, rd3_b)
    rd3_small = jnp.where(a_is_big, rd3_b, rd3_a)
    kpa_big = jnp.where(a_is_big, kpa_a, kpa_b)
    kpa_small = jnp.where(a_is_big, kpa_b, kpa_a)

    # Shima eqs. 12-13 (coal.ipp:118-143)
    n_big_new = n_big - col_no * n_small
    rw3_small_new = col_no * rw2_big * jnp.sqrt(rw2_big) + \
        rw2_small * jnp.sqrt(rw2_small)
    rw2_small_new = jnp.cbrt(rw3_small_new) ** 2
    rd3_small_new = col_no * rd3_big + rd3_small
    # rd3-weighted kappa mixing (reference post-pass summator coal.ipp:470-500)
    kpa_small_new = jnp.where(
        rd3_small_new > 0,
        (col_no * kpa_big * rd3_big + kpa_small * rd3_small)
        / jnp.maximum(rd3_small_new, 1e-300),
        kpa_small,
    )

    # conflict-free scatters: masked-out lanes are dropped via OOB index
    oob = n_sd
    big_idx = jnp.where(happened, big, oob)
    small_idx = jnp.where(happened, small, oob)

    n_new = state.n.at[big_idx].set(n_big_new, mode="drop")
    rw2_new = state.rw2.at[small_idx].set(rw2_small_new, mode="drop")
    rd3_new = state.rd3.at[small_idx].set(rd3_small_new, mode="drop")
    kpa_new = state.kpa.at[small_idx].set(kpa_small_new, mode="drop")
    # invalidate vt of the grown droplet: recomputed wholesale after the
    # substep (reference marks detail::invalid then hskpng_vterm_invalid)
    return dataclasses.replace(
        state, n=n_new, rw2=rw2_new, rd3=rd3_new, kpa=kpa_new
    )


def coal(cfg: StaticConfig, state: State, params, dt, sstp_coal: int) -> State:
    """The sstp_coal-substep coalescence loop of step_async
    (reference particles_step.ipp:382-404), with terminal velocities
    refreshed between substeps (hskpng_vterm_invalid)."""
    dt_sub = dt / sstp_coal

    def body(_, carry):
        st, key = carry
        key, sub = jax.random.split(key)
        st = vterm_mod.hskpng_vterm_all(cfg, st)
        st = coal_substep(cfg, st, params, dt_sub, sub)
        return st, key

    state, key = jax.lax.fori_loop(0, sstp_coal, body, (state, state.key))
    state = vterm_mod.hskpng_vterm_all(cfg, state)
    return dataclasses.replace(state, key=key)
