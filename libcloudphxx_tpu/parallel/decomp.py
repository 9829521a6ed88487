"""Multi-chip domain decomposition of the SDM engine.

TPU-native equivalent of the reference's distributed-memory layer
(SURVEY section 2.3): the 1-D x-slab MPI/multi-GPU decomposition
(src/impl/distributed_memory/particles_impl_mpi_exchange.ipp,
src/impl_multi_gpu/) becomes a single `shard_map` program over a
`jax.sharding.Mesh` axis "x":

  - Eulerian fields are sharded into x slabs (the flat cell index is
    x-outermost, so axis-0 sharding IS the slab decomposition),
  - each shard owns a fixed-capacity slice of the SD population in *local*
    coordinates (the reference also re-bases coordinates on migration,
    pack.ipp:14-27),
  - SD migration is a fixed-size pack -> `jax.lax.ppermute` -> unpack into
    dead slots, mirroring the preallocated MPI buffers
    (src/detail/config.hpp:191) — ragged counts ride as validity masks,
  - migration-buffer overflow increments a loud counter in the state
    (the reference hard-asserts its buffer sizes).

Collectives ride the ICI ring; nothing here assumes a host count.
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..lgrngn import coalescence, condensation, hskpng, transport
from ..lgrngn import vterm as vterm_mod
from ..lgrngn.state import State, StaticConfig

# SD attributes that migrate between shards — the analog of the
# distmem_real_vctrs registry (particles_impl.ipp:440-494)
MIGRATING_ATTRS = ("n", "rd3", "rw2", "kpa", "x", "y", "z", "vt",
                   "incloud_time", "up", "vp", "wp", "ssp", "dot_ssp",
                   "ice_a", "ice_c", "ice_rho", "T_freeze", "rd2_insol")


def local_config(cfg: StaticConfig, n_shards: int) -> StaticConfig:
    """Per-shard static config: an x slab in local coordinates
    (the reference's distmem_opts nx split, src/detail/distmem_opts.hpp)."""
    if cfg.nx % n_shards != 0:
        raise ValueError(
            f"lgrngn: nx ({cfg.nx}) must divide by the number of x shards "
            f"({n_shards})"
        )
    if cfg.n_sd_max % n_shards != 0:
        raise ValueError("lgrngn: n_sd_max must divide by the shard count")
    nx_l = cfg.nx // n_shards
    width = (cfg.x1 - cfg.x0) / n_shards
    return dataclasses.replace(
        cfg,
        nx=nx_l,
        n_cell=nx_l * cfg.ny * cfg.nz,
        n_sd_max=cfg.n_sd_max // n_shards,
        x0=0.0,
        x1=width,
    )


def migrate(cfg: StaticConfig, state: State, buf: int,
            axis_name: str = "x") -> State:
    """Exchange out-of-slab SDs with the two x neighbours
    (reference mpi_exchange.ipp:20-331 / step_async_and_copy.ipp:28-206).

    Runs inside shard_map.  ``buf`` is the static per-direction buffer
    capacity."""
    n_shards = jax.lax.psum(1, axis_name)
    width = cfg.x1 - cfg.x0

    def pack(mask, rebase):
        # movers first (stable sort keeps in-cell order), take buf slots
        order = jnp.argsort(~mask)
        idx = order[:buf]
        valid = mask[idx]
        payload = {}
        for name in MIGRATING_ATTRS:
            v = getattr(state, name)[idx]
            if name == "x":
                v = v + rebase
            payload[name] = jnp.where(valid, v, 0.0)
        overflow = jnp.maximum(jnp.sum(mask) - buf, 0)
        return payload, valid, overflow

    alive = state.n > 0
    go_l = alive & (state.x < cfg.x0)
    go_r = alive & (state.x >= cfg.x1)
    # coordinate re-basing into the receiver's frame (pack.ipp:14-27)
    pay_l, val_l, ovf_l = pack(go_l, +width)
    pay_r, val_r, ovf_r = pack(go_r, -width)

    # kill the movers locally (they are flagged n=0 in the reference too)
    n_local = jnp.where(go_l | go_r, 0.0, state.n)
    state = dataclasses.replace(state, n=n_local)

    # ring exchange: right payload to the right neighbour, left to the left
    perm_r = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    perm_l = [(i, (i - 1) % n_shards) for i in range(n_shards)]
    recv_from_left = jax.tree_util.tree_map(
        lambda a: jax.lax.ppermute(a, axis_name, perm_r), (pay_r, val_r)
    )
    recv_from_right = jax.tree_util.tree_map(
        lambda a: jax.lax.ppermute(a, axis_name, perm_l), (pay_l, val_l)
    )

    def unpack(st, payload, valid):
        # dead slots first; invalid lanes dropped via out-of-bounds index
        dead_order = jnp.argsort(st.n > 0)
        slots = dead_order[jnp.arange(buf)]
        tgt = jnp.where(valid, slots, cfg.n_sd_max)
        updates = {}
        for name in MIGRATING_ATTRS:
            updates[name] = getattr(st, name).at[tgt].set(
                payload[name], mode="drop"
            )
        return dataclasses.replace(st, **updates)

    state = unpack(state, *recv_from_left)
    state = unpack(state, *recv_from_right)

    # loud overflow accounting (the reference hard-asserts buffer sizes)
    from ..lgrngn.state import OUT_MIGRATION_OVERFLOW
    puddle = state.puddle.at[OUT_MIGRATION_OVERFLOW].add(
        (ovf_l + ovf_r).astype(state.puddle.dtype))
    state = dataclasses.replace(state, puddle=puddle)

    # re-bin: migrated SDs need local cell ids
    return transport.post_step(cfg, state)


def sharded_async_step(cfg: StaticConfig, sstp_coal: int, buf: int,
                       axis_name: str = "x"):
    """The per-shard transport phase with neighbour migration — the body to
    run under shard_map (reference particles_step.ipp:339-494 with the MPI
    exchange at :486)."""

    def step(state: State, params, dt):
        state = hskpng.hskpng_Tpr(cfg, state)
        state = vterm_mod.hskpng_vterm_all(cfg, state)
        if cfg.coal_switch:
            state = coalescence.coal(cfg, state, params, dt, sstp_coal)
        state = transport.adve(cfg, state)
        state = transport.sedi(state, dt)
        # z walls + puddle are local; the x wrap happens globally through
        # migration, so open/periodic x is handled by the ring itself
        state = _bcnd_z_only(cfg, state)
        state = migrate(cfg, state, buf, axis_name)
        return state

    return step


def _bcnd_z_only(cfg: StaticConfig, state: State) -> State:
    """bcnd with the x-direction left to migration."""
    z, n = state.z, state.n
    puddle = state.puddle
    if cfg.n_dims > 1:
        from ..common import constants as c
        from ..lgrngn.state import (OUT_DRY_VOL, OUT_LIQ_NUM, OUT_LIQ_VOL,
                                    OUT_PRTCL_NUM)
        n = jnp.where(z >= cfg.z1, 0.0, n)
        fell = (z < cfg.z0) & (n > 0)
        nf = jnp.where(fell, n, 0.0)
        rw2 = state.rw2
        puddle = puddle.at[OUT_LIQ_VOL].add(jnp.sum(
            4.0 / 3 * c.pi * nf * rw2 * jnp.sqrt(jnp.maximum(rw2, 0.0))))
        puddle = puddle.at[OUT_DRY_VOL].add(
            jnp.sum(4.0 / 3 * c.pi * nf * state.rd3))
        puddle = puddle.at[OUT_LIQ_NUM].add(
            jnp.sum(jnp.where(rw2 > 0, nf, 0.0)))
        puddle = puddle.at[OUT_PRTCL_NUM].add(jnp.sum(nf))
        n = jnp.where(fell, 0.0, n)
    return dataclasses.replace(state, z=z, n=n, puddle=puddle)


def sharded_sync_step(cfg: StaticConfig):
    """Per-shard condensation phase — purely local (no collectives): the
    payoff of slab decomposition is that the hottest kernel needs zero
    communication (same as the reference, where cond never touches MPI)."""

    def step(state: State, dt, RH_max):
        state = hskpng.hskpng_Tpr(cfg, state)
        state = condensation.cond_percell(cfg, state, dt, RH_max)
        state = condensation.sstp_save(state)
        return state

    return step


def make_mesh(n_devices=None):
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=("x",))


def build_multichip_step(mesh: Mesh, cfg: StaticConfig, sstp_coal=1,
                         buf=None):
    """Assemble the full jitted multi-chip SDM step: sharded condensation
    (local) + transport with ring migration.  Returns (step_fn, cfg_local);
    ``step_fn(state, params, dt, RH_max)`` expects a State whose per-SD and
    per-cell leaves are sharded along the mesh "x" axis."""
    n_shards = mesh.devices.size
    cfg_l = local_config(cfg, n_shards)
    buf = buf or max(16, cfg_l.n_sd_max // 4)

    sync = sharded_sync_step(cfg_l)
    async_ = sharded_async_step(cfg_l, sstp_coal, buf)

    def whole_step(state, params, dt, RH_max):
        state = sync(state, dt, RH_max)
        state = async_(state, params, dt)
        return state

    spec_state = jax.tree_util.tree_map(lambda _: P("x"), _state_specs())
    step = jax.jit(
        jax.shard_map(
            whole_step,
            mesh=mesh,
            in_specs=(spec_state, P(), P(), P()),
            out_specs=spec_state,
        )
    )
    return step, cfg_l


def _state_specs():
    """A State-shaped pytree of placeholders for spec construction."""
    flds = [f.name for f in dataclasses.fields(State)]
    return State(**{f: 0 for f in flds})


def replicate_state_for_mesh(cfg: StaticConfig, mesh: Mesh, state_builder):
    """Host-side helper: build each shard's local state with
    ``state_builder(shard_index, cfg_local)`` and concatenate into global
    arrays laid out for axis-0 "x" sharding."""
    n_shards = mesh.devices.size
    cfg_l = local_config(cfg, n_shards)
    locals_ = [state_builder(s, cfg_l) for s in range(n_shards)]

    def cat(*leaves):
        return jnp.concatenate([jnp.atleast_1d(l) for l in leaves], axis=0)

    merged = jax.tree_util.tree_map(cat, *locals_)
    spec = jax.tree_util.tree_map(lambda _: P("x"), _state_specs())
    return jax.device_put(
        merged,
        jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), spec),
    )
