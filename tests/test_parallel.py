"""Multi-chip domain decomposition tests on the virtual 8-device CPU mesh.

Mirrors the reference's MPI advection test strategy
(tests/mpi/mpi_adve_test.cpp:69-110): advect SDs across shard boundaries in
both directions and assert global SD-count/position conservation.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libcloudphxx_tpu import lgrngn, parallel
from libcloudphxx_tpu.lgrngn.state import OUT_MIGRATION_OVERFLOW, StaticConfig, empty_state

N_DEV = 8


def make_cfg(nx=16, nz=4, n_sd=256, **kw):
    oi = lgrngn.opts_init_t()
    oi.nx, oi.nz = nx, nz
    oi.dx = oi.dz = 1.0
    oi.x1, oi.z1 = float(nx), float(nz)
    oi.dt = 1.0
    oi.n_sd_max = n_sd
    oi.sd_conc = 1
    oi.kernel = lgrngn.kernel_t.geometric
    oi.terminal_velocity = lgrngn.vt_t.beard77fast
    oi.coal_switch = False
    for k, v in kw.items():
        setattr(oi, k, v)
    return StaticConfig.from_opts_init(oi)


def test_local_config_split():
    cfg = make_cfg()
    cfg_l = parallel.local_config(cfg, N_DEV)
    assert cfg_l.nx == cfg.nx // N_DEV
    assert cfg_l.n_sd_max == cfg.n_sd_max // N_DEV
    assert cfg_l.x0 == 0.0
    assert cfg_l.x1 == pytest.approx((cfg.x1 - cfg.x0) / N_DEV)


def _build_shard_state(shard, cfg_l, rng, drift):
    """One shard's local state: a few live SDs at random local positions."""
    st = empty_state(cfg_l)
    n_live = 8
    x = rng.uniform(0, cfg_l.x1, n_live)
    z = rng.uniform(0.5, cfg_l.z1 - 0.5, n_live)
    n = np.zeros(cfg_l.n_sd_max)
    n[:n_live] = shard * 100 + np.arange(1, n_live + 1)  # traceable ids
    xs = np.zeros(cfg_l.n_sd_max)
    xs[:n_live] = x
    zs = np.zeros(cfg_l.n_sd_max)
    zs[:n_live] = z
    ijk = (xs / cfg_l.dx).astype(np.int32) * cfg_l.nz + \
        (zs / cfg_l.dz).astype(np.int32)
    st = dataclasses.replace(
        st,
        n=jnp.asarray(n),
        x=jnp.asarray(xs),
        z=jnp.asarray(zs),
        rd3=jnp.full(cfg_l.n_sd_max, 1e-21),
        rw2=jnp.full(cfg_l.n_sd_max, 1e-12),
        kpa=jnp.full(cfg_l.n_sd_max, 0.61),
        ijk=jnp.asarray(np.where(n > 0, ijk, 0), jnp.int32),
        th=jnp.full(cfg_l.n_cell, 300.0),
        rv=jnp.full(cfg_l.n_cell, 5e-3),
        rhod=jnp.ones(cfg_l.n_cell),
        dv=jnp.ones(cfg_l.n_cell),
    )
    return st


@pytest.mark.parametrize("direction", [+1.0, -1.0])
def test_migration_conserves_sds(direction):
    # every SD drifts `direction` cells per step; after nx steps each SD has
    # crossed every shard boundary and wrapped the ring exactly once
    mesh = parallel.make_mesh(N_DEV)
    cfg = make_cfg()
    cfg_l = parallel.local_config(cfg, N_DEV)
    rng = np.random.default_rng(7)
    state = parallel.replicate_state_for_mesh(
        cfg, mesh, lambda s, c: _build_shard_state(s, c, rng, direction)
    )

    total_n0 = float(jnp.sum(state.n))
    ids0 = np.sort(np.asarray(state.n[state.n > 0]))

    buf = cfg_l.n_sd_max // 2

    def drift_and_migrate(st):
        st = dataclasses.replace(st, x=st.x + direction * cfg_l.dx)
        return parallel.migrate(cfg_l, st, buf)

    from jax.sharding import PartitionSpec as P
    spec = jax.tree_util.tree_map(
        lambda _: P("x"), parallel.decomp._state_specs()
    )
    step = jax.jit(jax.shard_map(
        drift_and_migrate, mesh=mesh, in_specs=(spec,), out_specs=spec,
    ))

    for _ in range(cfg.nx):
        state = step(state)

    assert float(jnp.sum(state.n)) == pytest.approx(total_n0)
    ids1 = np.sort(np.asarray(state.n[state.n > 0]))
    assert (ids0 == ids1).all()
    # overflow counter untouched
    assert float(jnp.sum(state.puddle[..., OUT_MIGRATION_OVERFLOW])) == 0.0
    # every SD is back in its original shard at its original local position
    # (a full ring traversal)
    x1 = np.asarray(state.x)[np.asarray(state.n) > 0]
    assert ((x1 >= 0) & (x1 < cfg_l.x1)).all()


def test_full_multichip_step_compiles_and_runs():
    mesh = parallel.make_mesh(N_DEV)
    cfg = make_cfg(nz=8)
    step, cfg_l = parallel.build_multichip_step(mesh, cfg, sstp_coal=1)
    rng = np.random.default_rng(3)
    state = parallel.replicate_state_for_mesh(
        cfg, mesh, lambda s, c: _build_shard_state(s, c, rng, 0.0)
    )
    params = jnp.zeros((1,))
    out = step(state, params, 1.0, 44.0)
    assert bool(jnp.all(jnp.isfinite(out.th)))
    assert bool(jnp.all(jnp.isfinite(out.rw2)))
    assert float(jnp.sum(out.n)) > 0


def test_migration_overflow_is_loud():
    mesh = parallel.make_mesh(N_DEV)
    cfg = make_cfg()
    cfg_l = parallel.local_config(cfg, N_DEV)
    rng = np.random.default_rng(11)
    state = parallel.replicate_state_for_mesh(
        cfg, mesh, lambda s, c: _build_shard_state(s, c, rng, 1.0)
    )
    # buffer of 2 but 8 movers per shard -> overflow must be counted
    from jax.sharding import PartitionSpec as P
    spec = jax.tree_util.tree_map(
        lambda _: P("x"), parallel.decomp._state_specs()
    )

    def drift_and_migrate(st):
        st = dataclasses.replace(st, x=st.x + cfg_l.x1)  # everyone leaves
        return parallel.migrate(cfg_l, st, 2)

    step = jax.jit(jax.shard_map(
        drift_and_migrate, mesh=mesh, in_specs=(spec,), out_specs=spec,
    ))
    out = step(state)
    assert float(jnp.sum(out.puddle[..., OUT_MIGRATION_OVERFLOW])) > 0
