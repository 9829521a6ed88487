"""Multi-controller cleanliness check: the sharded SDM step in 2 PROCESSES.

The device mesh front-end (parallel/multi.py) normally runs single-process
over N local devices.  True multi-host TPU runs are multi-controller: every
process runs the SAME program, owns a subset of the devices, and global
arrays exist across processes.  This dryrun proves the shard_map program is
multi-controller-clean (VERDICT r3 item 9; reference analog: the MPI test
runs oversubscribed on one node, tests/mpi/mpi_adve_test.cpp:69-110):

  - 2 CPU processes x 4 virtual devices = an 8-device global mesh,
  - identical host-side init in both processes (deterministic numpy),
  - jax.device_put with NamedShardings over the global mesh,
  - the particles_multi_t shard_map'd cond + async steps (courant-halo
    ppermute, substepped condensation, coalescence, advection, ring SD
    migration),
  - global invariants read back through replicated jit outputs (no
    non-addressable host fetches).

Usage: python tools/dryrun_2proc.py            # spawns the two workers
       python tools/dryrun_2proc.py --worker I # internal
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PORT = 47851


def worker(pid: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{PORT}",
        num_processes=2, process_id=pid)
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    assert len(jax.devices()) == 8, jax.devices()
    assert len(jax.local_devices()) == 4

    from libcloudphxx_tpu import lgrngn

    def lognormal(lnr):
        return (60e6 * np.exp(-(np.asarray(lnr) - np.log(0.02e-6)) ** 2
                              / 2 / np.log(1.4) ** 2)
                / np.log(1.4) / np.sqrt(2 * np.pi))

    nx, nz = 19, 8  # uneven slabs over 8 shards
    oi = lgrngn.opts_init_t()
    oi.nx, oi.nz = nx, nz
    oi.dx = oi.dz = 100.0
    oi.x1, oi.z1 = nx * oi.dx, nz * oi.dz
    oi.dt = 1.0
    oi.sd_conc = 4
    oi.n_sd_max = nx * nz * 8
    oi.dry_distros = {(0.61, 0.0): lognormal}
    oi.kernel = lgrngn.kernel_t.geometric
    oi.terminal_velocity = lgrngn.vt_t.beard77fast
    oi.sstp_cond = 2
    oi.sstp_coal = 2
    oi.dev_count = 8

    prt = lgrngn.factory(lgrngn.backend_t.multi_CUDA, oi)
    th = np.full((nx, nz), 293.0)
    rv = np.full((nx, nz), 8e-3)
    rhod = np.full((nx, nz), 1.12)
    Cx = 0.3 * np.ones((nx + 1, nz))
    Cz = 0.05 * np.ones((nx, nz + 1))
    prt.init(th, rv, rhod, Cx=Cx, Cz=Cz)

    total0 = float(jax.jit(jnp.sum)(prt.state.n))

    opts = lgrngn.opts_t()
    opts.chem_dsl = False
    for _ in range(2):
        # sync_in + step_cond without th/rv (no sync-out: sharded->host
        # fetches are not multi-controller-addressable), then transport
        prt.sync_in(th=th, rv=rv, rhod=rhod)
        prt.step_cond(opts)
        prt.step_async(opts)

    # replicated outputs are addressable from every process
    total1 = float(jax.jit(jnp.sum)(prt.state.n))
    finite = bool(jax.jit(
        lambda s: jnp.isfinite(s.th).all() & jnp.isfinite(s.rv).all()
        & jnp.isfinite(s.rw2).all())(prt.state))
    assert finite, "non-finite state"
    # coalescence + sedimentation (open z walls) only ever REMOVE
    # multiplicity; migration/advection must not create or lose any beyond
    # that
    assert 0 < total1 <= total0, (total1, total0)
    assert total1 > 0.9 * total0, (total1, total0)
    print(f"proc {pid}: 2-process x 4-device mesh OK, slabs {prt.widths}, "
          f"total multiplicity {total1:.6e} (conserved)", flush=True)

    # ---- the DENSE engine (parallel/dense_mesh) as 2 processes too
    # (VERDICT r4 missing #4: the fast path had no multi-process run).
    # Same recipe as __graft_entry__.dryrun_multichip, with every
    # host->sharded transfer through decomp.global_put.
    import dataclasses as dc

    from jax.sharding import NamedSharding, PartitionSpec as P

    from libcloudphxx_tpu.lgrngn import dense as dm
    from libcloudphxx_tpu.lgrngn.state import StaticConfig
    from libcloudphxx_tpu.parallel import decomp, dense_mesh

    n_dev = 8
    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("x",))
    # a host-local serial population (prt.state is a GLOBAL sharded array
    # and cannot be host-fetched across processes); init is deterministic,
    # so both processes build the identical pytree
    oi.dev_count = 0
    prt_s = lgrngn.factory(lgrngn.backend_t.serial, oi)
    prt_s.init(th, rv, rhod, Cx=Cx, Cz=Cz)
    cfgd = prt_s.cfg
    d0 = jax.jit(dm.pack, static_argnums=(0, 2))(cfgd, prt_s.state, 16)
    widths = decomp.slab_widths(cfgd.nx, n_dev)
    cfg_l = dc.replace(cfgd, nx=max(widths),
                       n_cell=max(widths) * cfgd.nz,
                       x0=0.0, x1=max(widths) * cfgd.dx)
    dom = decomp.device_put_domains(cfgd, mesh, widths)
    stepd = dense_mesh.dense_step_sharded(cfg_l, 2, 32, True, True, 44.0)
    spec = dense_mesh.dense_specs()
    dom_spec = decomp.ShardDomain(lo=P("x"), hi=P("x"), nxl=P("x"))
    shd = jax.jit(jax.shard_map(
        lambda d_, th_, rv_, dm_: stepd(d_, th_, rv_, dm_,
                                        jnp.zeros((0,)), 1.0),
        mesh=mesh, in_specs=(spec, P("x"), P("x"), dom_spec),
        out_specs=(spec, P("x"), P("x")), check_vma=False))
    shardingd = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), spec)
    # host pytree is deterministic and identical in both processes
    dmesh = decomp.global_put(
        dense_mesh.scatter_dense(cfgd, d0, n_dev, widths), shardingd)
    csh = NamedSharding(mesh, P("x"))
    th_s = decomp.global_put(
        dense_mesh.pad_cell_field(cfgd, np.asarray(th).reshape(-1),
                                  n_dev, widths), csh)
    rv_s = decomp.global_put(
        dense_mesh.pad_cell_field(cfgd, np.asarray(rv).reshape(-1),
                                  n_dev, widths), csh)
    total_d0 = float(jax.jit(jnp.sum)(dmesh.n))
    for _ in range(2):
        dmesh, th_s, rv_s = shd(dmesh, th_s, rv_s, dom)
    jax.block_until_ready(dmesh.n)
    total_d1 = float(jax.jit(jnp.sum)(dmesh.n))
    ovf = float(jax.jit(jnp.sum)(dmesh.overflow))
    fin = bool(jax.jit(lambda d_: jnp.isfinite(d_.rw2).all()
                       & jnp.isfinite(d_.x).all())(dmesh))
    assert ovf == 0.0, ovf
    assert fin, "dense mesh: non-finite state"
    assert 0 < total_d1 <= total_d0 and total_d1 > 0.9 * total_d0, \
        (total_d1, total_d0)
    print(f"proc {pid}: 2-process DENSE mesh OK, slabs {widths}, "
          f"total multiplicity {total_d1:.6e} (conserved)", flush=True)


def main():
    env = dict(os.environ)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    rc = 0
    for i, pr in enumerate(procs):
        out, _ = pr.communicate(timeout=1200)
        tail = out.decode(errors="replace")
        marker = f"proc {i}: 2-process"
        ok = pr.returncode == 0 and marker in tail
        print(f"== worker {i}: rc={pr.returncode} "
              f"{'OK' if ok else 'FAIL'}")
        if not ok:
            print(tail[-4000:])
            rc = 1
        else:
            for l in tail.splitlines():
                if f"proc {i}:" in l:
                    print("   " + l)
    sys.exit(rc)


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--worker") + 1]))
    else:
        main()
