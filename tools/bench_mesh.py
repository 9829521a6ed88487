"""Step-time overhead of the 8-virtual-device mesh vs the serial backend.

No multi-chip hardware is available, so this bounds the COLLECTIVE +
shard_map overhead on a virtual CPU mesh: the same public-API workload runs
on the serial backend and on particles_multi_t over 8 host devices; the
per-step wall-clock ratio is the (pessimistic, CPU-virtualised) cost of the
halo exchanges, migration ppermutes and diag reductions.  Writes one JSON
line.
"""

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libcloudphxx_tpu import lgrngn  # noqa: E402

NX, NZ = 64, 32
SD = 16
STEPS = 20


def build(dev_count):
    def lognormal(lnr):
        return (60e6 * np.exp(-(lnr - np.log(0.02e-6)) ** 2
                              / 2 / np.log(1.4) ** 2)
                / np.log(1.4) / np.sqrt(2 * np.pi))
    oi = lgrngn.opts_init_t()
    oi.nx, oi.nz = NX, NZ
    oi.dx = oi.dz = 20.0
    oi.x1, oi.z1 = NX * 20.0, NZ * 20.0
    oi.dt = 1.0
    oi.sd_conc = SD
    oi.n_sd_max = NX * NZ * SD * 2
    oi.dry_distros = {(0.61, 0.0): lognormal}
    oi.terminal_velocity = lgrngn.vt_t.beard77fast
    oi.kernel = lgrngn.kernel_t.geometric
    oi.sstp_cond = 2
    oi.sstp_coal = 2
    oi.dev_count = dev_count
    backend = (lgrngn.backend_t.multi_CUDA if dev_count > 1
               else lgrngn.backend_t.serial)
    prt = lgrngn.factory(backend, oi)
    th = np.full((NX, NZ), 289.0)
    rv = np.full((NX, NZ), 7.5e-3)
    rhod = np.full((NX, NZ), 1.12)
    Cx = 0.3 * np.ones((NX + 1, NZ))
    Cz = 0.05 * np.ones((NX, NZ + 1))
    prt.init(th.copy(), rv.copy(), rhod, Cx=Cx, Cz=Cz)
    return prt, th, rv


def time_steps(prt, th, rv):
    opts = lgrngn.opts_t()
    opts.coal = True
    # warm the compiles
    prt.step_sync(opts, th, rv)
    prt.step_async(opts)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        prt.step_sync(opts, th, rv)
        prt.step_async(opts)
    return (time.perf_counter() - t0) / STEPS


def bench_dense():
    """Serial dense engine vs the 8-shard dense mesh
    (parallel/dense_mesh), device-loop stepping — the DENSE layout is the
    performance path, so its scaling overhead is the one that matters."""
    import dataclasses
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from libcloudphxx_tpu.lgrngn import dense as dm
    from libcloudphxx_tpu.models import Kinematic2D, mpdata
    from libcloudphxx_tpu.parallel import decomp, dense_mesh

    m = Kinematic2D(nx=NX, nz=NZ, micro="lgrngn", sd_conc=SD,
                    sstp_cond=2, sstp_coal=2, n_sd_max=NX * NZ * SD,
                    terminal_velocity=lgrngn.vt_t.beard77)
    cfg = m.prtcls.cfg
    cap = m.dense_capacity()
    d0 = jax.jit(dm.pack, static_argnums=(0, 2))(cfg, m.prtcls.state, cap)
    th0, rv0 = jnp.asarray(m.th), jnp.asarray(m.rv)
    params = jnp.zeros((0,))
    dt = float(m.setup.dt)

    @jax.jit
    def fser(c):
        d, th, rv = c
        th = mpdata.advect(th, m.gc_x, m.gc_z, m.G, n_iters=2, fct=m.fct)
        rv = mpdata.advect(rv, m.gc_x, m.gc_z, m.G, n_iters=2, fct=m.fct)
        d, thc, rvc = dm.step_cond(cfg, d, th.reshape(-1), rv.reshape(-1),
                                   dt, 44.0)
        d = dm.step_async(cfg, d, params, dt, 2, True, True)
        return (d, thc.reshape(NX, NZ), rvc.reshape(NX, NZ))

    c = fser((d0, th0, rv0))  # compile
    t0 = time.perf_counter()
    for _ in range(STEPS):
        c = fser(c)
    jax.block_until_ready(c)
    t_serial = (time.perf_counter() - t0) / STEPS

    n_shards = 8
    widths = decomp.slab_widths(cfg.nx, n_shards)
    cfg_l = dataclasses.replace(
        cfg, nx=max(widths), n_cell=max(widths) * cfg.nz,
        x0=0.0, x1=max(widths) * cfg.dx)
    mesh = decomp.make_mesh(n_shards)
    dom = decomp.device_put_domains(cfg, mesh, widths)
    step = dense_mesh.dense_step_sharded(cfg_l, 2, 64, True, True, 44.0)
    spec = dense_mesh.dense_specs()
    dom_spec = decomp.ShardDomain(lo=P("x"), hi=P("x"), nxl=P("x"))
    shstep = jax.jit(jax.shard_map(
        lambda d, th, rv, dom_: step(d, th, rv, dom_, params, dt),
        mesh=mesh, in_specs=(spec, P("x"), P("x"), dom_spec),
        out_specs=(spec, P("x"), P("x")),
        # the resident-kernel fast path embeds pallas_call, whose
        # out_shape carries no vma annotation
        check_vma=False))
    sharding = jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s),
                                      spec)
    dmesh = jax.device_put(
        dense_mesh.scatter_dense(cfg, d0, n_shards, widths), sharding)
    th_s = dense_mesh.pad_cell_field(cfg, np.asarray(th0).reshape(-1),
                                     n_shards, widths)
    rv_s = dense_mesh.pad_cell_field(cfg, np.asarray(rv0).reshape(-1),
                                     n_shards, widths)
    out = shstep(dmesh, th_s, rv_s, dom)  # compile
    t0 = time.perf_counter()
    c = (dmesh, th_s, rv_s)
    for _ in range(STEPS):
        c = shstep(c[0], c[1], c[2], dom)
    jax.block_until_ready(c)
    t_mesh = (time.perf_counter() - t0) / STEPS
    return t_serial, t_mesh


def main():
    if "--engine=dense" in sys.argv:
        t_serial, t_mesh = bench_dense()
        label = "dense engine"
    else:
        prt_s, th_s, rv_s = build(1)
        t_serial = time_steps(prt_s, th_s, rv_s)
        prt_m, th_m, rv_m = build(8)
        t_mesh = time_steps(prt_m, th_m, rv_m)
        label = "flat engine"
    print(f"# serial {t_serial*1e3:.1f} ms/step, 8-vdev mesh "
          f"{t_mesh*1e3:.1f} ms/step ({label})", file=sys.stderr)
    print(json.dumps({
        "metric": "8-virtual-device mesh step-time ratio vs serial "
                  f"(kinematic {NX}x{NZ} sd_conc={SD}, CPU, {label})",
        "serial_ms_per_step": round(t_serial * 1e3, 2),
        "mesh_ms_per_step": round(t_mesh * 1e3, 2),
        "ratio": round(t_mesh / t_serial, 3),
    }))


if __name__ == "__main__":
    main()
