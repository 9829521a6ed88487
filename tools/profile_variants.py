"""Single-process A/B of the dense-step variants (chained timings).

Run ALONE on the TPU (the axon tunnel serialises clients; concurrent
processes poison each other's timings)."""
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.libcloudphxx_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NX = NZ = 76
SD = 64
REPS = 10


def chain(fn, carry):
    fn(carry)
    t0 = time.perf_counter()
    c = carry
    for _ in range(REPS):
        c = fn(c)
    jax.block_until_ready(c)
    return (time.perf_counter() - t0) / REPS * 1e3


def main():
    from libcloudphxx_tpu.models import Kinematic2D, mpdata
    from libcloudphxx_tpu.lgrngn import dense as dm

    print(f"# devices: {jax.devices()}", flush=True)
    m = Kinematic2D(nx=NX, nz=NZ, micro="lgrngn", sd_conc=SD,
                    sstp_cond=10, sstp_coal=10, n_sd_max=SD * NX * NZ)
    p = m.prtcls
    cfg = p.cfg
    cap = m.dense_capacity()
    d = jax.jit(dm.pack, static_argnums=(0, 2))(cfg, p.state, cap)
    th = jnp.asarray(m.th)
    dt = m.setup.dt

    # mpdata alone: pallas vs xla
    mp_pl = jax.jit(lambda th: mpdata.advect(th, m.gc_x, m.gc_z, m.G,
                                             n_iters=2, fct=m.fct))
    print(f"mpdata pallas:      {chain(mp_pl, th):9.2f} ms", flush=True)
    os.environ["LIBCLOUD_PALLAS"] = "0"
    mp_x = jax.jit(lambda th: mpdata.advect(th, m.gc_x, m.gc_z, m.G,
                                            n_iters=2, fct=bool(m.fct)))
    print(f"mpdata xla:         {chain(mp_x, th):9.2f} ms", flush=True)
    del os.environ["LIBCLOUD_PALLAS"]

    # rebin: gather vs ride
    for variant in ("gather", "ride"):
        os.environ["LIBCLOUD_DENSE_DISTRIBUTE"] = variant
        rb = jax.jit(lambda d, _v=variant: dm.rebin(cfg, d))
        print(f"rebin {variant:7s}:      {chain(rb, d):9.2f} ms", flush=True)

    # full dense fused step: 4 combos
    for mp_variant in ("pallas", "xla"):
        for distro in ("gather", "ride"):
            os.environ["LIBCLOUD_DENSE_DISTRIBUTE"] = distro
            if mp_variant == "xla":
                os.environ["LIBCLOUD_MPDATA_XLA"] = "1"
            f = m._lgrngn_step_fn_dense(False)
            fj = jax.jit(f)
            t = chain(fj, (d, th, jnp.asarray(m.rv)))
            print(f"dense step {mp_variant:6s}+{distro:6s}: {t:9.2f} ms",
                  flush=True)
            os.environ.pop("LIBCLOUD_MPDATA_XLA", None)

    # flat fused step for reference
    ff = jax.jit(m._lgrngn_step_fn(False))
    print(f"flat step:          {chain(ff, (p.state, th, jnp.asarray(m.rv))):9.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
