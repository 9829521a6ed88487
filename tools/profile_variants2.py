"""Scatter-rebin A/B (run ALONE on the TPU)."""
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
    from libcloudphxx_tpu.models import Kinematic2D
    from libcloudphxx_tpu.lgrngn import dense as dm

    print(f"# devices: {jax.devices()}", flush=True)
    m = Kinematic2D(nx=NX, nz=NZ, micro="lgrngn", sd_conc=SD,
                    sstp_cond=10, sstp_coal=10, n_sd_max=SD * NX * NZ)
    p = m.prtcls
    cfg = p.cfg
    cap = m.dense_capacity()
    d = jax.jit(dm.pack, static_argnums=(0, 2))(cfg, p.state, cap)
    th = jnp.asarray(m.th)
    rv = jnp.asarray(m.rv)

    os.environ["LIBCLOUD_DENSE_DISTRIBUTE"] = "scatter"
    rb = jax.jit(lambda d: dm.rebin(cfg, d))
    print(f"rebin scatter:       {chain(rb, d):9.2f} ms", flush=True)
    f = jax.jit(m._lgrngn_step_fn_dense(False))
    print(f"dense step pallas+scatter: {chain(f, (d, th, rv)):9.2f} ms",
          flush=True)

    # per-phase under the winning config
    dt = m.setup.dt
    cond = jax.jit(lambda c: dm.step_cond(cfg, c[0], c[1].reshape(-1),
                                          c[2].reshape(-1), dt, 44.0)[0:1]
                   + (c[1], c[2]))
    print(f"dense cond x10:      {chain(cond, (d, th, rv)):9.2f} ms",
          flush=True)
    params = jnp.asarray(np.asarray(p.opts_init.kernel_parameters,
                                    dtype=float))
    coalf = jax.jit(lambda d: dm.coal(cfg, d, params, dt, 10))
    print(f"dense coal x10:      {chain(coalf, d):9.2f} ms", flush=True)
    ad = jax.jit(lambda d: dm.adve_sedi_bcnd(cfg, d, dt, True))
    print(f"adve_sedi_bcnd:      {chain(ad, d):9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
