"""Root-cause probe for the lax.scan pessimisation (VERDICT r3 item 8).

Round 3 measured the dense fused step 11x SLOWER inside lax.scan than
host-chained (2402 vs 219 ms).  This tool re-measures on the current
engine (incl. the r4 kernel-resident step) across loop strategies:
  chained      - python loop over one jitted step (the production default)
  scan         - jax.lax.scan over the same step
  scan+donate  - scan with the carry donated (jit donate_argnums)
  window K     - python loop over jitted scan-of-K-step chunks
A resident device loop matters for multi-host runs and for overlapping
the Eulerian half-step as the reference does (kin_cloud_2d_lgrngn.hpp:
254-276).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.libcloudphxx_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

N = 30


def timeit(fn, carry, reps=N):
    out = fn(carry)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    c = carry
    for _ in range(reps):
        c = fn(c)
    jax.block_until_ready(c)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    from libcloudphxx_tpu.models import Kinematic2D
    from libcloudphxx_tpu.lgrngn import dense as dm

    m = Kinematic2D(nx=76, nz=76, micro="lgrngn", sd_conc=64,
                    sstp_cond=10, sstp_coal=10, n_sd_max=64 * 76 * 76)
    cfg = m.prtcls.cfg
    cap = m.dense_capacity()
    d = jax.jit(dm.pack, static_argnums=(0, 2))(cfg, m.prtcls.state, cap)
    carry = (d, jnp.asarray(m.th), jnp.asarray(m.rv))
    f = m._lgrngn_step_fn_dense(False)

    fj = jax.jit(f)
    t = timeit(fj, carry)
    print(f"chained:          {t:8.2f} ms/step", flush=True)

    sc = jax.jit(lambda c: jax.lax.scan(
        lambda cc, _: (f(cc), None), c, None, length=N)[0])
    out = sc(carry); jax.block_until_ready(out)
    t0 = time.perf_counter(); out = sc(carry); jax.block_until_ready(out)
    print(f"scan({N}):         {(time.perf_counter()-t0)/N*1e3:8.2f} "
          f"ms/step", flush=True)

    scd = jax.jit(lambda c: jax.lax.scan(
        lambda cc, _: (f(cc), None), c, None, length=N)[0],
        donate_argnums=0)
    out = scd(jax.tree.map(jnp.copy, carry)); jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = scd(jax.tree.map(jnp.copy, carry)); jax.block_until_ready(out)
    print(f"scan+donate({N}):  {(time.perf_counter()-t0)/N*1e3:8.2f} "
          f"ms/step", flush=True)

    for K in (5, 10):
        w = jax.jit(lambda c: jax.lax.scan(
            lambda cc, _: (f(cc), None), c, None, length=K)[0])
        t = timeit(w, carry, reps=max(2, N // K))
        print(f"window K={K}:     {t/K:8.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
