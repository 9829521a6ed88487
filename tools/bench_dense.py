"""Quick A/B: flat vs dense engine on the bench workload (run on TPU)."""
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.libcloudphxx_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NX = NZ = 76
SD = 64
N_STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 100


def run(engine):
    from libcloudphxx_tpu.models import Kinematic2D
    m = Kinematic2D(nx=NX, nz=NZ, micro="lgrngn", sd_conc=SD,
                    sstp_cond=10, sstp_coal=10, n_sd_max=SD * NX * NZ)
    n_sd = int(np.sum(np.asarray(m.prtcls.state.n) > 0))
    t0 = time.perf_counter()
    m.run_device_lgrngn(N_STEPS, engine=engine)
    compile_and_run = time.perf_counter() - t0
    t0 = time.perf_counter()
    m.run_device_lgrngn(N_STEPS, engine=engine)
    jax.block_until_ready(m.prtcls.state.th)
    elapsed = time.perf_counter() - t0
    print(f"{engine}: {elapsed/N_STEPS*1e3:.1f} ms/step "
          f"({n_sd*N_STEPS/elapsed:.3e} SD-updates/s) "
          f"[first call {compile_and_run:.1f}s]", flush=True)
    assert np.isfinite(m.th).all() and np.isfinite(m.rv).all()
    return elapsed / N_STEPS


if __name__ == "__main__":
    print(f"# devices: {jax.devices()}", flush=True)
    t_flat = run("flat")
    t_dense = run("dense")
    print(f"speedup dense/flat: {t_flat/t_dense:.2f}x", flush=True)
