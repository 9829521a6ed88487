"""Sustained-workload throughput: the REAL GMD case, not the from-init rep.

bench.py times the canonical from-init 100-step window (row capacity 128);
the evolved population under rain concentrates SDs and forces larger row
capacities, which the r4 protocol sidestepped (VERDICT r4 weak #2).  This
probe runs the icicle defaults (nt=3600, spinup=2400 — reference
icicle.cpp:100-105) with the occupancy-aware repack policy
(run_device_lgrngn repack_every) and reports:

  - from-init ms/step (the bench.py protocol number, for reference)
  - spinup-phase ms/step
  - sustained ms/step over the last 1000 rain-active steps
  - the capacity trajectory the repack policy chose

Writes SUSTAINED_r05.json at the repo root.

Usage: python tools/bench_sustained.py [nt] [spinup]
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.libcloudphxx_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libcloudphxx_tpu.models import Kinematic2D  # noqa: E402

NX = NZ = 76
SD_CONC = 64
NT = int(sys.argv[1]) if len(sys.argv) > 1 else 3600
SPINUP = int(sys.argv[2]) if len(sys.argv) > 2 else 2400
REPACK = 100
# measure the sustained window over the final third (capped at 1000 steps)
# so short smoke invocations stay well-formed too
TAIL = min(1000, max(100, NT // 3))


def main():
    t_all = time.perf_counter()
    print(f"# devices: {jax.devices()}", flush=True)
    model = Kinematic2D(
        nx=NX, nz=NZ, micro="lgrngn", sd_conc=SD_CONC,
        sstp_cond=10, sstp_coal=10, n_sd_max=SD_CONC * NX * NZ,
    )
    n_sd = int(np.sum(model.prtcls.get_attr("n") > 0))
    print(f"# init: {n_sd} SDs", flush=True)

    caps = []
    orig_repack = None

    # record the capacity trajectory by wrapping dense.repack
    from libcloudphxx_tpu.lgrngn import dense as dense_mod
    orig_repack = dense_mod.repack

    def spy(cfg, d, new_cap):
        caps.append(int(new_cap))
        print(f"# repack -> cap {new_cap} "
              f"({time.perf_counter()-t_all:.0f}s)", flush=True)
        return orig_repack(cfg, d, new_cap)

    dense_mod.repack = spy
    try:
        # warm the from-init window & measure it (bench.py protocol)
        state0 = model.prtcls.state
        th0, rv0 = model.th.copy(), model.rv.copy()
        model.run_device_lgrngn(100, engine="dense")
        model.prtcls.state = state0
        model.th, model.rv = th0.copy(), rv0.copy()
        t0 = time.perf_counter()
        model.run_device_lgrngn(100, engine="dense")
        jax.block_until_ready(model.prtcls.state.th)
        from_init_ms = (time.perf_counter() - t0) / 100 * 1e3
        print(f"# from-init: {from_init_ms:.2f} ms/step", flush=True)

        # full sustained run (repack active)
        model.prtcls.state = state0
        model.th, model.rv = th0.copy(), rv0.copy()
        t0 = time.perf_counter()
        model.run_device_lgrngn(NT - TAIL, spinup=SPINUP, engine="dense",
                                repack_every=REPACK)
        jax.block_until_ready(model.prtcls.state.th)
        head_s = time.perf_counter() - t0
        print(f"# head {NT - TAIL} steps: "
              f"{head_s / (NT - TAIL) * 1e3:.2f} ms/step", flush=True)

        t0 = time.perf_counter()
        model.run_device_lgrngn(TAIL, engine="dense", repack_every=REPACK)
        jax.block_until_ready(model.prtcls.state.th)
        tail_s = time.perf_counter() - t0
        tail_ms = tail_s / TAIL * 1e3
        print(f"# sustained tail {TAIL} steps: {tail_ms:.2f} ms/step",
              flush=True)
    finally:
        dense_mod.repack = orig_repack

    n = model.prtcls.get_attr("n")
    alive = int((n > 0).sum())
    out = {
        "nt": NT, "spinup": SPINUP, "repack_every": REPACK,
        "margin": 1.25,
        "from_init_ms_per_step": round(from_init_ms, 2),
        "head_ms_per_step": round(head_s / (NT - TAIL) * 1e3, 2),
        "sustained_ms_per_step": round(tail_ms, 2),
        "sustained_over_from_init": round(from_init_ms / tail_ms, 3),
        "sd_updates_per_s_sustained": round(alive * 1e3 / tail_ms, 1),
        "alive_sds_end": alive,
        "cap_trajectory": caps,
        "wallclock_s": round(time.perf_counter() - t_all, 1),
    }
    print(json.dumps(out, indent=1), flush=True)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SUSTAINED_r05.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
