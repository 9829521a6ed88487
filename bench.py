"""Benchmark: SDM super-droplet updates per second per chip.

Runs the canonical GMD-2015 kinematic workload configuration (76x76 cells,
sd_conc=64, sstp_cond=sstp_coal=10 — BASELINE.md canonical + travis config)
as ONE fused device-resident XLA program (MPDATA + substepped implicit
condensation + substepped stochastic coalescence + advection + sedimentation
+ boundaries, lax.scan over steps) and reports one JSON line.

An "SD update" = one super-droplet advanced through one full model timestep.
Also reported (stderr): grid-points/s and a per-phase wall-clock profile
(MPDATA / condensation / coalescence / transport) so the next optimization
target is visible.

The reference publishes no throughput numbers (BASELINE.md), so vs_baseline
reports the ratio against the last locally recorded value in
.bench_baseline.json when present, else 1.0.
"""

import json
import os
import sys
import time

import jax

# persistent compilation cache: the fused unrolled step is big; compiling it
# through a remote-TPU tunnel is slow, so pay it once per machine
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.libcloudphxx_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

NX = NZ = 76
SD_CONC = 64
SSTP_COND = 10
SSTP_COAL = 10
N_STEPS = 100


def _time(fn, *args, reps=3):
    fn(*args)  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def profile_phases(model):
    """Per-phase single-step timings (stderr), reference hot-loop ranking
    (SURVEY section 3.5)."""
    from libcloudphxx_tpu.lgrngn.particles import (_step_async_jit,
                                                   _step_cond_jit)
    from libcloudphxx_tpu.models import mpdata
    p = model.prtcls
    cfg = p.cfg
    st = p.state
    dt = model.setup.dt
    th = jnp.asarray(model.th)

    t_mpdata = _time(lambda: mpdata.advect(
        th, model.gc_x, model.gc_z, model.G, n_iters=2, fct=model.fct))
    t_cond = _time(lambda: _step_cond_jit(cfg, st, dt, 44.0, False, False,
                                          True).rw2)
    params = jnp.asarray(np.asarray(p.opts_init.kernel_parameters,
                                    dtype=float))
    w_LS = jnp.zeros(cfg.nz)
    sgs = jnp.full(cfg.nz, cfg.dz)

    def async_(coal):
        sw = (coal, True, True, False, False, False, False, False)
        return _step_async_jit(cfg, SSTP_COAL, sw, st, params, w_LS, sgs,
                               dt).x
    t_async = _time(lambda: async_(True))
    t_async_nocoal = _time(lambda: async_(False))
    prof = {
        "mpdata(x2)": 2 * t_mpdata,
        "cond": t_cond,
        "coal": t_async - t_async_nocoal,
        "transport+vterm": t_async_nocoal,
    }
    tot = sum(prof.values())
    for k, v in prof.items():
        print(f"# phase {k}: {v*1e3:8.2f} ms/step ({100*v/tot:4.1f}%)",
              file=sys.stderr, flush=True)
    return prof


def main():
    from libcloudphxx_tpu.models import Kinematic2D

    print(f"# devices: {jax.devices()}", file=sys.stderr, flush=True)
    model = Kinematic2D(
        nx=NX, nz=NZ, micro="lgrngn", sd_conc=SD_CONC,
        sstp_cond=SSTP_COND, sstp_coal=SSTP_COAL,
        n_sd_max=SD_CONC * NX * NZ,
    )
    n_sd = int(np.sum(model.prtcls.get_attr("n") > 0))
    print(f"# init done: {n_sd} SDs", file=sys.stderr, flush=True)

    # compile + warm the fused scan, then time it
    model.run_device_lgrngn(N_STEPS)
    print("# warmup done", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    model.run_device_lgrngn(N_STEPS)
    jax.block_until_ready(model.prtcls.state.th)
    elapsed = time.perf_counter() - t0

    sd_updates_per_s = n_sd * N_STEPS / elapsed
    grid_points_per_s = NX * NZ * N_STEPS / elapsed
    print(f"# {elapsed/N_STEPS*1e3:.2f} ms/step; "
          f"grid-points/s: {grid_points_per_s:.3e}",
          file=sys.stderr, flush=True)

    try:
        profile_phases(model)
    except Exception as e:  # profile is informational only
        print(f"# phase profile failed: {e}", file=sys.stderr, flush=True)

    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".bench_baseline.json"
    )
    vs_baseline = 1.0
    try:
        with open(baseline_path) as f:
            prev = json.load(f)["value"]
        if prev > 0:
            vs_baseline = sd_updates_per_s / prev
    except (OSError, KeyError, ValueError):
        pass

    print(json.dumps({
        "metric": "SD-updates/s/chip (kinematic_2D 76x76 sd_conc=64 "
                  "sstp_cond=10 sstp_coal=10)",
        "value": round(sd_updates_per_s, 1),
        "unit": "SD-updates/s",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
