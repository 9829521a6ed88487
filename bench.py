"""Benchmark: SDM super-droplet updates per second per chip.

Runs the canonical GMD-2015 kinematic workload configuration (76x76 cells,
sd_conc=64, sstp_cond=sstp_coal=10 — BASELINE.md canonical + travis config)
as a pure device-resident SDM step loop and reports one JSON line.

An "SD update" = one super-droplet advanced through one full model timestep
(all enabled processes: substepped implicit condensation, substepped
stochastic coalescence, advection, sedimentation, boundaries).

The reference publishes no throughput numbers (BASELINE.md), so vs_baseline
reports the ratio against the last locally recorded value in
.bench_baseline.json when present, else 1.0.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

NX = NZ = 76
SD_CONC = 64
SSTP_COND = 10
SSTP_COAL = 10
N_STEPS = 10


def main():
    import sys

    from libcloudphxx_tpu.models import Kinematic2D

    print(f"# devices: {jax.devices()}", file=sys.stderr, flush=True)
    model = Kinematic2D(
        nx=NX, nz=NZ, micro="lgrngn", sd_conc=SD_CONC,
        sstp_cond=SSTP_COND, sstp_coal=SSTP_COAL,
        n_sd_max=SD_CONC * NX * NZ,
    )
    n_sd = int(np.sum(model.prtcls.get_attr("n") > 0))
    print(f"# init done: {n_sd} SDs", file=sys.stderr, flush=True)

    # warmup / compile: the model runs the per-phase jits (mpdata advection,
    # condensation, transport) — fusing everything into one XLA program
    # explodes compile time without a runtime win
    model.run(2)
    print("# warmup done", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    model.run(N_STEPS)
    jax.block_until_ready(model.prtcls.state.th)
    elapsed = time.perf_counter() - t0

    sd_updates_per_s = n_sd * N_STEPS / elapsed

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
