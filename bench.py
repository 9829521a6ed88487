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
    import dataclasses

    from libcloudphxx_tpu.lgrngn import coalescence, condensation, hskpng
    from libcloudphxx_tpu.lgrngn import transport
    from libcloudphxx_tpu.lgrngn import vterm as vterm_mod
    from libcloudphxx_tpu.models import Kinematic2D, mpdata

    model = Kinematic2D(
        nx=NX, nz=NZ, micro="lgrngn", sd_conc=SD_CONC,
        sstp_cond=SSTP_COND, sstp_coal=SSTP_COAL,
        n_sd_max=SD_CONC * NX * NZ,
    )
    cfg = model.prtcls.cfg
    gc_x, gc_z, G = model.gc_x, model.gc_z, model.G
    params = jnp.zeros((1,))
    n_sd = int(np.sum(model.prtcls.get_attr("n") > 0))

    @jax.jit
    def step(state, th, rv):
        th = mpdata.advect(th, gc_x, gc_z, G)
        rv = mpdata.advect(rv, gc_x, gc_z, G)
        state = dataclasses.replace(
            state, th=th.reshape(-1), rv=rv.reshape(-1)
        )
        state = hskpng.hskpng_Tpr(cfg, state)
        state = condensation.cond_percell(cfg, state, cfg.dt, 44.0)
        state = condensation.sstp_save(state)
        state = vterm_mod.hskpng_vterm_all(cfg, state)
        state = coalescence.coal(cfg, state, params, cfg.dt, SSTP_COAL)
        state = transport.adve(cfg, state)
        state = transport.sedi(state, cfg.dt)
        state = transport.bcnd(cfg, state)
        state = transport.post_step(cfg, state)
        return state, state.th.reshape(NX, NZ), state.rv.reshape(NX, NZ)

    state = model.prtcls.state
    th = jnp.asarray(model.th)
    rv = jnp.asarray(model.rv)

    # warmup / compile
    state, th, rv = step(state, th, rv)
    jax.block_until_ready(th)

    t0 = time.perf_counter()
    for _ in range(N_STEPS):
        state, th, rv = step(state, th, rv)
    jax.block_until_ready(th)
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
