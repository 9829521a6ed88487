"""A/B the hall tabulated kernel: resident Pallas step vs XLA dense path.

The in-kernel efficiency lookup (coalescence.interpolated_efficiency_sweep)
is gated bitwise on CPU; this probe runs the REAL Mosaic lowering on TPU
at bench shape and checks physics agreement between the two engines.  Coal
pairing RNG differs between them (on-core PRNG vs jax.random), so SD
populations are compared statistically — domain-total liquid water, rain
mass (r > 25 um) and droplet-count moments after 100 post-spinup steps —
while conservation is gated exactly per engine.

Also records ms/step per mode: the marginal cost of the 121-row efficiency
sweep is (hall resident) - (geometric resident).

Each mode runs in a SUBPROCESS: resident_ok reads LIBCLOUD_RESIDENT at
trace time, and a shared jit cache would otherwise pin the first mode's
branch.  Writes AB_HALL_r05.json at the repo root.

Usage: python tools/ab_resident_hall.py          # orchestrates both modes
       python tools/ab_resident_hall.py worker <mode> <kernel>  # internal
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_STEPS = 100
NX = NZ = 76
SD_CONC = 64


def worker(mode, kern_name):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.libcloudphxx_tpu_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np
    sys.path.insert(0, ROOT)
    from libcloudphxx_tpu import lgrngn
    from libcloudphxx_tpu.models import Kinematic2D
    kern = getattr(lgrngn.kernel_t, kern_name)
    model = Kinematic2D(
        nx=NX, nz=NZ, micro="lgrngn", sd_conc=SD_CONC,
        sstp_cond=10, sstp_coal=10, n_sd_max=SD_CONC * NX * NZ,
        opts_init_kw={"kernel": kern},
    )
    sys.path.insert(0, ROOT)
    import bench as benchmod
    water0, dry0 = benchmod.water_dry_totals(model)

    model.run_device_lgrngn(N_STEPS, engine="dense")     # compile + warm
    state0 = model.prtcls.state  # evolved once; restart for the timed run
    model2 = Kinematic2D(
        nx=NX, nz=NZ, micro="lgrngn", sd_conc=SD_CONC,
        sstp_cond=10, sstp_coal=10, n_sd_max=SD_CONC * NX * NZ,
        opts_init_kw={"kernel": kern},
    )
    t0 = time.perf_counter()
    model2.run_device_lgrngn(N_STEPS, engine="dense")
    jax.block_until_ready(model2.prtcls.state.th)
    ms = (time.perf_counter() - t0) / N_STEPS * 1e3

    checks = benchmod.physics_checks(model2, water0, dry0)
    p = model2.prtcls
    n = p.get_attr("n")
    rw2 = p.get_attr("rw2")
    alive = n > 0
    rw3 = rw2 ** 1.5
    rain = alive & (rw2 > (25e-6) ** 2)
    out = {
        "mode": mode,
        "kernel": kern_name,
        "ms_per_step": round(ms, 3),
        "liq_mass": float((n * rw3 * alive).sum()),
        "rain_mass": float((n * rw3 * rain).sum()),
        "rain_sds": int(rain.sum()),
        "drop_count": float((n * alive).sum()),
        "th_mean": float(np.asarray(model2.th).mean()),
        "rv_mean": float(np.asarray(model2.rv).mean()),
        **checks,
    }
    print("AB_JSON:" + json.dumps(out), flush=True)


def run_mode(mode, kern_name):
    env = dict(os.environ)
    env["LIBCLOUD_RESIDENT"] = "auto" if mode == "resident" else "0"
    env["PYTHONPATH"] = "/root/.axon_site:" + ROOT
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "worker", mode,
         kern_name],
        capture_output=True, text=True, timeout=3000, env=env)
    for line in r.stdout.splitlines():
        if line.startswith("AB_JSON:"):
            return json.loads(line[len("AB_JSON:"):])
    raise RuntimeError(
        f"worker {mode}/{kern_name} produced no result:\n"
        f"{r.stdout[-2000:]}\n{r.stderr[-2000:]}")


def main():
    res = {}
    for mode in ("resident", "xla"):
        res[mode] = run_mode(mode, "hall")
        print(f"# {mode}: {res[mode]['ms_per_step']} ms/step, "
              f"rain_mass {res[mode]['rain_mass']:.3e}", flush=True)
    # marginal sweep cost vs the geometric-kernel resident step
    res["resident_geometric"] = run_mode("resident", "geometric")

    a, b = res["resident"], res["xla"]
    rel = lambda x, y: abs(x - y) / max(abs(y), 1e-300)
    agreement = {
        "liq_mass_rel": rel(a["liq_mass"], b["liq_mass"]),
        "rain_mass_rel": rel(a["rain_mass"], b["rain_mass"]),
        "drop_count_rel": rel(a["drop_count"], b["drop_count"]),
        "th_mean_abs": abs(a["th_mean"] - b["th_mean"]),
        "speedup_xla_over_resident": b["ms_per_step"] / a["ms_per_step"],
        "sweep_marginal_ms": a["ms_per_step"]
        - res["resident_geometric"]["ms_per_step"],
    }
    res["agreement"] = {k: (round(v, 6) if isinstance(v, float) else v)
                        for k, v in agreement.items()}
    # statistical gates: different RNG realizations, same physics
    assert agreement["liq_mass_rel"] < 0.05, agreement
    assert agreement["drop_count_rel"] < 0.05, agreement
    assert agreement["th_mean_abs"] < 0.1, agreement
    with open(os.path.join(ROOT, "AB_HALL_r05.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res["agreement"], indent=1))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(sys.argv[2], sys.argv[3])
    else:
        main()
