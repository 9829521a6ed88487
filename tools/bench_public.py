"""Public-API throughput probe: the canonical bench workload driven through
the PUBLIC 3-phase particles_t contract (factory -> step_sync/step_async),
next to the device-resident model loop (run_device_lgrngn) for comparison.

Round-5 acceptance (VERDICT r4 item 1): the library's headline speed must be
reachable through the library's public API, not only the demo driver —
gate: public-API ms/step within 1.25x of run_device_lgrngn.

Usage: python tools/bench_public.py [n_steps]
"""

import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.libcloudphxx_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

NX = NZ = 76
SD_CONC = 64


def make_model():
    from libcloudphxx_tpu.models import Kinematic2D
    return Kinematic2D(
        nx=NX, nz=NZ, micro="lgrngn", sd_conc=SD_CONC,
        sstp_cond=10, sstp_coal=10, n_sd_max=SD_CONC * NX * NZ,
    )


def run_public(model, n_steps):
    """Drive the PUBLIC 3-phase contract with the device-array ABI (the
    TPU-native arrinfo_t analog): th/rv stay jax.Array handles, step_sync
    returns the updated pair, and nothing round-trips to the host inside
    the loop."""
    import jax.numpy as jnp
    from libcloudphxx_tpu.models import mpdata
    p = model.prtcls
    opts = model.opts
    opts.adve = opts.cond = opts.sedi = opts.coal = True
    opts.RH_max = 44.0
    nx, nz = model.nx, model.nz
    th = jnp.asarray(model.th)
    rv = jnp.asarray(model.rv)
    for _ in range(n_steps):
        th, rv = mpdata.advect2(th, rv, model.gc_x, model.gc_z, model.G,
                                n_iters=model.mpdata_iters, fct=model.fct)
        th, rv = p.step_sync(opts, th, rv)
        th = th.reshape(nx, nz)
        rv = rv.reshape(nx, nz)
        p.step_async(opts)
    jax.block_until_ready((th, rv))
    if getattr(p, "_loc", "") == "dense":
        jax.block_until_ready(p._d.n)   # the last step_async
    else:
        jax.block_until_ready(p.state.n)
    model.th = np.asarray(th)
    model.rv = np.asarray(rv)


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    print(f"# devices: {jax.devices()}", file=sys.stderr, flush=True)

    model = make_model()
    print(f"# engine: {type(model.prtcls).__name__}", file=sys.stderr,
          flush=True)
    state0 = model.prtcls.state
    th0, rv0 = model.th.copy(), model.rv.copy()

    # --- public API path
    run_public(model, 5)   # warm/compile
    print("# public warmup done", file=sys.stderr, flush=True)
    best_pub = float("inf")
    for _ in range(3):
        model.prtcls.state = state0
        if getattr(model.prtcls, "_loc", None) is not None:
            model.prtcls._loc = "flat"
            model.prtcls._d = None
        model.th, model.rv = th0.copy(), rv0.copy()
        t0 = time.perf_counter()
        run_public(model, n_steps)
        best_pub = min(best_pub, (time.perf_counter() - t0) / n_steps)
        print(f"# public rep: {best_pub*1e3:.2f} ms/step", file=sys.stderr,
              flush=True)

    # --- device-resident loop
    model.prtcls.state = state0
    if getattr(model.prtcls, "_loc", None) is not None:
        model.prtcls._loc = "flat"
        model.prtcls._d = None
    model.th, model.rv = th0.copy(), rv0.copy()
    model.run_device_lgrngn(n_steps, engine="dense")
    print("# device warmup done", file=sys.stderr, flush=True)
    best_dev = float("inf")
    for _ in range(3):
        model.prtcls.state = state0
        model.th, model.rv = th0.copy(), rv0.copy()
        t0 = time.perf_counter()
        model.run_device_lgrngn(n_steps, engine="dense")
        jax.block_until_ready(model.prtcls.state.th)
        best_dev = min(best_dev, (time.perf_counter() - t0) / n_steps)
        print(f"# device rep: {best_dev*1e3:.2f} ms/step", file=sys.stderr,
              flush=True)

    print(f"public-API: {best_pub*1e3:.2f} ms/step; "
          f"run_device:  {best_dev*1e3:.2f} ms/step; "
          f"ratio {best_pub/best_dev:.3f} (gate <= 1.25)")


if __name__ == "__main__":
    main()
