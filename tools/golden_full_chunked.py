"""Full-length fig_a lgrngn golden run, chunked ACROSS PROCESSES.

The axon TPU worker crashes medium/long runs in a single process
("TPU worker process crashed or restarted — kernel fault"; bisected
environmental: reproduces with LIBCLOUD_RESIDENT=0 pure-XLA and with the
reference-faithful sort pairing, while ~600-step processes pass —
PERF_r05.md).  This tool runs the same 9000-step case as
golden_full_lgrngn.py in ~450-step process chunks glued by the library's
first-class checkpoint/restore (particles.save/load — the reference has
no library-level checkpointing, SURVEY section 5), retrying a chunk from
its own checkpoint when the worker dies under it.

Usage:
  python tools/golden_full_chunked.py chunk   # advance one chunk (rc 3 = more to do)
  python tools/golden_full_chunked.py run     # loop chunks in subprocesses + finalize
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

CKPT = "/tmp/golden_ckpt.npz"
META = "/tmp/golden_ckpt_meta.json"
NT = 9000
SPINUP = 7200
CHUNK = int(os.environ.get("GOLDEN_CHUNK", "450"))
MORE = 3  # exit code: chunk done, more remain


def _model(fast_init):
    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.expanduser(
        "~/.libcloudphxx_tpu_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from libcloudphxx_tpu import lgrngn
    from libcloudphxx_tpu.models import Kinematic2D
    import golden_full_lgrngn as G
    return Kinematic2D(
        nx=G.NX, nz=G.NZ, micro="lgrngn", sd_conc=64,
        sstp_cond=10, sstp_coal=10, n_sd_max=G.NX * G.NZ * 64,
        grid="node", fct=True,
        # bit-exact reference init only matters for the FIRST process;
        # resumed processes overwrite the whole state from the checkpoint
        reference_rng=not fast_init,
        kernel_parameters=[0.5],
        terminal_velocity=lgrngn.vt_t.khvorostyanov_spherical,
        backend=lgrngn.backend_t.serial,
    )


def chunk():
    import numpy as np
    t0 = time.perf_counter()
    resume = os.path.exists(META)
    step = json.load(open(META))["step"] if resume else 0
    model = _model(fast_init=resume)
    if resume:
        model.prtcls.load(CKPT)
        aux = np.load(CKPT)
        model.th = np.float64(aux["__model_th__"])
        model.rv = np.float64(aux["__model_rv__"])
    print(f"# chunk from step {step} ({time.perf_counter()-t0:.0f}s init)",
          flush=True)

    # stop at NT-1: the finalize stage runs the last step piecewise
    k = min(CHUNK, (NT - 1) - step)
    spin = max(0, min(SPINUP - step, k))
    model.run_device_lgrngn(k, spinup=spin, repack_every=100)
    step += k

    leaves = {}
    model.prtcls.save("/tmp/golden_ckpt_prt.npz")
    with np.load("/tmp/golden_ckpt_prt.npz") as f:
        leaves = {n: f[n] for n in f.files}
    leaves["__model_th__"] = np.float64(model.th)
    leaves["__model_rv__"] = np.float64(model.rv)
    np.savez_compressed(CKPT, **leaves)
    json.dump({"step": step}, open(META, "w"))
    print(f"# step {step}/{NT-1} done ({time.perf_counter()-t0:.0f}s)",
          flush=True)
    return 0 if step >= NT - 1 else MORE


def finalize():
    import numpy as np
    import golden_full_lgrngn as G
    t0 = time.perf_counter()
    model = _model(fast_init=True)
    model.prtcls.load(CKPT)
    aux = np.load(CKPT)
    model.th = np.float64(aux["__model_th__"])
    model.rv = np.float64(aux["__model_rv__"])

    model.advect_scalars()
    th_rec = model.th.copy()
    rv_rec = model.rv.copy()
    model.micro_step(spinup=False)
    fields = G.diag_fields(model)
    fields["th"] = np.float32(th_rec)
    fields["rv"] = np.float32(rv_rec)

    import h5py
    with h5py.File(G.REFH5, "r") as f:
        ref = {k: f[k][:] for k in f.keys()}
    report = {}
    for k, mine in sorted(fields.items()):
        if k not in ref:
            continue
        theirs = ref[k]
        d = np.abs(np.float64(mine) - np.float64(theirs))
        denom = np.maximum(np.abs(theirs), 1e-30)
        sum_m, sum_t = float(np.float64(mine).sum()), float(theirs.sum())
        report[k] = {
            "max_abs": float(d.max()),
            "max_rel": float((d / denom).max()),
            "sum_rel": (abs(sum_m - sum_t) / max(abs(sum_t), 1e-30)),
            "corr": float(np.corrcoef(np.float64(mine).ravel(),
                                      np.float64(theirs).ravel())[0, 1]),
        }
        print(f"{k:16s} max_abs={report[k]['max_abs']:.3e} "
              f"sum_rel={report[k]['sum_rel']:.3e} "
              f"corr={report[k]['corr']:.4f}", flush=True)
    with open(os.path.join(REPO, "GOLDEN_FULL_r05.json"), "w") as f:
        json.dump({"nt": NT, "spinup": SPINUP, "chunked": CHUNK,
                   "dtype": "float32 (TPU)",
                   "wallclock_s_finalize": round(
                       time.perf_counter() - t0, 1),
                   "fields": report}, f, indent=1)
    print("# wrote GOLDEN_FULL_r05.json", flush=True)


def run():
    for f in (CKPT, META):
        if os.path.exists(f):
            os.remove(f)
    fails = 0
    while True:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "chunk"],
            cwd=REPO, timeout=1800).returncode
        if r == 0:
            break
        if r == MORE:
            fails = 0
            continue
        fails += 1
        print(f"# chunk crashed (rc {r}), retry {fails}", flush=True)
        if fails >= 20:
            sys.exit(f"giving up after {fails} consecutive crashes")
        time.sleep(45)
    subprocess.run([sys.executable, os.path.abspath(__file__), "finalize"],
                   cwd=REPO, timeout=1800, check=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "run"
    if mode == "chunk":
        sys.exit(chunk())
    elif mode == "finalize":
        finalize()
    else:
        run()
