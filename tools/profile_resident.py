"""Split the resident-step cost (PERF_r04: ~13 ms kernel + ~5 ms rebin +
~3 ms MPDATA + ~1 ms dispatch at 22.3 ms/step) into its in-kernel parts,
by timing step_resident variants at the bench shape on the real TPU:

  full              - sstp_cond=10, sstp_coal=10 (the production kernel)
  cond-only         - sstp_coal=0 (no shuffle/pairing at all)
  coal-only         - sstp_cond=0
  transport-only    - both 0 (vterm + adve + walls only)
  sort-probe        - a kernel running ONLY the 10x bitonic shuffle
                      (key + 7 rides), no physics

plus the XLA pieces (mpdata, rebin) and the full fused step, so the
budget adds up.  Used to decide where the round-4/5 kernel work goes.
"""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.libcloudphxx_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

REPS = 30


def timeit(fn, *args, reps=REPS):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def sort_probe(n, planes, sstp):
    """10x (u01-key bitonic sort over `planes` ridden planes) — the shuffle
    cost in isolation."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from libcloudphxx_tpu.ops.pallas_coal import _u01, bitonic_sort_rows

    def kern(seed_ref, n_ref, *refs):
        outs = refs[planes:]
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        vals = tuple(r[:] for r in (n_ref,) + refs[:planes])

        def sub(_, vals):
            u = _u01(vals[0].shape)
            skey = jnp.where(vals[0] > 0, u, 2.0)
            _, vals = bitonic_sort_rows(skey, vals)
            return vals

        vals = jax.lax.fori_loop(0, sstp, sub, vals)
        for o, v in zip(outs, vals[1:]):
            o[:] = v

    n_cell, cap = n.shape
    block = 128
    nblk = pl.cdiv(n_cell, block)
    pad = nblk * block - n_cell
    arrs = [jnp.pad(n, ((0, pad), (0, 0)))]
    for i in range(planes):
        arrs.append(arrs[0] + i)
    spec = pl.BlockSpec((block, cap), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    scal = pl.BlockSpec(memory_space=pltpu.SMEM)
    f = pl.pallas_call(
        kern,
        grid=(nblk,),
        out_shape=tuple([jax.ShapeDtypeStruct(arrs[0].shape, jnp.float32)]
                        * planes),
        in_specs=[scal] + [spec] * (planes + 1),
        out_specs=tuple([spec] * planes),
        input_output_aliases={i + 2: i for i in range(planes)},
    )
    seed = jnp.zeros((1,), jnp.int32)
    return jax.jit(lambda *a: f(seed, *a)), arrs


def main():
    from libcloudphxx_tpu.models import Kinematic2D
    from libcloudphxx_tpu.lgrngn import dense as dm
    from libcloudphxx_tpu.lgrngn import hskpng
    from libcloudphxx_tpu.ops.pallas_step import step_resident
    from libcloudphxx_tpu.models import mpdata

    m = Kinematic2D(nx=76, nz=76, micro="lgrngn", sd_conc=64,
                    sstp_cond=10, sstp_coal=10, n_sd_max=64 * 76 * 76)
    cfg = m.prtcls.cfg
    cap = m.dense_capacity()
    d = jax.jit(dm.pack, static_argnums=(0, 2))(cfg, m.prtcls.state, cap)
    print(f"# cap={cap} n_cell={cfg.n_cell}", flush=True)
    th = jnp.asarray(m.th)
    rv = jnp.asarray(m.rv)
    params = jnp.zeros((0,), jnp.float32)
    dt, RH_max = float(m.setup.dt), 44.0

    lam_D, lam_K = hskpng.hskpng_mfp(d.T, d.p)
    C_l, C_r, C_b, C_a = dm._row_courants(cfg, d)
    wls = jnp.zeros_like(d.rhod)

    def run_kernel(sc, sl, do_coal):
        f = jax.jit(functools.partial(
            step_resident, cfg, sc, sl, dt, RH_max, do_coal, True, False))
        return timeit(
            lambda: f(jnp.int32(1), params, d.n, d.rw2, d.rd3, d.kpa,
                      d.x, d.z, th.reshape(-1), rv.reshape(-1),
                      d.sstp_tmp_th, d.sstp_tmp_rv, d.rhod, d.dv,
                      lam_D, lam_K, C_l, C_r, C_b, C_a, wls))

    t_full = run_kernel(10, 10, True)
    print(f"kernel full (10/10):   {t_full:7.2f} ms", flush=True)
    t_cond = run_kernel(10, 0, False)
    print(f"kernel cond-only:      {t_cond:7.2f} ms", flush=True)
    t_coal = run_kernel(1, 10, True)
    print(f"kernel coal+1cond:     {t_coal:7.2f} ms", flush=True)
    t_tr = run_kernel(1, 0, False)
    print(f"kernel transport+1cond:{t_tr:7.2f} ms", flush=True)

    for planes in (7, 5, 2):
        f, arrs = sort_probe(d.n, planes, 10)
        t = timeit(f, *arrs)
        print(f"sort probe 10x, {planes} rides: {t:7.2f} ms", flush=True)

    # XLA pieces
    t_rebin = timeit(jax.jit(lambda dd: dm.rebin(cfg, dd)), d)
    print(f"rebin (XLA):           {t_rebin:7.2f} ms", flush=True)
    gc_x, gc_z, G = m.gc_x, m.gc_z, m.G
    adv = jax.jit(lambda a: mpdata.advect(
        a, gc_x, gc_z, G, n_iters=m.mpdata_iters, fct=m.fct))
    t_mp = timeit(adv, th)
    print(f"mpdata x1 (XLA):       {t_mp:7.2f} ms", flush=True)

    fstep = jax.jit(m._lgrngn_step_fn_dense(False))
    t_step = timeit(fstep, (d, th, rv))
    print(f"FULL fused step:       {t_step:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
