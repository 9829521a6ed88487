"""Per-phase TPU timings of the dense engine's building blocks.

Times each jitted piece of the dense pipeline in isolation (cond substep
loop / coal loop / batched lane sort / transport+rebin / pallas solve) so
the pathological op is visible.  Run on the TPU.
"""
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.libcloudphxx_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NX = NZ = 76
SD = 64


def t(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    from libcloudphxx_tpu.models import Kinematic2D
    from libcloudphxx_tpu.lgrngn import dense as dm

    print(f"# devices: {jax.devices()}", flush=True)
    m = Kinematic2D(nx=NX, nz=NZ, micro="lgrngn", sd_conc=SD,
                    sstp_cond=10, sstp_coal=10, n_sd_max=SD * NX * NZ)
    p = m.prtcls
    cfg = p.cfg
    cap = m.dense_capacity()
    print(f"# cap={cap} n_cell={cfg.n_cell}", flush=True)
    d = jax.jit(dm.pack, static_argnums=(0, 2))(cfg, p.state, cap)
    th = jnp.asarray(m.th).reshape(-1)
    rv = jnp.asarray(m.rv).reshape(-1)
    params = jnp.asarray(np.asarray(p.opts_init.kernel_parameters,
                                    dtype=float))
    dt = m.setup.dt

    cond = jax.jit(lambda d, th, rv: dm.step_cond(cfg, d, th, rv, dt, 44.0),
                   static_argnums=())
    print(f"cond(10 substeps):  {t(cond, d, th, rv):9.2f} ms", flush=True)

    coal = jax.jit(lambda d: dm.coal(cfg, d, params, dt, 10))
    print(f"coal(10 substeps):  {t(coal, d):9.2f} ms", flush=True)

    coal1 = jax.jit(lambda d: dm.coal(cfg, d, params, dt, 1))
    print(f"coal(1 substep):    {t(coal1, d):9.2f} ms", flush=True)

    # the batched lane sort alone
    key = jax.random.PRNGKey(0)
    u = jax.random.uniform(key, d.n.shape)
    srt = jax.jit(lambda u, d: jax.lax.sort(
        (u, d.n, d.rw2, d.rd3, d.kpa, d.vt, d.x, d.z),
        dimension=1, num_keys=1)[1])
    print(f"lane sort (8 ops):  {t(srt, u, d):9.2f} ms", flush=True)

    srt1 = jax.jit(lambda u: jax.lax.sort((u,), dimension=1, num_keys=1)[0])
    print(f"lane sort (1 op):   {t(srt1, u):9.2f} ms", flush=True)

    tr = jax.jit(lambda d: dm.rebin(cfg, dm.adve_sedi_bcnd(cfg, d, dt, True)))
    print(f"adve+sedi+rebin:    {t(tr, d):9.2f} ms", flush=True)

    vt = jax.jit(lambda d: dm.vterm_mod.vt_of(
        cfg, d.rw2, d.T[:, None], d.p[:, None], d.rhod[:, None],
        d.eta[:, None]))
    print(f"vterm:              {t(vt, d):9.2f} ms", flush=True)

    from libcloudphxx_tpu.lgrngn.condensation import advance_rw2
    shape = d.rw2.shape
    row = lambda a: jnp.broadcast_to(a[:, None], shape).ravel()
    args = (d.rw2.ravel(), d.rd3.ravel(), d.kpa.ravel(), d.vt.ravel(),
            row(d.rhod), row(d.rv if hasattr(d, 'rv') else d.sstp_tmp_rv),
            row(d.T), row(d.p), row(d.RH), row(d.eta),
            row(d.T * 0 + 1e-7), row(d.T * 0 + 1e-7))
    adv = jax.jit(lambda *a: advance_rw2(0.1, *a, 44.0))
    print(f"advance_rw2 x1:     {t(adv, *args):9.2f} ms", flush=True)

    ker = jax.jit(lambda d: dm.coal_mod.kernel_value(
        cfg, params, d.n, dm._lshift(d.n), d.rw2, dm._lshift(d.rw2),
        d.vt, dm._lshift(d.vt), d.rd3, dm._lshift(d.rd3),
        rhod=d.rhod[:, None], eta=d.eta[:, None]))
    print(f"kernel_value:       {t(ker, d):9.2f} ms", flush=True)

    ad = jax.jit(lambda d: dm.adve_sedi_bcnd(cfg, d, dt, True))
    print(f"adve_sedi_bcnd:     {t(ad, d):9.2f} ms", flush=True)
    rb = jax.jit(lambda d: dm.rebin(cfg, d))
    print(f"rebin:              {t(rb, d):9.2f} ms", flush=True)

    # one fused model step (mpdata + cond + async) outside any scan
    f = m._lgrngn_step_fn_dense(False)
    step1 = jax.jit(f)
    carry = (d, jnp.asarray(m.th), jnp.asarray(m.rv))
    print(f"fused step (jit):   {t(step1, carry):9.2f} ms", flush=True)

    scan5 = jax.jit(lambda c: jax.lax.scan(
        lambda cc, _: (f(cc), None), c, None, length=5)[0])
    print(f"fused scan(5)/step: {t(scan5, carry)/5:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
