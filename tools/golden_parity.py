"""Run the fig_a travis lgrngn configuration and compare against the
reference's committed golden HDF5 refdata.

Reference gates (models/kinematic_2D/tests/paper_GMD_2015/fig_a/
CMakeLists.txt:101-115, h5diff):
  t=0 : th rel <= 1e-9, rv rel <= 1e-9, sd_conc rel <= 1e-9
  t=20: th rel <= 1e-3, rv rel <= 2.1e-3, sd_conc |delta| <= 1

Invocation (travis_calc_lgrngn.cpp:35-47):
  icicle --outfreq=10 --nt=20 --spinup=10 --nx=60 --nz=60
         --relax_th_rv=false --micro=lgrngn --backend=serial --sd_conc=64
         --sstp_cond=10 --sstp_coal=10

Usage: env PYTHONPATH=... python tools/golden_parity.py [refdata_dir]
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from libcloudphxx_tpu import lgrngn  # noqa: E402
from libcloudphxx_tpu.models.kinematic_2d import Kinematic2D  # noqa: E402

REFDATA = ("/root/reference/models/kinematic_2D/tests/paper_GMD_2015/"
           "fig_a/refdata/travis_out_lgrngn")


def run_travis(nt=20, spinup=10, nx=60, nz=60, sd_conc=64, outfreq=10,
               verbose=True, engine=None):
    """Returns {t: {"th": ..., "rv": ..., "sd_conc": ...}} snapshots taken
    with the reference's output protocol: th/rv recorded after MPDATA
    advection but before the microphysics of the output step (libmpdata++
    output runs in parent hook_post_step, kin_cloud_2d_lgrngn.hpp:222-225);
    sd_conc recorded by diag() after the microphysics.

    engine="dense" routes the run through the dense cell-major engine via
    the factory (LIBCLOUD_ENGINE), exercising the fast path against the
    same reference gates."""
    import os
    if engine is not None:
        os.environ["LIBCLOUD_ENGINE"] = engine
    try:
        model = Kinematic2D(
            nx=nx, nz=nz, micro="lgrngn", sd_conc=sd_conc,
            sstp_cond=10, sstp_coal=10, n_sd_max=nx * nz * sd_conc,
            grid="node", fct=True, reference_rng=True,
            kernel_parameters=[0.5],
            terminal_velocity=lgrngn.vt_t.khvorostyanov_spherical,
            backend=lgrngn.backend_t.serial,
        )
    finally:
        if engine is not None:
            os.environ.pop("LIBCLOUD_ENGINE", None)
    if engine == "dense":
        assert type(model.prtcls).__name__ == "particles_dense_t"
    snaps = {0: {
        "th": model.th.copy(), "rv": model.rv.copy(),
        "sd_conc": model.diag_lgrngn("sd_conc").copy(),
    }}
    for t in range(1, nt + 1):
        model.advect_scalars()
        rec = (t % outfreq == 0)
        if rec:
            snaps[t] = {"th": model.th.copy(), "rv": model.rv.copy()}
        model.micro_step(spinup=(t <= spinup))
        if rec:
            snaps[t]["sd_conc"] = model.diag_lgrngn("sd_conc").copy()
        if verbose:
            print(f"step {t} done", flush=True)
    return snaps


def load_ref(refdata, t):
    import h5py
    fn = f"{refdata}/travis_timestep{t:010d}.h5"
    with h5py.File(fn, "r") as f:
        return {k: f[k][:] for k in ("th", "rv", "sd_conc")}


def compare(snaps, refdata=REFDATA):
    out = {}
    for t in (0, 20):
        if t not in snaps:
            continue
        ref = load_ref(refdata, t)
        res = {}
        for k in ("th", "rv", "sd_conc"):
            mine = np.float32(snaps[t][k])
            theirs = ref[k]
            rel = np.abs(mine - theirs) / np.maximum(np.abs(theirs), 1e-30)
            res[k] = {
                "max_rel": float(rel.max()),
                "max_abs": float(np.abs(mine - theirs).max()),
                "n_diff": int((mine != theirs).sum()),
            }
        out[t] = res
    return out


if __name__ == "__main__":
    refdata = sys.argv[1] if len(sys.argv) > 1 else REFDATA
    snaps = run_travis()
    rep = compare(snaps, refdata)
    for t, res in rep.items():
        print(f"== t={t}")
        for k, v in res.items():
            print(f"  {k}: max_rel={v['max_rel']:.3e} "
                  f"max_abs={v['max_abs']:.3e} n_diff={v['n_diff']}")
    gates = (
        rep[0]["th"]["max_rel"] <= 1e-9,
        rep[0]["rv"]["max_rel"] <= 1e-9,
        rep[0]["sd_conc"]["max_rel"] <= 1e-9,
        rep[20]["th"]["max_rel"] <= 1e-3,
        rep[20]["rv"]["max_rel"] <= 2.1e-3,
        rep[20]["sd_conc"]["max_abs"] <= 1.0,
    )
    print("gates:", gates, "PASS" if all(gates) else "FAIL")
