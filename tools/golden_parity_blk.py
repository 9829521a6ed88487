"""fig_a golden-data comparison for the bulk schemes.

Reference gates (fig_a/CMakeLists.txt:54-88, h5diff):
  blk_1m t=0 and t=9000: |d rv|,|d rc|,|d rr| <= 2e-5 ; |d th| <= 0.1 K
  blk_2m t=0: rel <= 1e-9 ; t=9000: rv rel <= 0.02 ; |d rr| <= 12e-6 ;
              |d rc| <= 4.5e-6 ; |d th| <= 0.4 K

Invocation (travis_calc_blk.cpp:16-21): icicle --outfreq=200 --nt=9000
--spinup=7200 --nx=76 --nz=76 --relax_th_rv=false --micro=blk_{1,2}m
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from libcloudphxx_tpu.models.kinematic_2d import Kinematic2D  # noqa: E402

REFBASE = ("/root/reference/models/kinematic_2D/tests/paper_GMD_2015/"
           "fig_a/refdata")
FIELDS = {"blk_1m": ("th", "rv", "rc", "rr"),
          "blk_2m": ("th", "rv", "rc", "rr", "nc", "nr")}


def run_blk(micro, nt=9000, spinup=7200, nx=76, nz=76, verbose=True):
    model = Kinematic2D(nx=nx, nz=nz, micro=micro, grid="node", fct=True)
    model.ante_loop()
    snap = lambda: {k: np.float32(getattr(model, k)).copy()
                    for k in FIELDS[micro]}
    snaps = {0: snap()}
    model.run_device(nt, spinup=min(spinup, nt))
    snaps[nt] = snap()
    return snaps


def load_ref(micro, t):
    import h5py
    fn = f"{REFBASE}/travis_out_{micro}/timestep{t:010d}.h5"
    with h5py.File(fn, "r") as f:
        return {k: f[k][:] for k in f.keys()}


def compare(micro, snaps):
    out = {}
    for t in snaps:
        ref = load_ref(micro, t)
        res = {}
        for k in FIELDS[micro]:
            if k not in ref:
                continue
            mine, theirs = snaps[t][k], ref[k]
            res[k] = {
                "max_abs": float(np.abs(mine - theirs).max()),
                "max_rel": float((np.abs(mine - theirs)
                                  / np.maximum(np.abs(theirs), 1e-30)).max()),
            }
        out[t] = res
    return out


GATES = {
    "blk_1m": lambda r: (
        r[9000]["rv"]["max_abs"] <= 2e-5,
        r[9000]["rc"]["max_abs"] <= 2e-5,
        r[9000]["rr"]["max_abs"] <= 2e-5,
        r[9000]["th"]["max_abs"] <= 0.1,
    ),
    "blk_2m": lambda r: (
        r[9000]["rv"]["max_rel"] <= 0.02,
        r[9000]["rr"]["max_abs"] <= 12e-6,
        r[9000]["rc"]["max_abs"] <= 4.5e-6,
        r[9000]["th"]["max_abs"] <= 0.4,
    ),
}


if __name__ == "__main__":
    micro = sys.argv[1] if len(sys.argv) > 1 else "blk_1m"
    nt = int(sys.argv[2]) if len(sys.argv) > 2 else 9000
    snaps = run_blk(micro, nt=nt)
    rep = compare(micro, snaps)
    for t, res in rep.items():
        print(f"== t={t}")
        for k, v in res.items():
            print(f"  {k}: max_abs={v['max_abs']:.3e} "
                  f"max_rel={v['max_rel']:.3e}")
    if nt == 9000:
        g = GATES[micro](rep)
        print("gates:", g, "PASS" if all(g) else "FAIL")
