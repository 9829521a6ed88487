"""Sweep MPDATA formulation variants against the blk_2m fig_a golden gate.

The last open golden-parity residual (test_golden_parity_blk xfail) is
attributed to a libmpdata++ MPDATA discretisation detail; this tool runs
the full 9000-step blk_2m case per variant and prints the t=9000 errors
vs the reference refdata, so the matching formulation can be picked
empirically (libmpdata++ sources and the GMD-2015 paper are not in the
image).

Usage: python tools/mpdata_variant_sweep.py [micro]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402


def main():
    micro = sys.argv[1] if len(sys.argv) > 1 else "blk_2m"
    import golden_parity_blk as G
    variants = [
        {},                                            # current defaults
        {"LIBCLOUD_MPDATA_FCT_EXTREMA": "star"},
        {"LIBCLOUD_MPDATA_ZHALO": "linear"},
    ]
    knobs = ("LIBCLOUD_MPDATA_FRAC", "LIBCLOUD_MPDATA_WALL",
             "LIBCLOUD_MPDATA_FCT_EXTREMA", "LIBCLOUD_MPDATA_ZHALO")
    for env in variants:
        for k in knobs:
            os.environ.pop(k, None)
        os.environ.update(env)
        jax.clear_caches()  # the env knobs are trace-time, not jit keys
        snaps = G.run_blk(micro, verbose=False)
        rep = G.compare(micro, snaps)
        r = rep[9000]
        line = " ".join(
            f"{k}:abs={v['max_abs']:.3e}" for k, v in r.items())
        tag = ",".join(f"{k.split('_')[-1]}={v}"
                       for k, v in env.items()) or "default"
        print(f"{tag:20s}  {line}", flush=True)
    # iteration-count sensitivity diagnostic (default knobs restored —
    # the variants loop above leaves its last env set otherwise)
    for k in knobs:
        os.environ.pop(k, None)
    for n_it in (2, 3):
        jax.clear_caches()
        import libcloudphxx_tpu.models.kinematic_2d as K
        from libcloudphxx_tpu.models.kinematic_2d import Kinematic2D
        model = Kinematic2D(nx=76, nz=76, micro=micro, grid="node",
                            fct=True, mpdata_iters=n_it)
        model.ante_loop()
        model.run_device(9000, spinup=7200)
        import numpy as np
        ref = G.load_ref(micro, 9000)
        rc = np.abs(np.float32(model.rc) - ref["rc"]).max()
        nc = np.abs(np.float32(model.nc) - ref["nc"]).max()
        print(f"n_iters={n_it}          rc:abs={rc:.3e} nc:abs={nc:.3e}",
              flush=True)


if __name__ == "__main__":
    main()
