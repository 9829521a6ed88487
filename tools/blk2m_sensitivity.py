"""blk_2m rc-gate residual attribution: trajectory-divergence ensemble.

The one remaining fig_a xfail is blk_2m rc at t=9000: |d rc| ~ 8e-6 vs the
4.5e-6 h5diff gate.  r3/r4 established the microphysics is element-exact vs
the reference's own compiled formula chain (tests/test_solver_oracle.py) and
the coupling matches the reference coupler line-by-line; a formulation sweep
(tools/mpdata_variant_sweep.py) found no variant that improves rc.  The
libmpdata++ source and the GMD-2015 paper are unavailable in this
environment, so the remaining closure path (VERDICT r4 item 7) is to BOUND
the residual: if ulp-scale perturbations of the initial state diverge by
O(gate) after 9000 steps of the nonlinear advection+microphysics system,
the gate distance is trajectory noise, reachable only by bitwise-identical
arithmetic (i.e. the reference binary itself).

Runs an ensemble of blk_2m fig_a cases whose initial rv differs by relative
~1e-12..1e-9 noise, and reports the pairwise rc/rr/th spread at t=9000 next
to each member's distance from the refdata.

Usage: python tools/blk2m_sensitivity.py [n_members] [rel_amp]
"""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

sys.path.insert(0, ".")
from libcloudphxx_tpu.models.kinematic_2d import Kinematic2D  # noqa: E402

sys.path.insert(0, "tools")
import golden_parity_blk as gp  # noqa: E402


def run_member(seed, rel_amp, nt=9000, spinup=7200):
    model = Kinematic2D(nx=76, nz=76, micro="blk_2m", grid="node", fct=True)
    model.ante_loop()
    if seed is not None:
        rng = np.random.default_rng(seed)
        model.rv = model.rv * (1.0 + rel_amp * rng.standard_normal(
            model.rv.shape))
    model.run_device(nt, spinup=spinup)
    return {k: np.float64(getattr(model, k)).copy()
            for k in ("th", "rv", "rc", "rr", "nc", "nr")}


def main():
    n_members = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    rel_amp = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-12

    ref = gp.load_ref("blk_2m", 9000)
    members = []
    for m in range(n_members):
        seed = None if m == 0 else m
        fields = run_member(seed, rel_amp)
        vs_ref = {k: float(np.abs(np.float32(fields[k]) - ref[k]).max())
                  for k in ("rc", "rr", "th")}
        print(f"# member {m} (seed={seed}): vs refdata {vs_ref}",
              flush=True)
        members.append(fields)

    pair = {}
    for k in ("rc", "rr", "th"):
        diffs = [float(np.abs(members[i][k] - members[j][k]).max())
                 for i in range(n_members) for j in range(i)]
        pair[k] = {"max": max(diffs), "min": min(diffs), "all": diffs}
    out = {
        "rel_amp": rel_amp,
        "n_members": n_members,
        "pairwise_max_abs_t9000": {k: v["max"] for k, v in pair.items()},
        "pairwise_all": pair,
        "gate_rc": 4.5e-6,
        "residual_rc_vs_ref": float(
            np.abs(np.float32(members[0]["rc"]) - ref["rc"]).max()),
    }
    print(json.dumps(out, indent=1))
    with open("BLK2M_SENSITIVITY.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
