"""1000-step dtype-drift study on the kinematic lgrngn case.

BASELINE.md's north-star accuracy line is "allclose after 1000 steps".  Two
runs of the SAME code at f64 and f32 bound the irreducible dtype drift of
the chaotic SDM system (identical RNG draws; the only difference is
rounding).  Writes DRIFT_1000_r03.json.

Usage: python tools/drift_1000step.py [f32|f64] [nx] [nt]
(run twice, then tools/drift_1000step.py report)
"""
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

mode = sys.argv[1] if len(sys.argv) > 1 else "f64"
NX = NZ = int(sys.argv[2]) if len(sys.argv) > 2 else 48
NT = int(sys.argv[3]) if len(sys.argv) > 3 else 1000

if mode == "report":
    import numpy as np
    a = np.load("/tmp/drift_f64.npz")
    b = np.load("/tmp/drift_f32.npz")
    rep = {}
    for k in a.files:
        x, y = np.float64(a[k]), np.float64(b[k])
        d = np.abs(x - y)
        rep[k] = {"max_abs": float(d.max()),
                  "max_rel": float((d / np.maximum(np.abs(x), 1e-30)).max()),
                  "rms_rel": float(np.sqrt(np.mean(
                      (d / np.maximum(np.abs(x), 1e-30)) ** 2)))}
        print(k, rep[k])
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "DRIFT_1000_r03.json"), "w") as f:
        json.dump({"nx": NX, "nt": NT, "comparison": "f64 vs f32, same "
                   "code, same RNG seeds, CPU", "fields": rep}, f, indent=1)
    sys.exit(0)

jax.config.update("jax_enable_x64", mode == "f64")
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from libcloudphxx_tpu.models.kinematic_2d import Kinematic2D

model = Kinematic2D(nx=NX, nz=NZ, micro="lgrngn", sd_conc=32,
                    sstp_cond=5, sstp_coal=5, n_sd_max=NX * NZ * 32,
                    grid="node", fct=True)
model.run_device_lgrngn(NT, spinup=min(NT, 800))
p = model.prtcls
p.diag_all(); p.diag_sd_conc()
sd = p.outbuf().copy()
p.diag_all(); p.diag_wet_mom(3)
m3 = p.outbuf().copy()
np.savez(f"/tmp/drift_{mode}.npz", th=model.th, rv=model.rv,
         sd_conc=sd, wet_mom3=m3)
print(f"{mode} done", flush=True)
