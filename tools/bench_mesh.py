"""Step-time overhead of the 8-virtual-device mesh vs the serial backend.

No multi-chip hardware is available, so this bounds the COLLECTIVE +
shard_map overhead on a virtual CPU mesh: the same public-API workload runs
on the serial backend and on particles_multi_t over 8 host devices; the
per-step wall-clock ratio is the (pessimistic, CPU-virtualised) cost of the
halo exchanges, migration ppermutes and diag reductions.  Writes one JSON
line.
"""

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libcloudphxx_tpu import lgrngn  # noqa: E402

NX, NZ = 64, 32
SD = 16
STEPS = 20


def build(dev_count):
    def lognormal(lnr):
        return (60e6 * np.exp(-(lnr - np.log(0.02e-6)) ** 2
                              / 2 / np.log(1.4) ** 2)
                / np.log(1.4) / np.sqrt(2 * np.pi))
    oi = lgrngn.opts_init_t()
    oi.nx, oi.nz = NX, NZ
    oi.dx = oi.dz = 20.0
    oi.x1, oi.z1 = NX * 20.0, NZ * 20.0
    oi.dt = 1.0
    oi.sd_conc = SD
    oi.n_sd_max = NX * NZ * SD * 2
    oi.dry_distros = {(0.61, 0.0): lognormal}
    oi.terminal_velocity = lgrngn.vt_t.beard77fast
    oi.kernel = lgrngn.kernel_t.geometric
    oi.sstp_cond = 2
    oi.sstp_coal = 2
    oi.dev_count = dev_count
    backend = (lgrngn.backend_t.multi_CUDA if dev_count > 1
               else lgrngn.backend_t.serial)
    prt = lgrngn.factory(backend, oi)
    th = np.full((NX, NZ), 289.0)
    rv = np.full((NX, NZ), 7.5e-3)
    rhod = np.full((NX, NZ), 1.12)
    Cx = 0.3 * np.ones((NX + 1, NZ))
    Cz = 0.05 * np.ones((NX, NZ + 1))
    prt.init(th.copy(), rv.copy(), rhod, Cx=Cx, Cz=Cz)
    return prt, th, rv


def time_steps(prt, th, rv):
    opts = lgrngn.opts_t()
    opts.coal = True
    # warm the compiles
    prt.step_sync(opts, th, rv)
    prt.step_async(opts)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        prt.step_sync(opts, th, rv)
        prt.step_async(opts)
    return (time.perf_counter() - t0) / STEPS


def main():
    prt_s, th_s, rv_s = build(1)
    t_serial = time_steps(prt_s, th_s, rv_s)
    prt_m, th_m, rv_m = build(8)
    t_mesh = time_steps(prt_m, th_m, rv_m)
    print(f"# serial {t_serial*1e3:.1f} ms/step, 8-vdev mesh "
          f"{t_mesh*1e3:.1f} ms/step", file=sys.stderr)
    print(json.dumps({
        "metric": "8-virtual-device mesh step-time ratio vs serial "
                  f"(kinematic {NX}x{NZ} sd_conc={SD}, CPU)",
        "serial_ms_per_step": round(t_serial * 1e3, 2),
        "mesh_ms_per_step": round(t_mesh * 1e3, 2),
        "ratio": round(t_mesh / t_serial, 3),
    }))


if __name__ == "__main__":
    main()
