"""Probe which per-element gather forms Mosaic lowers on this TPU.

The tabulated collision-efficiency kernels need table[i, j] per SD pair
inside the resident kernel; Mosaic historically had no lane-dynamic
gather.  Each variant is tried in its own subprocess-safe try/except so
one SIGABRT-free failure doesn't kill the report (hard crashes do — run
variants individually via argv if needed).

Usage: python tools/probe_gather.py [variant ...]
"""

import functools
import os
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.libcloudphxx_tpu_jax_cache"))

R, C = 16, 128
TBL_ROWS, TBL_COLS = 8, 128  # small lookup table resident in VMEM


def run(name, kern, tbl_shape=(TBL_ROWS, TBL_COLS)):
    import numpy as np
    tbl = jnp.arange(tbl_shape[0] * tbl_shape[1],
                     dtype=jnp.float32).reshape(tbl_shape)
    idx = jnp.asarray(
        np.random.default_rng(0).integers(
            0, tbl_shape[0] * tbl_shape[1], size=(R, C)), jnp.int32)
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tbl, idx)
        ref = tbl.reshape(-1)[idx.reshape(-1)].reshape(R, C)
        ok = bool(jnp.all(out == ref))
        print(f"{name}: LOWERED, correct={ok}")
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAILED ({type(e).__name__}: {msg})")


def k_take_flat(tbl_ref, idx_ref, out_ref):
    flat = tbl_ref[:].reshape(-1)
    out_ref[:] = jnp.take(flat, idx_ref[:], axis=0)


def k_take_along_rows(tbl_ref, idx_ref, out_ref):
    # gather along lanes: row r of out takes tbl[r % TBL_ROWS, idx]
    tbl = tbl_ref[:]
    idx = idx_ref[:] % TBL_COLS
    rows = jnp.broadcast_to(tbl[:1, :], idx.shape)
    out_ref[:] = jnp.take_along_axis(
        jnp.broadcast_to(tbl[:1, :], idx.shape), idx, axis=1)


def k_dynamic_gather(tbl_ref, idx_ref, out_ref):
    # newer pltpu primitive, if present
    out_ref[:] = pltpu.dynamic_gather(
        jnp.broadcast_to(tbl_ref[:][:1, :], idx_ref.shape),
        idx_ref[:] % TBL_COLS, axis=1)


def k_onehot_mxu(tbl_ref, idx_ref, out_ref):
    # one-hot matmul over the 128-wide lane axis: out[r, c] =
    # sum_k onehot[r*?]... simple per-lane gather of one table row
    tbl = tbl_ref[:]              # (8, 128)
    idx = idx_ref[:] % TBL_COLS   # (R, C)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    acc = jnp.zeros((R, C), jnp.float32)
    row0 = tbl[:1, :]
    # rotate-and-select gather: 128 static rolls (the fallback everyone
    # uses; cost baseline for comparison)
    for s in range(TBL_COLS):
        acc = acc + jnp.where(idx == ((lane + s) % TBL_COLS),
                              pltpu.roll(jnp.broadcast_to(row0, (R, C)),
                                         shift=s, axis=1), 0.0)
    out_ref[:] = acc


VARIANTS = {
    "take_flat": k_take_flat,
    "take_along_axis": k_take_along_rows,
    "dynamic_gather": k_dynamic_gather,
    "roll_select": k_onehot_mxu,
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    for nm in names:
        run(nm, VARIANTS[nm])
