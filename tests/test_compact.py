"""stable_partition_rows: the shift-stage compaction that replaces the
bitonic sorts in the re-binning family (ops/pallas_compact).

Gates: exact stable partition vs a numpy oracle at power-of-two AND
non-power-of-two widths (the bitonic network silently mis-sorts at the
latter — PERF_r04.md), both as plain XLA and inside a Pallas kernel in
interpret mode (the form the resident step uses).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libcloudphxx_tpu.ops.pallas_compact import stable_partition_rows


def _oracle(front, vals):
    out = np.empty_like(vals)
    for r in range(vals.shape[0]):
        m = front[r] > 0
        out[r] = np.concatenate([vals[r][m], vals[r][~m]])
    return out


@pytest.mark.parametrize("L", [8, 128, 96, 136, 256])
def test_partition_matches_oracle(L):
    rng = np.random.default_rng(3)
    rows = 16
    front = rng.integers(0, 2, size=(rows, L)).astype(np.int32)
    a = rng.normal(size=(rows, L)).astype(np.float32)
    b = rng.normal(size=(rows, L)).astype(np.float32)
    (oa, ob), nf = jax.jit(
        lambda f, x, y: stable_partition_rows(f, (x, y))
    )(jnp.asarray(front), jnp.asarray(a), jnp.asarray(b))
    assert np.array_equal(np.asarray(oa), _oracle(front, a))
    assert np.array_equal(np.asarray(ob), _oracle(front, b))
    assert np.array_equal(np.asarray(nf)[:, 0], front.sum(axis=1))


@pytest.mark.parametrize("L", [128, 96])
def test_partition_all_or_none(L):
    rows = 4
    vals = np.arange(rows * L, dtype=np.float32).reshape(rows, L)
    for fill in (0, 1):
        front = np.full((rows, L), fill, np.int32)
        (out,), nf = stable_partition_rows(
            jnp.asarray(front), (jnp.asarray(vals),))
        assert np.array_equal(np.asarray(out), vals)
        assert np.all(np.asarray(nf) == fill * L)


def test_partition_in_pallas_interpret():
    rng = np.random.default_rng(11)
    rows, L = 16, 128
    front = rng.integers(0, 2, size=(rows, L)).astype(np.float32)
    a = rng.normal(size=(rows, L)).astype(np.float32)

    def kern(f_ref, a_ref, out_ref):
        (o,), _ = stable_partition_rows(f_ref[:] > 0, (a_ref[:],))
        out_ref[:] = o

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((rows, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=True,
    )(jnp.asarray(front), jnp.asarray(a))
    assert np.array_equal(np.asarray(out), _oracle(front, a))
