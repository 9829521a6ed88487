"""Pallas condensation kernel == plain XLA path (interpret mode on CPU).

The Pallas wrapper runs the very same `_advance_rw2_core` jnp code, so any
difference would come from the blocking/padding plumbing — that is what this
test pins down, on physically representative droplet populations
(reference physics: cond_common.ipp:187-338)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libcloudphxx_tpu.common import vterm as common_vterm
from libcloudphxx_tpu.lgrngn.condensation import _advance_rw2_core
from libcloudphxx_tpu.ops.pallas_cond import advance_rw2_pallas


def _population(n, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    rd = rng.uniform(0.01e-6, 0.5e-6, n)  # dry radii
    rd3 = rd ** 3
    rw = rd * rng.uniform(1.1, 30.0, n)   # wet radii across haze..droplet
    rw2 = rw ** 2
    # a few dead slots (rw2 = 0) exercise the masking
    rw2[:: max(n // 7, 1)] = 0.0
    T = rng.uniform(270.0, 300.0, n)
    p = rng.uniform(7e4, 1.02e5, n)
    args = dict(
        rw2=rw2,
        rd3=rd3,
        kpa=rng.uniform(0.1, 1.2, n),
        vt=rng.uniform(0.0, 2.0, n),
        rhod=rng.uniform(0.9, 1.2, n),
        rv=rng.uniform(5e-3, 1.5e-2, n),
        T=T,
        p=p,
        RH=rng.uniform(0.7, 1.05, n),
        eta=np.asarray(common_vterm.visc(jnp.asarray(T))),
        lam_D=rng.uniform(5e-8, 2e-7, n),
        lam_K=rng.uniform(5e-8, 2e-7, n),
    )
    return {k: jnp.asarray(v, dtype) for k, v in args.items()}


@pytest.mark.parametrize("n", [100, 1024, 5000])
def test_pallas_matches_xla(n):
    a = _population(n)
    dt = 0.1
    ref = _advance_rw2_core(dt, *a.values(), 44.0)
    out = advance_rw2_pallas(
        _advance_rw2_core, dt, *a.values(), 44.0,
        block_rows=8, interpret=True,
    )
    assert out.shape == ref.shape and out.dtype == ref.dtype
    # 2-D blocked layout changes XLA fusion order -> f32 FMA noise only
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=0.0)


def test_pallas_f64_interpret():
    # the f64 parity path never uses pallas in production, but interpret
    # mode must still agree to f64 precision (same jnp ops)
    a = _population(513, seed=3, dtype=jnp.float64)
    ref = _advance_rw2_core(1.0, *a.values(), 44.0)
    out = advance_rw2_pallas(
        _advance_rw2_core, 1.0, *a.values(), 44.0,
        block_rows=8, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=0.0)


def test_dispatch_forced(monkeypatch):
    # LIBCLOUD_PALLAS=0 must force the plain path regardless of backend
    import libcloudphxx_tpu.lgrngn.condensation as cond

    monkeypatch.setenv("LIBCLOUD_PALLAS", "0")
    x = jnp.ones((10,), jnp.float32)
    assert not cond._pallas_wanted(x)
    monkeypatch.setenv("LIBCLOUD_PALLAS", "1")
    assert cond._pallas_wanted(x)
    # f64 never takes the pallas path (TPU has no native f64 VPU)
    assert not cond._pallas_wanted(jnp.ones((10,), jnp.float64))
