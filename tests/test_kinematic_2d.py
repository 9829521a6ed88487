"""End-to-end kinematic_2D model tests (reduced-size).

Mirrors the reference's fig_a acceptance strategy
(models/kinematic_2D/tests/paper_GMD_2015/): run the ICMW8 case small and
check physical invariants + cross-scheme consistency; the three schemes are
independent implementations, so their agreement on the bulk thermodynamic
state is a strong oracle.
"""

import numpy as np
import pytest

from libcloudphxx_tpu.models import Kinematic2D, Setup
from libcloudphxx_tpu.models import mpdata
import jax.numpy as jnp


def test_mpdata_conservation_and_positivity():
    # G-weighted tracer mass is conserved exactly; MPDATA keeps the field
    # positive-definite and bounded-ish
    m = Kinematic2D(nx=24, nz=24, micro="blk_1m")
    psi0 = np.zeros((24, 24))
    psi0[6:12, 6:12] = 1.0
    psi = jnp.asarray(psi0)
    mass0 = float(jnp.sum(psi * m.G))
    for _ in range(100):
        psi = mpdata.advect(psi, m.gc_x, m.gc_z, m.G)
    assert float(jnp.sum(psi * m.G)) == pytest.approx(mass0, rel=1e-12)
    assert float(jnp.min(psi)) > -1e-10
    assert float(jnp.max(psi)) < 1.5


def test_gc_divergence_free():
    m = Kinematic2D(nx=24, nz=24, micro="blk_1m")
    gx = np.asarray(m.gc_x)
    gz = np.asarray(m.gc_z)
    div = (gx[1:] - gx[:-1]) + (gz[:, 1:] - gz[:, :-1])
    assert np.abs(div).max() < 1e-12
    # no flux through the top/bottom walls (up to sin(pi) rounding)
    assert np.abs(gz[:, 0]).max() < 1e-15
    assert np.abs(gz[:, -1]).max() < 1e-15


@pytest.mark.slow
def test_cross_scheme_thermodynamic_agreement():
    # 24x24, 30 steps: the three schemes must agree on the bulk state
    out = {}
    for micro in ("blk_1m", "blk_2m", "lgrngn"):
        kw = dict(sd_conc=16, sstp_cond=2, sstp_coal=1) \
            if micro == "lgrngn" else {}
        m = Kinematic2D(nx=24, nz=24, micro=micro, **kw)
        m.run(30, spinup=30)
        out[micro] = (m.th.copy(), m.rv.copy())
        assert np.isfinite(m.th).all() and np.isfinite(m.rv).all()
        assert m.rv.min() >= 0

    for a in ("blk_1m", "blk_2m"):
        th_a, rv_a = out[a]
        th_l, rv_l = out["lgrngn"]
        # mean-state agreement between independent schemes
        assert abs(th_a.mean() - th_l.mean()) < 0.5
        assert abs(rv_a.mean() - rv_l.mean()) < 5e-4


@pytest.mark.slow
def test_lgrngn_sd_count_preserved_during_spinup():
    m = Kinematic2D(nx=16, nz=16, micro="lgrngn", sd_conc=16)
    m.run(5, spinup=5)  # no sedi/coal during spinup
    sd = m.diag_lgrngn("sd_conc")
    assert sd.sum() == 16 * 16 * 16
    rc = m.diag_lgrngn("rc")
    assert np.isfinite(rc).all()


def test_lgrngn_chem_model_variant():
    """The chemistry-coupled kinematic model (reference
    kin_cloud_2d_lgrngn_chem.hpp): six advected trace gases feed Henry
    dissolution; SO2 oxidises to S_VI in cloud water."""
    import numpy as np

    from libcloudphxx_tpu.common import chem as chem_mod
    from libcloudphxx_tpu.models import Kinematic2D

    model = Kinematic2D(nx=10, nz=10, micro="lgrngn_chem", sd_conc=16,
                        n_sd_max=10 * 10 * 16, grid="node", fct=True)
    cs = chem_mod.chem_species_t
    so2_0 = model.chem_gases[cs.SO2].copy()
    assert so2_0.min() > 0
    model.run(4, spinup=2)
    # SO2 dissolves into supersaturated cells (gas field depleted somewhere)
    assert np.isfinite(model.chem_gases[cs.SO2]).all()
    assert model.chem_gases[cs.SO2].min() < so2_0.max()
    # dissolved sulfate appears (S_VI via oxidation after spinup)
    p = model.prtcls
    p.diag_all()
    p.diag_chem(cs.SO2)
    s4 = p.outbuf()
    assert np.isfinite(s4).all()
    p.diag_chem(cs.S_VI)
    s6 = p.outbuf()
    assert np.isfinite(s6).all()
    assert s6.max() > 0
