"""Implicit per-droplet condensation/evaporation with per-cell substepping.

TPU-native equivalent of reference src/impl/condensation/ (percell path):
  - the backward-Euler wet-growth minfun combining Maxwell-Mason, kappa-Koehler
    activity, the Kelvin term, transition-regime beta(Kn) and Sh/Nu ventilation
    (cond_common.ipp:80-338),
  - the bracketed root solve (reference: TOMS-748 <=100 iters; here: the
    whole-population fixed-iteration Anderson-Bjoerck solver from ops/rootfind,
    one divergence-free instruction stream for every droplet),
  - the explicit-Euler fallback when the bracket has no sign change
    (cond_common.ipp:309-315) and the rw2 >= rd2 clamp (:318),
  - the per-cell theta/rv substepping loop (sstp_percell_step.ipp:7-49,
    particles_impl_cond.ipp:13-139) and latent-heat application
    (particles_impl_update_th_rv.ipp).

The whole substep loop is one `lax.fori_loop` whose body advances every
super-droplet at once — XLA fuses the minfun evaluations into a single
vectorized kernel over the population.
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..common import constants as c
from ..common import kappa_koehler, kelvin, maxwell_mason, mean_free_path
from ..common import theta_dry, transition_regime, ventil
from ..ops.rootfind import solve_bracketed
from . import hskpng
from .state import State, StaticConfig

# reference src/detail/config.hpp:181-205
COND_MLT = 2.0
ROOT_ITERS = 32


def drw2_dt(rw2, rd3, kpa, vt, rhod, rv, T, p, RH, eta, lambda_D, lambda_K,
            RH_max):
    """d(rw^2)/dt of a wet droplet (reference cond_common.ipp:122-163).

    = 2 * rdrdt(D_eff, K_eff, ...) with diffusivity/conductivity reduced by
    the transition-regime beta and enhanced by ventilation Sh/Nu."""
    rw = jnp.sqrt(rw2)
    rw3 = rw2 * rw

    Re = ventil.Re(vt, rw, rhod, eta)
    Sc = ventil.Sc(eta, rhod, c.D_0)
    Pr = ventil.Pr(eta, c.c_pd, c.K_0)

    D = c.D_0 * transition_regime.beta(lambda_D / rw) * (ventil.Sh(Sc, Re) / 2)
    K = c.K_0 * transition_regime.beta(lambda_K / rw) * (ventil.Nu(Pr, Re) / 2)

    return 2.0 * maxwell_mason.rdrdt(
        D, K, rhod * rv, T, p,
        jnp.minimum(RH, RH_max),
        kappa_koehler.a_w(rw3, rd3, kpa),
        kelvin.klvntrm(rw, T),
    )


def advance_rw2(dt, rw2_old, rd3, kpa, vt, rhod, rv, T, p, RH, eta,
                lambda_D, lambda_K, RH_max):
    """Backward-Euler advance of rw^2 over dt for the whole population
    (reference cond_common.ipp:187-338).

    Bracket [a, b] from a cond_mlt-scaled explicit guess; implicit root via
    fixed-iteration bracketing; explicit-Euler fallback when no sign change;
    clamped to the dry radius."""
    grow = partial(
        drw2_dt, rd3=rd3, kpa=kpa, vt=vt, rhod=rhod, rv=rv, T=T, p=p, RH=RH,
        eta=eta, lambda_D=lambda_D, lambda_K=lambda_K, RH_max=RH_max,
    )
    # guard dead/ice slots (rw2 <= 0 is skipped in the reference)
    alive = rw2_old > 0
    rw2_safe = jnp.where(alive, rw2_old, rd3 ** (2.0 / 3))

    drw2 = dt * grow(rw2_safe)
    rd2 = jnp.cbrt(rd3) ** 2

    a = jnp.maximum(rd2, rw2_safe + jnp.minimum(0.0, COND_MLT * drw2))
    b = rw2_safe + jnp.maximum(0.0, COND_MLT * drw2)

    minfun = lambda rw2: rw2_safe + dt * grow(rw2) - rw2
    # f(rw2_old) == drw2 by construction (cond_common.ipp:281-293)
    fa = jnp.where(drw2 > 0, drw2, minfun(a))
    fb = jnp.where(drw2 > 0, minfun(b), drw2)

    bracketed = (fa * fb <= 0) & (a < b) & (drw2 != 0)
    # implicit Euler where bracketed...
    rw2_root = solve_bracketed(
        minfun,
        jnp.where(bracketed, a, rw2_safe),
        jnp.where(bracketed, b, rw2_safe),
        iters=ROOT_ITERS,
    )
    # ...explicit Euler fallback otherwise (cond_common.ipp:309)
    rw2_new = jnp.where(bracketed, rw2_root, rw2_safe + drw2)
    rw2_new = jnp.maximum(rw2_new, rd2)  # no evaporation below dry size
    return jnp.where(alive & (drw2 != 0), rw2_new, rw2_old)


def _specific_mom3(cfg: StaticConfig, state: State):
    """Specific 3rd wet moment per cell (particles_impl_cond.ipp:105-135)."""
    rw3 = state.rw2 * jnp.sqrt(jnp.maximum(state.rw2, 0.0))
    return hskpng.segment_moment(
        cfg, state.n, rw3, 1.0, state.ijk,
        dv=state.dv, rhod=state.rhod, specific=True,
    )


def cond_percell(cfg: StaticConfig, state: State, dt, RH_max,
                 turb_cond: bool = False) -> State:
    """The per-cell substepped condensation phase of step_cond
    (reference particles_step.ipp:237-256).

    th/rv advance from their pre-sync values in sstp_cond equal increments of
    the host-model (advective) delta, interleaved with implicit droplet growth
    and per-cell latent heating."""
    sstp = cfg.sstp_cond
    dt_sub = dt / sstp

    # the advective (host-model) delta accumulated since the last sstp_save
    # (sstp_percell_step.ipp:21-47): rewind th/rv to their pre-sync values,
    # then feed the delta back in sstp equal increments interleaved with
    # condensation.  For sstp == 1 one increment applies the whole delta,
    # reproducing the reference's early-return path.
    delta_th = state.th - state.sstp_tmp_th
    delta_rv = state.rv - state.sstp_tmp_rv
    state = dataclasses.replace(
        state, th=state.sstp_tmp_th, rv=state.sstp_tmp_rv
    )

    lambda_D, lambda_K = hskpng.hskpng_mfp(state.T, state.p)

    def substep(_, st):
        st = dataclasses.replace(
            st, th=st.th + delta_th / sstp, rv=st.rv + delta_rv / sstp
        )
        if turb_cond:
            # SGS supersaturation perturbation accumulates each substep and
            # adds to the ambient RH seen by each SD
            # (reference apply_perparticle_sgs_supersat.ipp + cond.ipp:62-86)
            from . import turbulence as turb_mod
            st = turb_mod.apply_sgs_supersat(st, dt_sub)
        st = hskpng.hskpng_Tpr(cfg, st)

        mom3_before = _specific_mom3(cfg, st)
        g = lambda arr: arr[st.ijk]  # cell -> SD gather
        RH_sd = g(st.RH) + (st.ssp if turb_cond else 0.0)
        rw2_new = advance_rw2(
            dt_sub, st.rw2, st.rd3, st.kpa, st.vt,
            g(st.rhod), g(st.rv), g(st.T), g(st.p), RH_sd, g(st.eta),
            g(lambda_D), g(lambda_K), RH_max,
        )
        st = dataclasses.replace(st, rw2=rw2_new)
        mom3_after = _specific_mom3(cfg, st)

        # latent heating per cell (particles_impl_update_th_rv.ipp:90-180)
        drv = (mom3_after - mom3_before) * (4.0 / 3) * c.pi * c.rho_w
        rv_new = st.rv - drv
        th_new = st.th - drv * theta_dry.d_th_d_rv(st.T, st.th)
        return dataclasses.replace(st, th=th_new, rv=rv_new)

    return jax.lax.fori_loop(0, sstp, substep, state)


def sstp_save(state: State) -> State:
    """Snapshot rv/th/rhod for the next substepping cycle
    (reference sstp_save.ipp:7-35, percell variant)."""
    return dataclasses.replace(
        state,
        sstp_tmp_th=state.th,
        sstp_tmp_rv=state.rv,
        sstp_tmp_rh=state.rhod,
    )
