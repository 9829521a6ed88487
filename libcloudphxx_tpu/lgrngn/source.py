"""Aerosol sources: creation of new super-droplets during the simulation.

TPU-native equivalent of reference src/impl/sources_and_relaxation_of_SDs/
(src_dry_distros_simple.ipp, src_dry_distros_matching.ipp, src_dry_sizes.ipp,
src.ipp).  Source injection happens once every ``supstp_src`` steps, so it
runs host-side (numpy sampling, like init) and lands in the fixed-capacity
state arrays through dead slots — the same architecture as the reference,
where source SDs append to the resized device vectors.

Source distributions represent particles created *per unit time* @ STP
(opts.src_dry_distros = {(kappa, rd_insol): (fun, src_sd_conc, supstp)});
the effective dt is supstp * dt.
"""

import dataclasses
import math

import jax.numpy as jnp
import numpy as np

from ..common import constants as c
from . import init as init_mod
from .state import State, StaticConfig


def _box_cells(cfg: StaticConfig, oi):
    """Cells inside the source box, rounded to cell boundaries
    (reference opts_init.hpp:156-158)."""
    i0 = int(np.floor(oi.src_x0 / cfg.dx))
    i1 = max(i0 + 1, int(np.ceil(oi.src_x1 / cfg.dx)))
    if cfg.n_dims > 1:
        k0 = int(np.floor(oi.src_z0 / cfg.dz))
        k1 = max(k0 + 1, int(np.ceil(oi.src_z1 / cfg.dz)))
    else:
        k0, k1 = 0, 1
    cells = []
    nz = max(1, cfg.nz)
    for i in range(i0, min(i1, cfg.nx)):
        for k in range(k0, min(k1, nz)):
            cells.append(i * nz + k)
    return np.asarray(cells, dtype=np.int64)


def _inject(state: State, new, rng, cfg: StaticConfig):
    """Place new SDs (dict of host arrays) into dead slots."""
    n_new = new["n"].size
    if n_new == 0:
        return state, 0
    n_host = np.asarray(state.n)
    dead = np.nonzero(n_host <= 0)[0]
    if dead.size < n_new:
        raise RuntimeError(
            f"lgrngn source: {n_new} new SDs but only {dead.size} free slots "
            f"(n_sd_max too small)"
        )
    slots = dead[:n_new]
    updates = {}
    for name, vals in new.items():
        arr = getattr(state, name)
        updates[name] = arr.at[jnp.asarray(slots)].set(
            jnp.asarray(vals, arr.dtype)
        )
    return dataclasses.replace(state, **updates), n_new


def _positions_in_cells(cfg: StaticConfig, cells, rng):
    nz = max(1, cfg.nz)
    i = cells // nz
    k = cells % nz
    x = (i + rng.random(cells.size)) * cfg.dx
    z = (k + rng.random(cells.size)) * cfg.dz if cfg.n_dims > 1 \
        else np.zeros(cells.size)
    return x, z


def _equilibrium_rw2(state: State, cells, rd3, kappa, RH_max):
    """Wet equilibrium at the target cell's current conditions
    (reference src uses init_wet on the appended SDs)."""
    from ..common import kappa_koehler
    RH = np.minimum(np.asarray(state.RH)[cells], RH_max)
    T = np.asarray(state.T)[cells]
    rw3 = kappa_koehler.rw3_eq(
        jnp.asarray(rd3), jnp.full(rd3.shape, kappa),
        jnp.asarray(RH), jnp.asarray(T),
    )
    return np.asarray(rw3) ** (2.0 / 3)


def src_simple_distros(cfg: StaticConfig, oi, state: State,
                       src_dry_distros, dt, rng, RH_max):
    """'simple' source: fresh SDs sampled from the per-time distribution
    (reference src_dry_distros_simple.ipp:20-90)."""
    cells = _box_cells(cfg, oi)
    rhod_host = np.asarray(state.rhod)
    total = 0
    for key, (fun, src_sd_conc, supstp) in src_dry_distros.items():
        kappa = key[0] if isinstance(key, tuple) else key
        dt_eff = supstp * dt
        cell_vol = cfg.dx * cfg.dy * cfg.dz if cfg.n_dims > 0 \
            else 1.0 / float(rhod_host[0])
        log_lo, log_hi, mult = init_mod._dist_analysis_sd_conc(
            fun, src_sd_conc, cell_vol * dt_eff
        )
        count = int(src_sd_conc)
        u01 = rng.random((cells.size, count))
        strata = (np.arange(count)[None, :] + u01) / count
        lnrd = log_lo + strata * (log_hi - log_lo)
        n_of = init_mod._eval_distro(fun, lnrd) * mult
        if not oi.aerosol_independent_of_rhod:
            n_of *= rhod_host[cells][:, None] / c.rho_stp
        multiplicity = np.floor(n_of + 0.5)

        cell_rep = np.repeat(cells, count)
        keep = multiplicity.ravel() > 0
        cell_rep = cell_rep[keep]
        lnrd_f = lnrd.ravel()[keep]
        mult_f = multiplicity.ravel()[keep]
        x, z = _positions_in_cells(cfg, cell_rep, rng)
        rd3 = np.exp(3.0 * lnrd_f)
        rw2 = _equilibrium_rw2(state, cell_rep, rd3, kappa, RH_max)
        new = dict(
            n=mult_f, rd3=rd3, rw2=rw2,
            kpa=np.full(mult_f.size, kappa),
            x=x, z=z, y=np.zeros(mult_f.size),
            vt=np.zeros(mult_f.size),
            ijk=cell_rep.astype(np.int32),
        )
        state, added = _inject(state, new, rng, cfg)
        total += added
    return state, total


def src_matching_distros(cfg: StaticConfig, oi, state: State,
                         src_dry_distros, dt, rng, RH_max):
    """'matching' source: boost multiplicities of existing SDs whose dry
    radius matches a source bin; create SDs only for unmatched bins
    (reference src_dry_distros_matching.ipp, simplified to
    closest-in-bin matching)."""
    cells = _box_cells(cfg, oi)
    rhod_host = np.asarray(state.rhod)
    n_host = np.array(np.asarray(state.n))
    rd3_host = np.asarray(state.rd3)
    kpa_host = np.asarray(state.kpa)
    ijk_host = np.asarray(state.ijk)
    total_created = 0
    mult_updates = np.zeros_like(n_host)

    for key, (fun, src_sd_conc, supstp) in src_dry_distros.items():
        kappa = key[0] if isinstance(key, tuple) else key
        dt_eff = supstp * dt
        cell_vol = cfg.dx * cfg.dy * cfg.dz if cfg.n_dims > 0 \
            else 1.0 / float(rhod_host[0])
        log_lo, log_hi, mult = init_mod._dist_analysis_sd_conc(
            fun, src_sd_conc, cell_vol * dt_eff
        )
        nbins = int(src_sd_conc)
        edges = np.linspace(log_lo, log_hi, nbins + 1)
        mids = 0.5 * (edges[:-1] + edges[1:])
        n_per_bin_stp = init_mod._eval_distro(fun, mids) * mult

        new_lists = {k: [] for k in
                     ("n", "rd3", "rw2_cell", "kpa", "cell")}
        for cell in cells:
            factor = (1.0 if oi.aerosol_independent_of_rhod
                      else rhod_host[cell] / c.rho_stp)
            target = np.floor(n_per_bin_stp * factor + 0.5)
            # existing SDs of this kappa in this cell
            here = np.nonzero(
                (ijk_host == cell) & (n_host > 0)
                & (np.abs(kpa_host - kappa) < 1e-12)
            )[0]
            lnrd_here = np.log(np.maximum(rd3_host[here], 1e-300)) / 3.0
            bin_of = np.searchsorted(edges, lnrd_here) - 1
            for b in range(nbins):
                if target[b] <= 0:
                    continue
                in_bin = here[bin_of == b]
                if in_bin.size:
                    # boost the closest-in-radius existing SD
                    j = in_bin[np.argmin(np.abs(lnrd_here[bin_of == b]
                                                - mids[b]))]
                    mult_updates[j] += target[b]
                else:
                    new_lists["n"].append(target[b])
                    new_lists["rd3"].append(math.exp(3.0 * mids[b]))
                    new_lists["kpa"].append(kappa)
                    new_lists["cell"].append(cell)

        if new_lists["n"]:
            cell_rep = np.asarray(new_lists["cell"], dtype=np.int64)
            rd3 = np.asarray(new_lists["rd3"])
            x, z = _positions_in_cells(cfg, cell_rep, rng)
            rw2 = _equilibrium_rw2(state, cell_rep, rd3, kappa, RH_max)
            new = dict(
                n=np.asarray(new_lists["n"]), rd3=rd3, rw2=rw2,
                kpa=np.asarray(new_lists["kpa"]),
                x=x, z=z, y=np.zeros(rd3.size),
                vt=np.zeros(rd3.size),
                ijk=cell_rep.astype(np.int32),
            )
            state, added = _inject(state, new, rng, cfg)
            total_created += added

    if mult_updates.any():
        state = dataclasses.replace(
            state, n=state.n + jnp.asarray(mult_updates, state.n.dtype)
        )
    return state, total_created


def src_dry_sizes(cfg: StaticConfig, oi, state: State, src_sizes, dt, rng,
                  RH_max):
    """Size-pair source: {(kappa, rd_insol): {radius: (conc_per_s, sd_count,
    supstp)}} (reference src_dry_sizes.ipp)."""
    cells = _box_cells(cfg, oi)
    rhod_host = np.asarray(state.rhod)
    total = 0
    for key, sizes in src_sizes.items():
        kappa = key[0] if isinstance(key, tuple) else key
        for radius, spec in sizes.items():
            conc_per_s, sd_count, supstp = spec
            sd_count = int(sd_count)
            dt_eff = supstp * dt
            for cell in cells:
                dv = cfg.dx * cfg.dy * cfg.dz if cfg.n_dims > 0 \
                    else 1.0 / float(rhod_host[cell])
                number = conc_per_s * dt_eff * dv
                if not oi.aerosol_independent_of_rhod:
                    number *= rhod_host[cell] / c.rho_stp
                multiplicity = math.floor(number / sd_count + 0.5)
                if multiplicity <= 0:
                    continue
                cell_rep = np.full(sd_count, cell, dtype=np.int64)
                rd3 = np.full(sd_count, radius**3)
                x, z = _positions_in_cells(cfg, cell_rep, rng)
                rw2 = _equilibrium_rw2(state, cell_rep, rd3, kappa, RH_max)
                new = dict(
                    n=np.full(sd_count, float(multiplicity)), rd3=rd3,
                    rw2=rw2, kpa=np.full(sd_count, kappa),
                    x=x, z=z, y=np.zeros(sd_count),
                    vt=np.zeros(sd_count),
                    ijk=cell_rep.astype(np.int32),
                )
                state, added = _inject(state, new, rng, cfg)
                total += added
    return state, total
