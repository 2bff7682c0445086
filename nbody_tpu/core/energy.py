"""Energy diagnostics: kinetic + softened potential.

The reference computes NO energy diagnostics anywhere (SURVEY.md §4) — this is
new work demanded by the build targets (BASELINE.md: energy drift vs rebound to
1e-6 over 1k steps).  The potential is the Plummer-softened pair potential
whose gradient is exactly the reference force law
``a_i = G * m_j * (p_j - p_i) / (|r|^2 + eps^2)^{3/2}``
(reference src/manual/brute_force.rs:69-80):

    U = -G * sum_{i<j} m_i m_j / sqrt(|r_ij|^2 + eps^2)

Dead particles (zero effective mass) contribute nothing.  The pair sum is
row-tiled under ``lax.map`` so memory stays O(tile * N) at any N.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from nbody_tpu.core.state import ParticleState, SimParams


def kinetic_energy(state: ParticleState) -> jax.Array:
    m = state.effective_mass()
    v2 = jnp.sum(state.vel * state.vel, axis=-1)
    return 0.5 * jnp.sum(m * v2)


def _pe_row_tile(pos_tile, m_tile, row_ids, pos, mass, g, eps2):
    """Potential energy of one row tile against all particles, counting each
    unordered pair once via a strict upper-triangle mask."""
    n = pos.shape[0]
    d = pos_tile[:, None, :] - pos[None, :, :]  # [T, N, D]
    r2 = jnp.sum(d * d, axis=-1) + eps2  # [T, N]
    col_ids = jnp.arange(n)[None, :]
    # count each unordered pair once; skip exactly-coincident pairs at eps=0
    # (matches the force-law skip, see engines/brute_force.py)
    take = (col_ids > row_ids[:, None]) & (r2 > 0.0)
    inv_r = jax.lax.rsqrt(jnp.where(take, r2, 1.0))
    pair_m = m_tile[:, None] * mass[None, :]
    return -g * jnp.sum(jnp.where(take, pair_m * inv_r, 0.0))


@partial(jax.jit, static_argnames=("tile",))
def potential_energy(state: ParticleState, params: SimParams, tile: int = 512):
    pos = state.pos
    mass = state.effective_mass()
    n = pos.shape[0]
    eps2 = params.g_soft * params.g_soft
    pad = (-n) % tile
    if pad:
        pos_p = jnp.pad(pos, ((0, pad), (0, 0)))
        mass_p = jnp.pad(mass, (0, pad))
    else:
        pos_p, mass_p = pos, mass
    n_pad = n + pad
    ids = jnp.arange(n_pad)
    # padded rows have zero mass -> zero contribution
    pos_t = pos_p.reshape(n_pad // tile, tile, -1)
    mass_t = mass_p.reshape(n_pad // tile, tile)
    ids_t = ids.reshape(n_pad // tile, tile)

    def body(args):
        pt, mt, it = args
        return _pe_row_tile(pt, mt, it, pos, mass, params.g, eps2)

    partials = jax.lax.map(body, (pos_t, mass_t, ids_t))
    return jnp.sum(partials)


def potential_energy_bh(state: ParticleState, params: SimParams,
                        theta2=None, cfg=None):
    """Tree-approximated potential energy (VERDICT r2 #8): O(N log N)
    instead of the exact O(N²) pair pass, so energy diagnostics at 4M+
    stop costing more than the steps they diagnose.

    Window/near pairs are exact; accepted nodes contribute self-excluded
    monopoles (ops/traversal.py traverse_tree_phi).  Measured accuracy vs
    the exact pair PE: ~1e-4 relative at 8k/θ²=1 (tests/test_energy.py).
    That bias is the SAME magnitude as flagship-config f32 drift, and it
    is configuration-dependent so it does not cancel between two calls —
    good for one-shot energy magnitudes, NOT for drift measurement (see
    resolve_energy_method).  ``theta2`` defaults to the run's own opening
    angle; pass a smaller one for a tighter estimate."""
    from nbody_tpu.ops.traversal import BHConfig, bh_potential

    n = state.capacity
    if cfg is None:
        # generous fb budget: spill rows degrade to self-INCLUSIVE plain
        # monopoles, the one uncontrolled term in the φ estimator
        cfg = BHConfig.auto_for(n, multipole="mono", fb_cap=2048)
    t2 = params.theta2 if theta2 is None else theta2
    u, _stats = bh_potential(state.pos, state.effective_mass(),
                             params.bounds, t2, params.g, params.g_soft,
                             cfg)
    return u


# exact pair PE above this capacity costs more than a sim step
_BH_ENERGY_THRESHOLD = 1 << 18


def resolve_energy_method(capacity: int, method: str = "auto") -> str:
    """What 'auto' picks: exact below 262k capacity, tree estimator above.

    CAVEAT for drift measurements: the tree estimator's ~1e-4 relative bias
    is configuration-dependent (the walk's accept set changes as particles
    move), so it does NOT fully cancel between two evaluations — drift
    readings below ~1e-4 from method='bh' can be estimator artifact.  Use
    method='exact' when measuring drift (scripts/comp_drift_1m.py does);
    'bh' is for one-shot energy magnitudes at N where O(N²) is prohibitive."""
    if method == "auto":
        return "bh" if capacity > _BH_ENERGY_THRESHOLD else "exact"
    return method


def total_energy(state: ParticleState, params: SimParams, tile: int = 512,
                 method: str = "auto"):
    """method: 'exact' (O(N²) pair PE — the small-N oracle), 'bh' (tree
    estimator), or 'auto' (see resolve_energy_method, incl. the drift
    caveat)."""
    method = resolve_energy_method(state.capacity, method)
    if method == "bh":
        pe = potential_energy_bh(state, params)
    else:
        pe = potential_energy(state, params, tile=tile)
    return kinetic_energy(state) + pe
