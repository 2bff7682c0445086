"""Barnes-Hut octree engines — TPU-native linear octree.

Replaces the reference's pointer/arena octrees with a Morton-sorted dense
level pyramid and vectorized group traversal:

  * manual recursive tree (src/manual/barnes_hut.rs:143-203)
  * LLM Morton+arena tree + iterative stack walk (src/llm/barnes_hut.rs)
  * midterm incremental tree (src/llm/barnes_hut_midterm.rs) — its
    incremental-update machinery is deliberately NOT reproduced: a full
    rebuild here is an argsort + segment-sum, cheaper than tracking moved
    particles (SURVEY.md §7.4).

Engine names:
  * ``bh``      — balanced defaults (the flagship engine)
  * ``bh-deep`` — deeper leaf grid for very large N

Build-time options (static, via ``engine_options``): max_level, group_size,
frontier_cap, near_cell_cap, near_particle_cap, start_level, chunk_groups.
The runtime opening angle theta^2 stays a *traced* SimParams field, so the
reference's live theta slider (src/vis.rs:183-188) maps to a no-recompile
settings update.
"""

from __future__ import annotations

from nbody_tpu.engines import Engine, ENGINES
from nbody_tpu.ops.traversal import BHConfig, bh_accel


def make_bh_engine(name: str = "bh", **options) -> Engine:
    # 'profile' selects a preset family, not a BHConfig field: 'fast' (the
    # benchmark-tuned cap/pad cuts) or 'accurate' (round-2 budgets — see
    # BHConfig.auto_for and VALIDATION.md §10 for the measured trade)
    profile = options.pop("profile", "fast")
    if profile not in ("fast", "accurate", "dense", "adaptive"):
        raise ValueError(f"profile must be 'fast', 'accurate', 'dense' or "
                         f"'adaptive', got {profile!r}")
    if profile == "accurate":
        options.setdefault("window_pad", 2048)
    elif profile == "dense":
        # steep-core preset (VALIDATION.md §18) as explicit overrides, so
        # both the auto_for path below and a fully-manual config get it;
        # caller-supplied fields win
        from nbody_tpu.ops.traversal import DENSE_OVERRIDES

        for k, v in DENSE_OVERRIDES.items():
            options.setdefault(k, v)
    elif profile == "adaptive":
        # density-adaptive steep-core preset (VALIDATION.md §19); same
        # explicit-override spelling, caller-supplied fields win
        from nbody_tpu.ops.traversal import ADAPTIVE_OVERRIDES

        for k, v in ADAPTIVE_OVERRIDES.items():
            options.setdefault(k, v)
    # temporal walk reuse (engine option, not a BHConfig field): run the
    # collect walk every K steps, evaluating the frozen topology at fresh
    # positions in between (ops/traversal.py traverse_tree_cached).  1 =
    # the classic rebuild-every-step engine.  Guarded by the bh-lazy
    # moved-fraction trigger (walk_rebuild_frac) regardless of K.
    # MEASURED VERDICT (VALIDATION.md §16): wins only at N <= ~64k
    # (+11% @20k, wash @64k-131k, -8..10% @524k-1M — the cached step's
    # refresh + node-row re-gathers outweigh the walk it skips at large
    # N).  Opt-in only; the auto engine never selects bh in the win
    # region (brute crossover ~60k).
    walk_every = int(options.pop("walk_every", 1))
    walk_rebuild_frac = float(options.pop("walk_rebuild_frac", 0.5))
    cfg = BHConfig(**options)
    # group sizing left to the engine -> pick the sweep-tuned preset for the
    # state's capacity at trace time (bigger groups win as N grows)
    auto_group = not any(
        k in options for k in ("group_size", "subgroups", "chunk_groups")
    )

    def fit(pos):
        """Adapt the static config to the state's capacity (size-adaptive
        group preset) and dimensionality (quadtree for 2D states) — the
        reference is D-generic the same way (src/shared.rs:46)."""
        import dataclasses

        c = BHConfig.auto_for(pos.shape[0], **options) if auto_group else cfg
        d = pos.shape[1]
        return c if d == c.dim else dataclasses.replace(c, dim=d)

    def force(pos, mass, params):
        acc, _stats = bh_accel(
            pos, mass, params.bounds, params.theta2, params.g, params.g_soft,
            fit(pos),
        )
        return acc

    def aux(pos, mass, params):
        from nbody_tpu.ops.tree import build_octree, tree_boxes

        c = fit(pos)
        # refine args ride along so adaptive runs render their per-octant
        # descent below the leaf grid (VERDICT r3 weak #8)
        tree = build_octree(pos, mass, params.bounds, c.max_level, dim=c.dim,
                            refine_levels=c.refine_levels,
                            refine_cap=c.refine_cap,
                            refine_threshold=c.refine_threshold_resolved)
        acc, stats = bh_accel(
            pos, mass, params.bounds, params.theta2, params.g, params.g_soft, c
        )
        out = {
            "tree_boxes": tree_boxes(tree, params.bounds),
            "accept_dropped": int(stats["accept_dropped"]),
            "frontier_fallback": int(stats["frontier_fallback"]),
            "near_fallback": int(stats["near_fallback"]),
            "fb_spill": int(stats["fb_spill"]),
        }
        if c.refine_levels:
            out["refine_build_dropped"] = int(stats["refine_build_dropped"])
        return out

    init_carry = force_carry = None
    if walk_every > 1:
        import jax.numpy as jnp

        from nbody_tpu.ops.traversal import bh_accel_reuse, empty_topo
        from nbody_tpu.ops.tree import build_octree

        def init_carry(pos, mass, params):
            c = fit(pos)
            # grid frame, like bh-lazy: the carried tree stores grid-frame
            # pos_s; age 0 makes the first force a full rebuild + walk
            tree = build_octree(
                pos - params.bounds.center, mass, params.bounds.centered(),
                c.max_level, dim=c.dim, quad=c.multipole == "quad",
                quad_leaf=c.quad_leaf,
            )
            return (tree, empty_topo(pos.shape[0], c, pos.dtype),
                    jnp.int32(0))

        def force_carry(pos, mass, params, carry):
            tree, topo, age = carry
            acc, _stats, tree, topo, age = bh_accel_reuse(
                pos, mass, params.bounds, params.theta2, params.g,
                params.g_soft, tree, topo, age, fit(pos), walk_every,
                walk_rebuild_frac,
            )
            return acc, (tree, topo, age)

    return Engine(
        name=name,
        force=force,
        aux=aux,
        init_carry=init_carry,
        force_carry=force_carry,
        description=f"Barnes-Hut linear octree, {cfg}",
    )


def make_bh_lazy_engine(name: str = "bh-lazy", rebuild_frac: float = 0.3,
                        move_cells: float = 1.0, **options) -> Engine:
    """Incremental-tree Barnes-Hut (the TPU analog of the reference midterm
    engine, src/llm/barnes_hut_midterm.rs): node stats are refreshed in
    place each step (no argsort); a full rebuild triggers only when
    ``rebuild_frac`` of the alive particles have strayed more than
    ``move_cells`` leaf cells from their frozen cell.

    PARITY DEMONSTRATION, NOT RECOMMENDED: measured slower than ``bh`` at
    every N/dt on TPU v5e (results/sweep_lazy_r2.jsonl) — the refresh still
    pays the pos[order] re-gathers, which cost nearly as much as the
    payload-carrying sort they skip.  Kept because the reference ships the
    midterm engine; use ``bh``."""
    from nbody_tpu.ops.traversal import bh_accel_lazy
    from nbody_tpu.ops.tree import build_octree

    cfg = BHConfig(**options)
    # same capacity-adaptive group preset as the eager engine (round-1
    # comparisons pitted lazy@4096 against bh@8192 at N=1M — not a fair race)
    auto_group = not any(
        k in options for k in ("group_size", "subgroups", "chunk_groups")
    )

    def fit(pos):
        import dataclasses

        c = BHConfig.auto_for(pos.shape[0], **options) if auto_group else cfg
        d = pos.shape[1]
        return c if d == c.dim else dataclasses.replace(c, dim=d)

    def init_carry(pos, mass, params):
        c = fit(pos)
        # grid frame: bh_accel_lazy recenters on bounds.center, and the
        # carried tree must live in the same frame (ops/traversal.py)
        return build_octree(pos - params.bounds.center, mass,
                            params.bounds.centered(), c.max_level, dim=c.dim,
                            quad=c.multipole == "quad",
                            quad_leaf=c.quad_leaf)

    def force_carry(pos, mass, params, tree):
        acc, _stats, tree = bh_accel_lazy(
            pos, mass, params.bounds, params.theta2, params.g, params.g_soft,
            tree, fit(pos), rebuild_frac, move_cells,
        )
        return acc, tree

    def force(pos, mass, params):
        # stateless fallback: build + traverse
        acc, _stats = bh_accel(
            pos, mass, params.bounds, params.theta2, params.g, params.g_soft,
            fit(pos),
        )
        return acc

    return Engine(
        name=name,
        force=force,
        init_carry=init_carry,
        force_carry=force_carry,
        description=f"incremental Barnes-Hut (lazy rebuild), {cfg}",
    )


def _bh_factory(**options):
    options.setdefault("max_level", 7)
    return make_bh_engine("bh", **options)


def _bh_deep_factory(**options):
    options.setdefault("max_level", 8)
    return make_bh_engine("bh-deep", **options)


ENGINES["bh"] = _bh_factory
ENGINES["bh-deep"] = _bh_deep_factory
ENGINES["bh-lazy"] = make_bh_lazy_engine
