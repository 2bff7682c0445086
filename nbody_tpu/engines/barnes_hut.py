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
    cfg = BHConfig(**options)

    def force(pos, mass, params):
        acc, _stats = bh_accel(
            pos, mass, params.bounds, params.theta2, params.g, params.g_soft, cfg
        )
        return acc

    def aux(pos, mass, params):
        from nbody_tpu.ops.tree import build_octree, tree_boxes

        tree = build_octree(pos, mass, params.bounds, cfg.max_level)
        acc, stats = bh_accel(
            pos, mass, params.bounds, params.theta2, params.g, params.g_soft, cfg
        )
        return {
            "tree_boxes": tree_boxes(tree, params.bounds),
            "accept_dropped": int(stats["accept_dropped"]),
            "frontier_fallback": int(stats["frontier_fallback"]),
            "near_fallback": int(stats["near_fallback"]),
        }

    return Engine(
        name=name,
        force=force,
        aux=aux,
        description=f"Barnes-Hut linear octree, {cfg}",
    )


def _bh_factory(**options):
    options.setdefault("max_level", 7)
    return make_bh_engine("bh", **options)


def _bh_deep_factory(**options):
    options.setdefault("max_level", 8)
    options.setdefault("near_particle_cap", 1024)
    return make_bh_engine("bh-deep", **options)


ENGINES["bh"] = _bh_factory
ENGINES["bh-deep"] = _bh_deep_factory
