#!/usr/bin/env python
"""Round-3 block-dual far-field sweep (TPU): fused engine-path steps/s.

Probes BHConfig.block_dual (per-(target-tile, source-tile) acceptance over
the eval grid, masked pair kernel + tile quadrupoles — ops/traversal.py
_dual_prepare) against the v8 round-2 baseline at the benchmark scene.
Appends JSON lines to results/dual_r3.jsonl.

Usage: bench_dual_r3.py [name substrings...] [--stats]
  --stats additionally runs one bh_accel per selected case to record
  dual_tiles / fallback counters (extra compile per config).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from nbody_tpu.core.state import ParticleState, SimParams
from nbody_tpu.core.stepper import make_run
from nbody_tpu.engines import get_engine
from nbody_tpu.scenes import self_gravitating_disc

OUT = os.path.join(os.path.dirname(__file__), "..", "results",
                   "dual_r3.jsonl")
STEPS = 25

# The round-2 preset values the early rows in dual_r3.jsonl were measured
# against.  auto_for's DEFAULTS flipped to dual+cap512+wp512 mid-round
# (traversal.py auto_for), so "no override" no longer reproduces the old
# baseline — any re-run of a `*_base` control row must pin these explicitly
# (every output row also records its resolved config now, see `rec` below).
R2_BASE = dict(block_dual=False, near_particle_cap=8192, window_pad=2048)

# Historical-record timeline for reading results/dual_r3.jsonl: rows up
# through round-3d were measured with the ROUND-2 preset defaults (R2_BASE
# above); the preset flip landed before round-3e, so 3e-onward rows inherit
# block_dual=True + the tier cap/pad cuts from auto_for unless overridden.
CASES = [
    # (name, n, engine_options) — preset defaults unless overridden
    ("quad_1m_base", 1 << 20, dict(R2_BASE)),  # round-2 baseline control
    ("quad_1m_dual", 1 << 20, dict(block_dual=True)),
    ("quad_1m_dual_et1024", 1 << 20, dict(block_dual=True, eval_tile=1024)),
    ("quad_1m_dual_et512", 1 << 20, dict(block_dual=True, eval_tile=512)),
    ("quad_1m_et1024_base", 1 << 20, dict(eval_tile=1024)),
    ("quad_1m_dual_m05", 1 << 20, dict(block_dual=True, dual_margin=0.5)),
    ("quad_1m_dual_m12", 1 << 20, dict(block_dual=True, dual_margin=1.2)),
    ("mono_1m_dual", 1 << 20, dict(multipole="mono", block_dual=True)),
    ("mono_1m_base", 1 << 20, dict(multipole="mono")),
    ("mono_1m_dual_m12", 1 << 20,
     dict(multipole="mono", block_dual=True, dual_margin=1.2)),
    ("mono_524k_dual", 1 << 19, dict(multipole="mono", block_dual=True)),
    ("mono_2m_dual", 1 << 21, dict(multipole="mono", block_dual=True)),
    # round-3b: margin escalation + window growth.  Rationale: the pair
    # kernel's slab is window + near rows (far nodes ride the quad kernel),
    # so dual's win is capped by how much of that EXACT work it may
    # approximate (margin) and how much of the near residual can be folded
    # into window rows that dual then skips (bigger window = fewer
    # irregular near gathers, distant window tiles dual-accepted).
    ("quad_1m_dual_m16", 1 << 20, dict(block_dual=True, dual_margin=1.6)),
    ("quad_1m_dual_m20", 1 << 20, dict(block_dual=True, dual_margin=2.0)),
    ("mono_1m_dual_m16", 1 << 20,
     dict(multipole="mono", block_dual=True, dual_margin=1.6)),
    ("quad_1m_w4096_base", 1 << 20, dict(window_pad=4096)),
    ("quad_1m_dual_w4096", 1 << 20,
     dict(block_dual=True, dual_margin=1.2, window_pad=4096)),
    ("quad_1m_dual_w4096_n4096", 1 << 20,
     dict(block_dual=True, dual_margin=1.2, window_pad=4096,
          near_particle_cap=4096)),
    ("quad_1m_dual_n4096", 1 << 20,
     dict(block_dual=True, dual_margin=1.2, near_particle_cap=4096)),
    # round-3c: the n4096 winner needs its no-dual CONTROL (is the win
    # dual-skip absorbing the smaller cap's residual, or just the cap?),
    # plus neighbors of the winning point.
    ("quad_1m_n4096_base", 1 << 20, dict(near_particle_cap=4096)),
    ("quad_1m_dual_n2048", 1 << 20,
     dict(block_dual=True, dual_margin=1.2, near_particle_cap=2048)),
    ("quad_1m_dual_n4096_m16", 1 << 20,
     dict(block_dual=True, dual_margin=1.6, near_particle_cap=4096)),
    ("mono_1m_dual_n4096", 1 << 20,
     dict(multipole="mono", block_dual=True, dual_margin=1.2,
          near_particle_cap=4096)),
    ("quad_524k_dual_n4096", 1 << 19,
     dict(block_dual=True, dual_margin=1.2, near_particle_cap=4096)),
    ("quad_2m_dual_n4096", 1 << 21,
     dict(block_dual=True, dual_margin=1.2, near_particle_cap=4096)),
    # round-3d: follow the cap-reduction trend past the n2048 winner and
    # check it scales
    ("quad_1m_dual_c1024", 1 << 20,
     dict(block_dual=True, dual_margin=1.2, near_particle_cap=1024)),
    ("quad_524k_dual_c2048", 1 << 19,
     dict(block_dual=True, dual_margin=1.2, near_particle_cap=2048)),
    ("quad_2m_dual_c2048", 1 << 21,
     dict(block_dual=True, dual_margin=1.2, near_particle_cap=2048)),
    ("quad_131k_dual_c2048", 1 << 17,
     dict(block_dual=True, dual_margin=1.2, near_particle_cap=2048)),
    ("quad_4m_dual_c2048", 1 << 22,
     dict(block_dual=True, dual_margin=1.2, near_particle_cap=2048)),
    # c1024 @1M hit 5.517 — probe the floor of the cap-reduction trend
    ("quad_1m_dual_x512", 1 << 20,
     dict(block_dual=True, dual_margin=1.2, near_particle_cap=512)),
    ("quad_1m_dual_x256", 1 << 20,
     dict(block_dual=True, dual_margin=1.2, near_particle_cap=256)),
    # round-3e: scale-check the cap-512 floor across N + mid-preset cap cut
    # (1M gates passed flat through cap 512 — accuracy_1m.jsonl dual_n512)
    ("quad_524k_dual_x512", 1 << 19, dict(near_particle_cap=512)),
    ("quad_2m_dual_x512", 1 << 21, dict(near_particle_cap=512)),
    ("quad_4m_dual_x512", 1 << 22, dict(near_particle_cap=512)),
    ("quad_131k_dual_c1024", 1 << 17, dict(near_particle_cap=1024)),
    ("quad_131k_dual_c512", 1 << 17, dict(near_particle_cap=512)),
    ("quad_1m_dual_x128", 1 << 20, dict(near_particle_cap=128)),
    # round-3f: the near-cap cut frees ~250 MB of per-group near-row
    # buffers at 8M (1024 groups x 8192 -> 512 rows) — the round-2
    # single-chip OOM margin was ~300 MB, so 8M might have fit one chip.
    # RESULT: still dies — the remote compile helper is SIGKILLed
    # (compile-side OOM, /tmp/dual_r3i.log 2026-08-17); the case is
    # disabled so unfiltered re-runs don't crash the chain.  Capacity
    # at 8M is the domain path's job (results/domain_8m_virtual.json).
    # ("quad_8m_dual_x512", 1 << 23, dict(near_particle_cap=512)),
    # round-3h: WINDOW SHRINK — the mirror of the cap-cut miss ("round 2
    # only probed increases"): w4096 growth lost, but window_pad CUTS were
    # never probed.  With cap cuts priced (fallbacks = exact multipoles),
    # a 2048->1024 pad cut drops ~2048 of ~13k slab rows from the pair
    # kernel (~16% of its 70 ms @1M) for more near-gather/fb pressure.
    ("quad_1m_dual_wp1024", 1 << 20, dict(window_pad=1024)),
    ("quad_1m_dual_wp512", 1 << 20, dict(window_pad=512)),
    ("quad_1m_dual_wp1024_c1024", 1 << 20,
     dict(window_pad=1024, near_particle_cap=1024)),
    ("quad_1m_dual_wp256", 1 << 20, dict(window_pad=256)),
    # round-3i: re-probe finer acceptance tiles AT the cap-512 defaults —
    # the et1024/et512 losses (-2%/-12%) predate the cap cut, and with the
    # slab now ~30% smaller the per-tile overhead vs extra-acceptance
    # trade has moved.  Finer tiles halve the acceptance distance
    # (w^2 < margin*theta^2*d^2), attacking the ~70% of pair work that is
    # intra-group (tile pairs within the same 8192-particle group).
    ("quad_1m_x512_et1024", 1 << 20, dict(eval_tile=1024)),
    ("quad_1m_x512_et512", 1 << 20, dict(eval_tile=512)),
    # round-3j: scale the window cut across N + the mid-N preset
    ("quad_524k_dual_wp512", 1 << 19, dict(window_pad=512)),
    ("quad_2m_dual_wp512", 1 << 21, dict(window_pad=512)),
    ("quad_131k_dual_wp1024", 1 << 17, dict(window_pad=1024)),
    ("quad_131k_dual_wp512", 1 << 17, dict(window_pad=512)),
    ("quad_4m_dual_wp512", 1 << 22, dict(window_pad=512)),
    # round-3k: stack the two round-3h/i winners — finer acceptance tiles
    # attack the intra-group pair work the window cut cannot remove
    ("quad_1m_wp512_et1024", 1 << 20,
     dict(window_pad=512, eval_tile=1024)),
    ("quad_1m_wp512_et512", 1 << 20,
     dict(window_pad=512, eval_tile=512)),
    ("quad_1m_wp512_et256", 1 << 20,
     dict(window_pad=512, eval_tile=256)),
    # round-3l: GROUP SIZE CUT — the third unprobed mirror.  "Scale group
    # size UP to trade gathers for dense evals" was tuned pre-dual at cap
    # 8192/pad 2048, when gathers dominated; with cap 512 + pad 512 the
    # gather volume collapsed, and the step is now bounded by INTRA-group
    # all-pairs work (8192^2 x 128 groups = 8.6G of the ~9.4G pair evals
    # at 1M).  Halving the group halves that square: 4096^2 x 256 = 4.3G,
    # at the price of 2x group count (walk/collect overhead) and 2x
    # window rows.  The walk was ~35 ms pre-dual vs the pair kernel's
    # ~70 ms — arithmetic says this can pay if acceptance keeps up.
    ("quad_1m_g4096_wp512", 1 << 20,
     dict(group_size=4096, subgroups=64, window_pad=512)),
    ("quad_1m_g2048_wp512", 1 << 20,
     dict(group_size=2048, subgroups=64, window_pad=512)),
    ("quad_1m_g4096_wp1024", 1 << 20,
     dict(group_size=4096, subgroups=64, window_pad=1024)),
    # CPU accuracy pre-gates (accuracy_wp_cpu.jsonl): g4096 holds p99
    # within 1.4x at 65k/131k; g2048 fails (2.4x) — if g2048 wins perf it
    # still cannot ship without a different accuracy story.
    ("quad_524k_g4096_wp512", 1 << 19,
     dict(group_size=4096, subgroups=64, window_pad=512)),
    ("quad_2m_g4096_wp512", 1 << 21,
     dict(group_size=4096, subgroups=64, window_pad=512)),
    # halving the group doubles the walk's sequential chunk count at the
    # auto cap (chunk_groups <= 8); if g4096 stalls on the walk, wider
    # vmapping is the first lever (the walk is XLA/HBM, not scoped-VMEM
    # bound like the Pallas kernels)
    ("quad_1m_g4096_wp512_cg16", 1 << 20,
     dict(group_size=4096, subgroups=64, window_pad=512,
          chunk_groups=16)),
    # round-3m: walk-width at the SHIPPED defaults (g8192).  The 02:22
    # profile puts the collect walk at 34.2 ms of the 164.5 ms step — #2
    # behind the 55.8 ms pair kernel.  The cg<=8 auto cap came from
    # pre-dual tuning ("saturates at 8", tune_bh_r2.jsonl) when the pair
    # kernel dwarfed the walk; at 1M n_groups=128 so cg16 halves the
    # lax.map chunk count to 8 at 2x walk working set (XLA/HBM-bound,
    # not scoped-VMEM).
    ("quad_1m_wp512_cg16", 1 << 20, dict(chunk_groups=16)),
    ("quad_1m_wp512_cg32", 1 << 20, dict(chunk_groups=32)),
    ("quad_131k_base", 1 << 17, dict(R2_BASE)),  # round-2 baseline control
    ("quad_131k_dual", 1 << 17, dict(block_dual=True)),
    ("quad_524k_dual", 1 << 19, dict(block_dual=True)),
    ("quad_2m_dual", 1 << 21, dict(block_dual=True)),
    ("quad_4m_dual", 1 << 22, dict(block_dual=True)),
    # round-3 session-3: Newton-3 symmetric self-square (cfg.near_sym) vs
    # fresh same-session controls at the shipped tier defaults.  The sym
    # path splits the window into rims + a symmetric central square
    # (group_self_force_pallas) — identical force set (tests/test_near_sym
    # f64 proof), so these rows are pure perf.
    ("ns_131k_base", 1 << 17, dict()),
    ("ns_131k_sym", 1 << 17, dict(near_sym=True)),
    ("ns_524k_base", 1 << 19, dict()),
    ("ns_524k_sym", 1 << 19, dict(near_sym=True)),
    ("ns_1m_base", 1 << 20, dict()),
    ("ns_1m_sym", 1 << 20, dict(near_sym=True)),
    ("ns_2m_base", 1 << 21, dict()),
    ("ns_2m_sym", 1 << 21, dict(near_sym=True)),
    ("ns_4m_base", 1 << 22, dict()),
    ("ns_4m_sym", 1 << 22, dict(near_sym=True)),
    # isolation: how much of the sym loss is block-dual's intra-square tile
    # skips (which the sym square pays exactly)?  No-dual pairs quantify
    # the raw symmetric saving on the full square.
    ("ns_1m_basend", 1 << 20, dict(block_dual=False)),
    ("ns_1m_symnd", 1 << 20, dict(block_dual=False, near_sym=True)),
    # block-dual value re-check at the SHIPPED cut defaults (ns_1m_basend
    # 6.22 vs ns_1m_base 6.13 hinted dual may be free-to-negative now that
    # the cap/pad cuts shrank the slab it used to prune).  Back-to-back
    # A/B pairs, two repeats at 1M, all tiers.
    ("dv_131k_dual", 1 << 17, dict()),
    ("dv_131k_nd", 1 << 17, dict(block_dual=False)),
    ("dv_524k_dual", 1 << 19, dict()),
    ("dv_524k_nd", 1 << 19, dict(block_dual=False)),
    ("dv_1m_dual", 1 << 20, dict()),
    ("dv_1m_nd", 1 << 20, dict(block_dual=False)),
    ("dv_1m_dual2", 1 << 20, dict()),
    ("dv_1m_nd2", 1 << 20, dict(block_dual=False)),
    ("dv_2m_dual", 1 << 21, dict()),
    ("dv_2m_nd", 1 << 21, dict(block_dual=False)),
    ("dv_4m_dual", 1 << 22, dict()),
    ("dv_4m_nd", 1 << 22, dict(block_dual=False)),
    # >1M window-pad middle ground: wp512 failed its 2M gate (2.25x),
    # wp2048 ships — wp1024 was never probed there.  Cap interactions too:
    # the 2M gate failure was fallback-pressure driven, so a cap raise may
    # relieve it.  Controls: dv_2m_dual (wp2048/cap512) = 2.945.
    ("wp_2m_wp1024", 1 << 21, dict(window_pad=1024)),
    ("wp_2m_wp1024_c2048", 1 << 21,
     dict(window_pad=1024, near_particle_cap=2048)),
    ("wp_2m_c2048", 1 << 21, dict(near_particle_cap=2048)),
    ("wp_4m_wp1024", 1 << 22, dict(window_pad=1024)),
    # session-3b: max_level 8 at >2M — the one unprobed lever in that
    # tier.  Rationale: the pad cuts fail their 4M gates on FALLBACK
    # PRESSURE (near_fallback 19-21k; correlated whole-cell multipole
    # error), and at L=7 the 4M disc packs ~2 particles/leaf-cell column
    # but hot disc-core cells are far denser.  L=8 shrinks near cells 8x
    # so window/cap budgets cover whole cells again.  Risks priced in:
    # the leaf build loses its prefix-path gate (n*4 >= 8^L fails at 4M)
    # and the level-8 tables are 16.7M rows (~0.5 GB HBM).
    ("ml8_4m", 1 << 22, dict(max_level=8)),
    ("ml8_4m_wp1024", 1 << 22, dict(max_level=8, window_pad=1024)),
    ("ml8_2m_wp512", 1 << 21, dict(max_level=8, window_pad=512)),
    # session-3b: subgroup-count walk lever at the ROUND-3 step shape.
    # The collect walk (34.2 ms of 164.5 @1M) is dominated by the
    # [F, S, 3] box-distance tensor at the bottom-weighted frontier
    # levels; S=64 halves that.  The old g8_s64_mxu probe washed, but at
    # the round-2 700 ms step the walk was 5% of the step, not 21% —
    # re-measure at today's defaults, watching near_fallback (coarser
    # boxes accept less, growing the near field).
    ("sg64_1m", 1 << 20, dict(subgroups=64)),
    ("sg32_1m", 1 << 20, dict(subgroups=32)),
    ("sg64_524k", 1 << 19, dict(subgroups=64)),
    # session-8: sliding-window (gather-free) slab assembly A/B at the
    # shipped tier defaults — BHConfig.sliding_window replaces the
    # clamped vmapped dynamic_slice window gather with three dense
    # shifted reshapes (traversal.py _window_rows).  Back-to-back pairs,
    # two repeats at 1M (the <8% noise rule).  NOTE: the committed
    # dual_r3.jsonl sw_* rows were measured 2026-08-19 in a process
    # whose working-tree default was sliding_window=True, so their "on"
    # arms used dict() and their cfg snapshots predate sliding_window in
    # the whitelist below — the on/off arms there are distinguishable by
    # name only.  The cases now set the flag explicitly both ways.
    ("sw_131k_on", 1 << 17, dict(sliding_window=True)),
    ("sw_131k_off", 1 << 17, dict(sliding_window=False)),
    ("sw_524k_on", 1 << 19, dict(sliding_window=True)),
    ("sw_524k_off", 1 << 19, dict(sliding_window=False)),
    ("sw_1m_on", 1 << 20, dict(sliding_window=True)),
    ("sw_1m_off", 1 << 20, dict(sliding_window=False)),
    ("sw_1m_on2", 1 << 20, dict(sliding_window=True)),
    ("sw_1m_off2", 1 << 20, dict(sliding_window=False)),
    ("sw_2m_on", 1 << 21, dict(sliding_window=True)),
    ("sw_2m_off", 1 << 21, dict(sliding_window=False)),
]


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    want_stats = "--stats" in sys.argv

    done = set()
    if os.path.exists(OUT):
        with open(OUT) as f:
            for line in f:
                try:
                    done.add(json.loads(line)["name"])
                except Exception:
                    pass

    params = SimParams.create(dt=3e-2, g_soft=0.02, theta2=1.0,
                              bounds_width=10.0, dtype=jnp.float32)
    states = {}

    for name, n, opts in CASES:
        if args and not any(s in name for s in args):
            continue
        if name in done:
            continue
        if n not in states:
            pos, vel, mass = self_gravitating_disc(n - 1, seed=0)
            states[n] = ParticleState.create(pos, vel, mass, capacity=n,
                                             dtype=jnp.float32)
        state = states[n]
        engine = get_engine("bh", **(opts or {}))
        run = make_run(engine.force)
        tc0 = time.perf_counter()
        out = run(state, params, STEPS)
        float(out.time)  # relay-safe sync (CLAUDE.md)
        compile_s = time.perf_counter() - tc0
        t0 = time.perf_counter()
        out = run(out, params, STEPS)
        float(out.time)
        dt_s = time.perf_counter() - t0
        from nbody_tpu.ops.traversal import BHConfig

        rcfg = BHConfig.auto_for(n, **(opts or {}))
        rec = {
            "name": name,
            "n": n,
            "steps_per_s": round(STEPS / dt_s, 3),
            "ms_per_step": round(dt_s / STEPS * 1e3, 1),
            "compile_s": round(compile_s, 1),
            "ts": time.time(),
            # resolved config snapshot: rows stay interpretable across
            # future preset-default flips
            "cfg": {"group_size": rcfg.group_size,
                    "block_dual": rcfg.block_dual,
                    "dual_margin": rcfg.dual_margin,
                    "near_particle_cap": rcfg.near_particle_cap,
                    "window_pad": rcfg.window_pad,
                    "eval_tile": rcfg.eval_tile,
                    "multipole": rcfg.multipole,
                    "near_sym": rcfg.near_sym,
                    "sliding_window": rcfg.sliding_window,
                    "chunk_groups": rcfg.chunk_groups},
        }
        if want_stats:
            from nbody_tpu.ops.traversal import BHConfig, bh_accel

            cfg = BHConfig.auto_for(n, **(opts or {}))
            m = state.effective_mass()
            _, st = bh_accel(state.pos, m, params.bounds, params.theta2,
                             params.g, params.g_soft, cfg)
            rec["dual_tiles"] = int(st["dual_tiles"])
            rec["near_fallback"] = int(st["near_fallback"])
            rec["fb_spill"] = int(st["fb_spill"])
        os.makedirs(os.path.dirname(OUT), exist_ok=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(rec, flush=True)


if __name__ == "__main__":
    main()
