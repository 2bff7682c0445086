#!/usr/bin/env python
"""Round-2 BH tuner (TPU): A/B the fused Pallas group-force eval
(ops/group_force.py) against the round-1 XLA slab eval, then sweep the knobs
whose economics the kernel changes (near caps are ~free when padding tiles
skip; window width trades dense kernel work for gathers).

Force-only timings (one dispatch per call, ~25 ms relay overhead inflates
each sample — compare relatively; fused-run numbers come from
scripts/perf_benchmark.py).  Appends JSON lines to results/tune_bh_r2.jsonl;
already-done configs are skipped on rerun.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from nbody_tpu.core.state import ParticleState, SimParams
from nbody_tpu.ops.traversal import BHConfig, bh_accel
from nbody_tpu.scenes import self_gravitating_disc

OUT = os.path.join(os.path.dirname(__file__), "..", "results",
                   "tune_bh_r2.jsonl")
N = 1 << 20
REPS = 3

# NOTE: every pre-quadrupole config below carries multipole="mono" — they
# were measured before BHConfig.multipole existed (then-default behavior);
# re-runs must reproduce the same program.
G8 = dict(group_size=8192, subgroups=128, chunk_groups=1, start_level=3,
          multipole="mono")
G4 = dict(group_size=4096, subgroups=64, chunk_groups=1, start_level=3,
          multipole="mono")
Q8 = dict(group_size=8192, subgroups=128, chunk_groups=1, start_level=3)
Q4 = dict(group_size=4096, subgroups=64, chunk_groups=1, start_level=3)

CONFIGS = {
    # A/B at the round-1 winning config
    "xla_g8": dict(eval_mode="xla", **G8),
    "pl_g8": dict(eval_mode="pallas", **G8),
    # kernel tile width
    "pl_g8_t4096": dict(eval_mode="pallas", eval_tile=4096, **G8),
    "pl_g8_t1024": dict(eval_mode="pallas", eval_tile=1024, **G8),
    # near caps are cheap now: kill the 1M fallback tail (VERDICT #4)
    "pl_g8_near16k": dict(eval_mode="pallas", near_particle_cap=16384,
                          near_cell_cap=4096, **G8),
    "pl_g8_near32k": dict(eval_mode="pallas", near_particle_cap=32768,
                          near_cell_cap=4096, **G8),
    # window width: smaller window -> more near cells (cheap) fewer dense rows
    "pl_g8_pad1024": dict(eval_mode="pallas", window_pad=1024,
                          near_particle_cap=16384, near_cell_cap=4096, **G8),
    "pl_g8_pad4096": dict(eval_mode="pallas", window_pad=4096, **G8),
    # bigger groups: dense evals amortize gathers harder under the kernel
    "pl_g16": dict(eval_mode="pallas", group_size=16384, subgroups=256,
                   chunk_groups=1, start_level=3),
    "pl_g16_near16k": dict(eval_mode="pallas", group_size=16384,
                           subgroups=256, chunk_groups=1, start_level=3,
                           near_particle_cap=16384, near_cell_cap=4096),
    # mid-N check
    "xla_g4_131k": dict(eval_mode="xla", n=131072, **G4),
    "pl_g4_131k": dict(eval_mode="pallas", n=131072, **G4),
    "pl_g4_131k_near16k": dict(eval_mode="pallas", n=131072,
                               near_particle_cap=16384, near_cell_cap=4096,
                               **G4),
    # L=8: smaller leaves cut near totals 8x; the build-side cost (16.7M-cell
    # pyramid) lost under the XLA eval (round 1) but the kernel shifts the
    # balance
    "pl_g8_L8": dict(eval_mode="pallas", max_level=8, **G8),
    "pl_g8_L8_near16k": dict(eval_mode="pallas", max_level=8,
                             near_particle_cap=16384, near_cell_cap=4096,
                             **G8),
    "pl_g8_L8_pad1024": dict(eval_mode="pallas", max_level=8,
                             window_pad=1024, **G8),
    # 2M flagship probes
    "pl_2m_L7": dict(eval_mode="pallas", n=1 << 21, **G8),
    "pl_2m_L8": dict(eval_mode="pallas", n=1 << 21, max_level=8, **G8),
    # accuracy lever: start shallower only if free
    "pl_g8_fb512": dict(eval_mode="pallas", fb_cap=512, **G8),
    # round-2b: quadrupole path (multipole defaults to "quad") — perf cost
    # of the extra kernel + quad tree build vs the mono rows above.
    # Measured before the round-2c/2d default flips; the then-defaults
    # (fb_quad=True, quad_leaf=True, accept_margin=1.0) are pinned so
    # reruns reproduce the same program.
    "quad_g8": dict(eval_mode="pallas", fb_quad=True, quad_leaf=True,
                    accept_margin=1.0, **Q8),
    "quad_g8_fb512": dict(eval_mode="pallas", fb_quad=True, quad_leaf=True,
                          accept_margin=1.0, fb_cap=512, **Q8),
    "quad_g4_131k": dict(eval_mode="pallas", fb_quad=True, quad_leaf=True,
                         accept_margin=1.0, n=131072, **Q4),
    "quad_2m_L7": dict(eval_mode="pallas", fb_quad=True, quad_leaf=True,
                       accept_margin=1.0, n=1 << 21, **Q8),
    "quad_g8_near16k": dict(eval_mode="pallas", fb_quad=True, quad_leaf=True,
                            accept_margin=1.0, near_particle_cap=16384,
                            near_cell_cap=4096, fb_cap=512, **Q8),
    # round-2c: quad cost recovery — fb_quad off (measured zero accuracy
    # effect) + small quad tile (whole-tile skip over the mostly-padding
    # accept slab)
    "quad2_g8": dict(eval_mode="pallas", quad_leaf=True, accept_margin=1.0,
                     **Q8),
    "quad2_g8_t2048": dict(eval_mode="pallas", quad_leaf=True,
                           accept_margin=1.0, quad_tile=2048, **Q8),
    "quad2_g8_t1024": dict(eval_mode="pallas", quad_leaf=True,
                           accept_margin=1.0, quad_tile=1024, **Q8),
    "quad2_g8_m08": dict(eval_mode="pallas", quad_leaf=True,
                         accept_margin=0.8, **Q8),
    "quad2_g8_m09": dict(eval_mode="pallas", quad_leaf=True,
                         accept_margin=0.9, **Q8),
    "quad2_g4_131k": dict(eval_mode="pallas", quad_leaf=True,
                          accept_margin=1.0, n=131072, **Q4),
    "quad2_2m": dict(eval_mode="pallas", quad_leaf=True, accept_margin=1.0,
                     n=1 << 21, **Q8),
    "quad2_2m_m08": dict(eval_mode="pallas", quad_leaf=True,
                         accept_margin=0.8, n=1 << 21, **Q8),
    # round-2d: skip leaf-level quad moments (largest quad build stage) —
    # quad3_g8_m08 == the shipped defaults
    "quad3_g8": dict(eval_mode="pallas", quad_leaf=False, accept_margin=1.0,
                     **Q8),
    "quad3_g8_m08": dict(eval_mode="pallas", quad_leaf=False,
                         accept_margin=0.8, **Q8),
    "quad3_2m": dict(eval_mode="pallas", n=1 << 21, quad_leaf=False,
                     accept_margin=1.0, **Q8),
    "quad3_2m_m08": dict(eval_mode="pallas", n=1 << 21, quad_leaf=False,
                         accept_margin=0.8, **Q8),
    "quad3_g4_131k": dict(eval_mode="pallas", n=131072, quad_leaf=False,
                          accept_margin=1.0, **Q4),
    # round-2e: the collect walk is lax.map-serialized per chunk; with the
    # eval decoupled from collect (fused kernel), wider chunks should
    # parallelize the 62 ms walk (scripts/profile_1m.py while.47)
    "quad4_g8_cg4": dict(eval_mode="pallas", group_size=8192, subgroups=128,
                         chunk_groups=4, start_level=3, quad_leaf=False,
                         accept_margin=0.8),
    "quad4_g8_cg8": dict(eval_mode="pallas", group_size=8192, subgroups=128,
                         chunk_groups=8, start_level=3, quad_leaf=False,
                         accept_margin=0.8),
    "quad4_g8_cg16": dict(eval_mode="pallas", group_size=8192,
                          subgroups=128, chunk_groups=16, start_level=3,
                          quad_leaf=False, accept_margin=0.8),
    "quad4_g8_cg128": dict(eval_mode="pallas", group_size=8192,
                           subgroups=128, chunk_groups=128, start_level=3,
                           quad_leaf=False, accept_margin=0.8),
    # does g4096 win at 1M now that the walk is vmapped and the eval is the
    # Pallas kernel?  (round-1's g8192 choice predates both)
    "quad4_g4_1m": dict(eval_mode="pallas", group_size=4096, subgroups=64,
                        chunk_groups=8, start_level=3, quad_leaf=False,
                        accept_margin=0.8),
    "quad4_g4_1m_cg16": dict(eval_mode="pallas", group_size=4096,
                             subgroups=64, chunk_groups=16, start_level=3,
                             quad_leaf=False, accept_margin=0.8),
    # round-2f (v4): maskless kernels cut the per-pair cost ~20%, so the
    # window/group economics shift toward fewer dense pairs — re-probe the
    # knobs the kernel price used to pin
    "quad5_g8": dict(eval_mode="pallas", group_size=8192, subgroups=128,
                     chunk_groups=8, start_level=3, quad_leaf=False,
                     accept_margin=0.8),
    "quad5_g4": dict(eval_mode="pallas", group_size=4096, subgroups=64,
                     chunk_groups=8, start_level=3, quad_leaf=False,
                     accept_margin=0.8),
    "quad5_g8_pad1024": dict(eval_mode="pallas", group_size=8192,
                             subgroups=128, chunk_groups=8, start_level=3,
                             quad_leaf=False, accept_margin=0.8,
                             window_pad=1024, near_particle_cap=16384,
                             near_cell_cap=4096),
    "quad5_g8_pad3072": dict(eval_mode="pallas", group_size=8192,
                             subgroups=128, chunk_groups=8, start_level=3,
                             quad_leaf=False, accept_margin=0.8,
                             window_pad=3072),
    "quad5_g8_s256": dict(eval_mode="pallas", group_size=8192,
                          subgroups=256, chunk_groups=8, start_level=3,
                          quad_leaf=False, accept_margin=0.8),
    "quad5_g8_sl4": dict(eval_mode="pallas", group_size=8192, subgroups=128,
                         chunk_groups=8, start_level=4, quad_leaf=False,
                         accept_margin=0.8),
    # round-2g: the 1M defaults run with fb_spill ~1.7k/step (fb_cap=128
    # overflows; spilled cells degrade to PLAIN monopole, which may
    # include a softened self-interaction).  Price the cap that absorbs it.
    "quad7_fb1024": dict(eval_mode="pallas", group_size=8192, subgroups=128,
                         chunk_groups=8, start_level=3, quad_leaf=False,
                         accept_margin=0.8, fb_cap=1024),
    # (fb_cap=2048 probe dropped: fb1024 already prices the trade at 18%)
    # round-2h: mid-N tree depth — at 131k the L=7 leaf grid is 16x
    # underfilled (0.0625 particles/cell); L=6 shrinks every cell table 8x
    # and shortens the walk by one level, near lists grow 8x occupancy
    "quad8_131k_L7": dict(eval_mode="pallas", n=131072, group_size=4096,
                          subgroups=64, chunk_groups=8, start_level=3,
                          quad_leaf=False, accept_margin=0.8),
    "quad8_131k_L6": dict(eval_mode="pallas", n=131072, group_size=4096,
                          subgroups=64, chunk_groups=8, start_level=3,
                          quad_leaf=False, accept_margin=0.8, max_level=6),
    # round-2i (v8+ kernels): eval_tile granularity — smaller tiles skip
    # empty near-slab padding at finer grain (t1024 edged t2048 pre-v4)
    "quad9_base": dict(eval_mode="pallas", group_size=8192, subgroups=128,
                       chunk_groups=8, start_level=3, quad_leaf=False,
                       accept_margin=0.8),
    "quad9_t1024": dict(eval_mode="pallas", group_size=8192, subgroups=128,
                        chunk_groups=8, start_level=3, quad_leaf=False,
                        accept_margin=0.8, eval_tile=1024),
}


def emit(rec):
    rec["ts"] = time.time()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(rec, flush=True)


def main():
    done = set()
    if os.path.exists(OUT):
        with open(OUT) as f:
            for line in f:
                try:
                    done.add(json.loads(line)["name"])
                except Exception:
                    pass

    states = {}

    def get_state(n):
        if n not in states:
            pos, vel, mass = self_gravitating_disc(n - 1, seed=0)
            states[n] = ParticleState.create(
                pos, vel, mass, capacity=n, dtype=jnp.float32
            )
        return states[n]

    params = SimParams.create(
        dt=3e-2, g_soft=0.02, theta2=1.0, bounds_width=10.0, dtype=jnp.float32
    )

    for name, opts in CONFIGS.items():
        if name in done:
            continue
        opts = dict(opts)
        n_cfg = opts.pop("n", N)
        state = get_state(n_cfg)
        cfg = BHConfig(max_level=opts.pop("max_level", 7), **opts)
        fn = jax.jit(
            lambda p, m, cfg=cfg: bh_accel(
                p, m, params.bounds, params.theta2, params.g, params.g_soft, cfg
            )
        )
        tc0 = time.perf_counter()
        acc, stats = fn(state.pos, state.mass)
        float(acc[0, 0])
        compile_s = time.perf_counter() - tc0
        t0 = time.perf_counter()
        for _ in range(REPS):
            acc, stats = fn(state.pos, state.mass)
            float(acc[0, 0])
        ms = (time.perf_counter() - t0) / REPS * 1e3
        emit({
            "name": name,
            "n": n_cfg,
            "ms": round(ms, 1),
            "steps_per_s": round(1e3 / ms, 3),
            "compile_s": round(compile_s, 1),
            "near_fallback": int(stats["near_fallback"]),
            "frontier_fallback": int(stats["frontier_fallback"]),
            "accept_dropped": int(stats["accept_dropped"]),
            "fb_spill": int(stats["fb_spill"]),
        })


if __name__ == "__main__":
    main()
