"""Headless CLI — the analog of the reference benchmark binary
(``cargo run --no-default-features -- -t T -n N``, src/main.rs:41-129), with
the engine/scene/settings promoted from compile-time code edits
(src/main.rs:91-105) to real flags.

Example:
    python -m nbody_tpu -n 10000 --engine brute --steps 1000
prints elapsed time and steps/second exactly like src/main.rs:124-128.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

from nbody_tpu.api import Simulation
from nbody_tpu.engines import ENGINES
from nbody_tpu.scenes import SCENES


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="nbody_tpu", description="TPU-native N-body benchmark runner"
    )
    p.add_argument("-n", "--num-points", type=int, default=10000,
                   help="disc particle count (reference -n, src/main.rs:37-38)")
    p.add_argument("--steps", type=int, default=1000,
                   help="number of steps (reference hardcodes 1000, src/main.rs:117)")
    p.add_argument("--engine", default="auto",
                   choices=["auto"] + sorted(ENGINES),
                   help="force engine; 'auto' picks direct-sum vs tree by N "
                   "(the reference picks by editing src/main.rs:91-101)")
    p.add_argument("--scene", default="disc", choices=sorted(SCENES))
    p.add_argument("--integrator", default="leapfrog")
    p.add_argument("--dt", type=float, default=3e-2,
                   help="timestep (reference override src/main.rs:103)")
    p.add_argument("--g", type=float, default=1.0)
    p.add_argument("--g-soft", type=float, default=0.02,
                   help="softening (reference override src/main.rs:104)")
    p.add_argument("--theta2", type=float, default=1.0,
                   help="BH opening angle^2 (reference override src/main.rs:105)")
    p.add_argument("--box-width", type=float, default=10.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--f64", action="store_true", help="run in float64")
    p.add_argument("--devices", type=int, default=0,
                   help="shard particles over this many devices (0 = single)")
    p.add_argument("--energy", action="store_true",
                   help="report initial/final total energy and drift")
    p.add_argument("--energy-exact", action="store_true",
                   help="force the exact O(N^2) pair potential for --energy "
                   "(default 'auto' switches to the tree estimator above "
                   "262k, whose ~1e-4 bias can dominate small drifts)")
    p.add_argument("--chunk", type=int, default=0,
                   help="steps per fused scan chunk (0 = all in one scan)")
    p.add_argument("--json", action="store_true", help="emit one JSON line")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the JAX_PLATFORMS env var is "
                   "overridden by this image's TPU plugin)")
    p.add_argument("--profile", metavar="DIR", default=None,
                   help="write a jax.profiler trace of the timed run to DIR "
                   "(the TPU replacement for the reference's perf-stat "
                   "counters)")
    p.add_argument("--save", metavar="PATH", default=None,
                   help="checkpoint the final state to PATH")
    p.add_argument("--accurate", action="store_true",
                   help="BH accuracy profile: restore the round-2 window pad "
                   "(the measured drift carrier; block-dual and the near-cap "
                   "cut stay — both drift-cheap).  ~8%% slower at 1M for "
                   "~3.6x less energy drift at benchmark dt (VALIDATION.md "
                   "§10); bh engines only")
    p.add_argument("--dense", action="store_true",
                   help="BH steep-core profile (depth-8 leaf grid + doubled "
                   "walk budgets): for centrally-concentrated scenes like a "
                   "Plummer sphere — 7.6x better p99 force error there at "
                   "~0.47x the disc-scene step rate, measured at 1M "
                   "(VALIDATION.md §18); bh engines only")
    p.add_argument("--adaptive", action="store_true",
                   help="BH density-ADAPTIVE steep-core profile: per-octant "
                   "refined levels below the leaf grid, with the deep "
                   "(ml7+R3) vs tight-box (ml6+R4) stack resolved from the "
                   "scene's leaf occupancy (VALIDATION.md §19).  Passes the "
                   "disc accuracy envelope on a 1M Plummer core (p99 "
                   "1.7e-2 vs 0.147 for the best static stack) at ~0.25x "
                   "the disc-scene step rate; bh engines, single- or "
                   "multi-device (N < 2^24)")
    p.add_argument("--refine", type=int, default=0, metavar="R",
                   help="BH density-adaptive depth: materialize up to R "
                   "extra tree levels below the leaf grid for cells denser "
                   "than the near-field budget, and descend them in the "
                   "walk (BHConfig.refine_levels).  The per-octant answer "
                   "for steep cores a static grid cannot resolve "
                   "(VALIDATION.md §18/§19); bh engines, single- or "
                   "multi-device (N < 2^24)")
    p.add_argument("--walk-every", type=int, default=1, metavar="K",
                   help="BH temporal walk reuse: run the tree walk every K "
                   "steps, re-evaluating the frozen traversal topology at "
                   "current positions in between (single-device bh engines "
                   "only; 1 = classic rebuild-every-step)")
    p.add_argument("--compensated", action="store_true",
                   help="carry double-float (TwoSum) low words for pos/vel: "
                   "closes most of the f32 energy-drift gap to f64 at <1%% "
                   "step cost (single-device engines only)")
    return p


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float64 if args.f64 else jnp.float32

    pos, vel, mass = SCENES[args.scene](args.num_points, seed=args.seed)
    # ONE bounds definition for the whole CLI: the adaptive-stack resolver
    # and the Simulation constructors must see the same box or occupancy
    # is measured on the wrong region (advisor r4).  All current CLI
    # scenes are origin-centered; a future --box-center flag changes only
    # this line.
    bounds_center = (0.0, 0.0, 0.0)

    if args.engine == "auto" and args.devices and args.devices > 1:
        # ShardedSimulation has no auto mode; apply the api's crossover here
        from nbody_tpu.api import resolve_auto_engine

        args.engine = resolve_auto_engine(len(mass))

    eng_opts = {}
    if args.accurate:
        if not args.engine.startswith("bh"):
            raise SystemExit("--accurate applies to bh engines only")
        # explicit pad (not profile=) so the sharded BHConfig(**opts)
        # path accepts it too; same value as profile='accurate'
        eng_opts.update(window_pad=2048)
    if args.dense:
        if not args.engine.startswith("bh"):
            raise SystemExit("--dense applies to bh engines only")
        # explicit fields (not profile=) so the sharded BHConfig(**opts)
        # path accepts them too; same stack as profile='dense'
        from nbody_tpu.ops.traversal import DENSE_OVERRIDES

        eng_opts.update(DENSE_OVERRIDES)
    if args.adaptive:
        if not args.engine.startswith("bh") or args.engine == "bh-lazy":
            raise SystemExit("--adaptive applies to bh/bh-deep only")
        if args.walk_every > 1:
            raise SystemExit("--adaptive and --walk-every are exclusive "
                             "(refined rows have no cached-topology route)")
        if args.dense:
            raise SystemExit("--adaptive and --dense are exclusive "
                             "steep-core profiles (adaptive supersedes "
                             "dense where a single chip suffices)")
        # explicit fields (not profile=) for the same reason as --dense;
        # a following --refine R still overrides the refined depth.
        # The deep vs tight-box stack is resolved from THIS scene's leaf
        # occupancy (both pass the 5e-2 envelope in their regime,
        # plummer_1m.jsonl deep_* gate rows; VERDICT r3 #3)
        from nbody_tpu.ops.traversal import resolve_adaptive_overrides

        ov = resolve_adaptive_overrides(pos, bounds_center,
                                        args.box_width)
        eng_opts.update(ov)
        print(f"[nbody-tpu] --adaptive resolved to the "
              + ("deep" if ov["max_level"] == 7 else "tight-box")
              + f" stack (max_level={ov['max_level']}, "
              f"refine_levels={ov['refine_levels']})")
    if args.refine:
        if not args.engine.startswith("bh") or args.engine == "bh-lazy":
            raise SystemExit("--refine applies to bh/bh-deep only")
        if args.walk_every > 1:
            raise SystemExit("--refine and --walk-every are exclusive "
                             "(refined rows have no cached-topology route)")
        eng_opts.update(refine_levels=args.refine)
    if args.walk_every > 1:
        if not args.engine.startswith("bh") or args.engine == "bh-lazy":
            raise SystemExit("--walk-every applies to bh/bh-deep only")
        if args.devices and args.devices > 1:
            raise SystemExit("--walk-every is single-device only")
        eng_opts.update(walk_every=args.walk_every)

    if args.devices and args.devices > 1:
        from nbody_tpu.parallel.sharded import ShardedSimulation

        if args.compensated:
            raise SystemExit(
                "--compensated is single-device only (use --devices 1)"
            )
        sim = ShardedSimulation(
            pos, vel, mass,
            engine=args.engine,
            integrator=args.integrator,
            n_devices=args.devices,
            bounds_center=bounds_center,
            bounds_width=args.box_width,
            dtype=dtype,
            dt=args.dt, g=args.g, g_soft=args.g_soft, theta2=args.theta2,
            engine_options=eng_opts or None,
        )
    else:
        sim = Simulation(
            pos, vel, mass,
            engine=args.engine,
            integrator=args.integrator,
            bounds_center=bounds_center,
            bounds_width=args.box_width,
            dtype=dtype,
            dt=args.dt, g=args.g, g_soft=args.g_soft, theta2=args.theta2,
            compensated=args.compensated,
            engine_options=eng_opts or None,
        )

    e_method = "exact" if args.energy_exact else "auto"
    e0 = sim.energy(method=e_method) if args.energy else None

    # compile outside the timing window (the reference's timing window also
    # excludes setup, src/main.rs:113)
    chunk = args.chunk or args.steps
    sim.compile(chunk)
    if args.steps % chunk:
        sim.compile(args.steps % chunk)
    # warm-execute one chunk, then rewind: the first execution of a compiled
    # program pays a one-time load on the TPU runtime that must not land in
    # the timed region (compiling alone is not enough)
    sim.run(min(chunk, args.steps))
    sim.block_until_ready()
    sim.reset()

    if not args.json:
        print("Running simulation without rendering...")

    import contextlib

    prof = contextlib.nullcontext()
    if args.profile:
        from nbody_tpu.utils.profiling import trace

        prof = trace(args.profile)

    with prof:
        start = time.perf_counter()
        remaining = args.steps
        while remaining > 0:
            k = min(chunk, remaining)
            sim.run(k)
            remaining -= k
        sim.block_until_ready()
        elapsed = time.perf_counter() - start

    steps_per_second = args.steps / elapsed
    result = {
        "engine": getattr(getattr(sim, "engine", None), "name", args.engine),
        "n": args.num_points,
        "steps": args.steps,
        "elapsed_s": elapsed,
        "steps_per_second": steps_per_second,
        "n_alive": sim.n_alive,
    }
    if args.energy:
        e1 = sim.energy(method=e_method)
        resolved = (sim.energy_method(e_method)
                    if hasattr(sim, "energy_method") else e_method)
        result.update(energy_initial=e0, energy_final=e1,
                      energy_drift=abs((e1 - e0) / e0) if e0 else float("nan"),
                      energy_method=resolved)
    if args.save:
        # both Simulation and ShardedSimulation implement save()
        sim.save(args.save)
        result["checkpoint"] = args.save
    if args.json:
        print(json.dumps(result))
    else:
        print(f"Elapsed: {elapsed:.3f}s")
        print(f"Performance: {steps_per_second:.2f} steps/second")
        if args.energy:
            note = ("" if result["energy_method"] == "exact" else
                    " [tree estimator: drifts <~1e-4 may be estimator "
                    "bias — use --energy-exact to measure drift]")
            print(f"Energy: {e0:.9e} -> {result['energy_final']:.9e} "
                  f"(|drift| {result['energy_drift']:.3e}, "
                  f"{result['energy_method']}){note}")
    return result


if __name__ == "__main__":
    main()
