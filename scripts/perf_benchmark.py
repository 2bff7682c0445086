#!/usr/bin/env python
"""Benchmark sweep harness — the analog of the reference's perf_benchmark.py.

The reference sweeps (threads x N) over its binaries under ``perf stat`` and
writes ';'-delimited CSVs (reference perf_benchmark.py:100-124).  Here the
sweep is (engine x N) on the JAX backend; wall-clock comes from timed runs
and FLOP counts from XLA cost analysis (the TPU replacement for perf's
hardware counters, SURVEY.md §5).  The output uses the exact reference
column schema so the reference's analysis notebook applies unchanged:

    file_name;cpu_count;num_points;measurement;unit;task_name;percentage;
    run_time;variance;metric;metric_unit

Example:
    python scripts/perf_benchmark.py -o results.csv -p 1000 10000 100000 \
        --engines brute-pallas bh --steps 1000
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_POINTS = [
    10, 50, 100, 500, 1000, 3000, 5000, 10000, 20000, 30000, 40000, 50000,
    60000, 70000, 80000, 90000, 100000,
]  # the reference's sweep grid (perf_benchmark.py:35-53)


def bench_one(engine: str, n: int, steps: int, repeats: int, devices: int,
              chunk: int):
    import jax
    import jax.numpy as jnp
    from nbody_tpu.api import Simulation
    from nbody_tpu.scenes import self_gravitating_disc

    pos, vel, mass = self_gravitating_disc(n, seed=0)
    common = dict(
        dt=3e-2, g_soft=0.02, theta2=1.0, bounds_width=10.0,
        dtype=jnp.float32,
    )
    if devices > 1:
        # multi-chip column — the analog of the reference's thread sweep
        # (reference perf_benchmark.py cpu_count loop)
        from nbody_tpu.parallel import ShardedSimulation

        # ShardedSimulation now applies the capacity-adaptive preset (incl.
        # block-dual + the tuned cap/pad cuts) from the per-chip shard size
        # itself when no group keys are given
        sim = ShardedSimulation(
            pos, vel, mass, engine=engine, n_devices=devices, **common,
        )
    else:
        sim = Simulation(pos, vel, mass, engine=engine, **common)
    chunk = min(chunk or steps, steps)
    sim.compile(chunk)
    if steps % chunk:
        sim.compile(steps % chunk)
    # warm execution: the first run on the axon relay pays a one-time
    # program load that must not land in the timed region
    sim.run(chunk)
    sim.block_until_ready()
    sim.reset()

    walls = []
    for _ in range(repeats):
        sim.reset()
        t0 = time.perf_counter()
        left = steps
        while left > 0:
            k = min(chunk, left)
            sim.run(k)
            left -= k
        sim.block_until_ready()
        walls.append(time.perf_counter() - t0)

    # FLOPs per run from XLA cost analysis (of one chunk, scaled)
    flops = None
    try:
        import jax

        lowered_run = sim._run_c if sim.engine.stateful else sim._run
        args = (
            (sim._state, sim._carry, sim._params, chunk, None)
            if sim.engine.stateful
            else (sim._state, sim._params, chunk, None)
        )
        cost = lowered_run.lower(*args).compile().cost_analysis()
        if cost and "flops" in cost:
            flops = float(cost["flops"]) * (steps / chunk)
    except Exception:
        pass

    return walls, flops, sim.n_alive


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-o", "--output", default="nbody_tpu_benchmark.csv")
    p.add_argument("-p", "--points", type=int, nargs="*", default=None)
    p.add_argument("--engines", nargs="*",
                   default=["brute-pallas", "bh", "bh-lazy"])
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--chunk", type=int, default=100)
    p.add_argument("--bf-max", type=int, default=100000,
                   help="cap brute-force engines at this N (the reference "
                   "caps its brute binary at 3000, perf_benchmark.py:58)")
    p.add_argument("--devices", type=int, default=None,
                   help="shard over this many devices (ShardedSimulation); "
                   "default: single-device engines. The multi-chip analog "
                   "of the reference's thread-count sweep column.")
    args = p.parse_args(argv)

    import jax

    points = args.points or DEFAULT_POINTS
    devices = args.devices or 1

    rows = []
    for engine in args.engines:
        for n in points:
            if "brute" in engine and n > args.bf_max:
                continue
            print(f"[bench] {engine} N={n} ...", flush=True)
            walls, flops, n_alive = bench_one(
                engine, n, args.steps, args.repeats, devices, args.chunk
            )
            mean_w = statistics.mean(walls)
            var = (statistics.pstdev(walls) / mean_w * 100) if len(walls) > 1 else 0.0
            sps = args.steps / mean_w
            prefix = f"{engine};{devices};{n}"
            # task-clock row (ms), metric = CPUs utilized analog: devices
            rows.append(
                f"{prefix};{mean_w * 1e3:.2f};msec;task-clock;100.00;"
                f"{mean_w:.6f};{var:.2f}%;{devices:.3f};CPUs utilized"
            )
            # steps/s row
            rows.append(
                f"{prefix};{sps:.4f};steps/sec;throughput;100.00;"
                f"{mean_w:.6f};{var:.2f}%;;"
            )
            if flops is not None:
                gflops = flops / mean_w / 1e9
                rows.append(
                    f"{prefix};{flops:.0f};;fp_ops_xla_cost_analysis;100.00;"
                    f"{mean_w:.6f};{var:.2f}%;{gflops:.3f};GFLOPS"
                )
            rows.append(f"{prefix};{n_alive};;particles_alive_final;100.00;"
                        f"{mean_w:.6f};0.00%;;")
            print(f"[bench] {engine} N={n}: {sps:.2f} steps/s", flush=True)

    with open(args.output, "w") as f:
        f.write("\n".join(rows) + "\n")
    print(f"wrote {args.output} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
