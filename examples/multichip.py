"""Multi-chip example: domain-decomposed Barnes-Hut over a device mesh.

On a real TPU pod slice this uses the physical chips; on any machine you
can demo the full sharded path with virtual CPU devices:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/multichip.py --cpu

Every per-particle array stays O(N/n_devices + halo) per chip — 8 chips
buy 8x capacity, not just 8x compute (nbody_tpu/parallel/domain.py; the
reference scales with shared-memory rayon threads only,
src/main.rs:46-50).  Engine presets (block-dual far field + tuned
near/window budgets) resolve automatically from the per-chip shard size.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

parser = argparse.ArgumentParser()
parser.add_argument("-n", type=int, default=65536)
parser.add_argument("--steps", type=int, default=10)
parser.add_argument("--devices", type=int, default=0,
                    help="0 = all visible devices")
parser.add_argument("--accurate", action="store_true",
                    help="accuracy profile (restores the round-2 window pad)")
parser.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (virtual devices need "
                    "XLA_FLAGS=--xla_force_host_platform_device_count=8)")
args = parser.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402  (after backend selection)

from nbody_tpu.parallel.sharded import ShardedSimulation  # noqa: E402
from nbody_tpu.scenes import self_gravitating_disc  # noqa: E402

n_dev = args.devices or len(jax.devices())
pos, vel, mass = self_gravitating_disc(args.n - 1, seed=0)
opts = dict(profile="accurate") if args.accurate else None
sim = ShardedSimulation(pos, vel, mass, engine="bh", n_devices=n_dev,
                        engine_options=opts,
                        dt=3e-2, g_soft=0.02, theta2=1.0,
                        dtype=jnp.float32)
cfg = sim._bh_config
print(f"devices={n_dev}  n={args.n}  per-chip shard ~{args.n // n_dev}")
print(f"resolved preset: group={cfg.group_size} block_dual={cfg.block_dual} "
      f"near_cap={cfg.near_particle_cap} window_pad={cfg.window_pad}")

import time  # noqa: E402

sim.compile(args.steps)
t0 = time.perf_counter()
sim.run(args.steps)
sim.block_until_ready()
dt = time.perf_counter() - t0
print(f"{args.steps} steps in {dt:.2f}s ({args.steps / dt:.2f} steps/s), "
      f"n_alive={sim.n_alive}, energy={sim.energy():.6e}")
