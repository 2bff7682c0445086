"""Smoke tests for the benchmark harness + analyzer (CPU, tiny workloads)."""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_perf_benchmark_and_analyze(tmp_path):
    csv = str(tmp_path / "bench.csv")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import sys; sys.argv=['x','-o', sys.argv[1], '-p','200','--engines',"
         "'brute','--steps','4','--repeats','1','--chunk','4'];"
         "sys.path.insert(0, '.');"
         "from scripts.perf_benchmark import main; main()",
         csv],
        capture_output=True, text=True, cwd=ROOT, timeout=300, env=env,
    )
    assert r.returncode == 0, r.stderr[-500:]
    lines = open(csv).read().strip().splitlines()
    assert any("task-clock" in l for l in lines)
    assert any("throughput" in l for l in lines)
    # schema: 11 ';'-separated fields like the reference CSVs
    assert all(len(l.split(";")) == 11 for l in lines), lines[0]

    out = str(tmp_path / "plots")
    r2 = subprocess.run(
        [sys.executable, "scripts/analyze_benchmarks.py", csv,
         "--names", "smoke", "--steps", "4", "--out", out],
        capture_output=True, text=True, cwd=ROOT, timeout=300,
    )
    assert r2.returncode == 0, r2.stderr[-500:]
    assert os.path.exists(os.path.join(out, "steps_per_second.png"))


def test_analyzer_reads_reference_csv():
    ref = "/root/reference/combined_rebound.csv"
    if not os.path.exists(ref):
        import pytest

        pytest.skip("reference CSVs not mounted")
    sys.path.insert(0, ROOT)
    from scripts.analyze_benchmarks import best_wall, load_csv

    w = best_wall(load_csv(ref))
    assert len(w) > 5
    assert (w["wall_s"] > 0).all()
