"""CLI surface tests (subprocess, CPU backend) — parity with the reference's
headless binary behavior (src/main.rs:109-129)."""

import json
import os
import subprocess
import sys


ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args, timeout=240):
    return subprocess.run(
        [sys.executable, "-m", "nbody_tpu", "--cpu", *args],
        capture_output=True, text=True, cwd=ROOT, timeout=timeout,
    )


def test_headless_run_prints_steps_per_second():
    r = run_cli("-n", "200", "--steps", "10", "--engine", "brute")
    assert r.returncode == 0, r.stderr[-500:]
    assert "Running simulation without rendering..." in r.stdout
    assert "steps/second" in r.stdout
    assert "Elapsed:" in r.stdout


def test_json_output_with_energy():
    r = run_cli("-n", "200", "--steps", "10", "--engine", "brute",
                "--energy", "--json")
    assert r.returncode == 0, r.stderr[-500:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["n"] == 200
    assert out["steps"] == 10
    assert out["steps_per_second"] > 0
    assert out["energy_drift"] < 1e-2
    assert out["n_alive"] == 201


def test_invalid_engine_rejected():
    r = run_cli("--engine", "warp-drive")
    assert r.returncode != 0
    assert "invalid choice" in r.stderr


def test_save_checkpoint(tmp_path):
    path = str(tmp_path / "state.pkl")
    r = run_cli("-n", "100", "--steps", "5", "--engine", "brute",
                "--json", "--save", path)
    assert r.returncode == 0, r.stderr[-500:]
    assert os.path.exists(path)
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["checkpoint"] == path


def test_sharded_devices_flag():
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    r = subprocess.run(
        [sys.executable, "-m", "nbody_tpu", "--cpu", "-n", "300",
         "--steps", "5", "--engine", "brute", "--devices", "8", "--json"],
        capture_output=True, text=True, cwd=ROOT, timeout=400, env=env,
    )
    assert r.returncode == 0, r.stderr[-500:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["n_alive"] == 301


def test_scene_selection():
    r = run_cli("-n", "300", "--steps", "5", "--engine", "brute",
                "--scene", "plummer", "--box-width", "40", "--json")
    assert r.returncode == 0, r.stderr[-500:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["n_alive"] == 300  # plummer has no star particle
