"""Run tests/test_walk_reuse.py in a FRESH interpreter.

XLA:CPU deterministically segfaults while compiling that module's quad
traverse_tree program in accumulated full-suite process state (observed
across rounds 3-4 in three different frames — cache deserialize, cache
put_executable_and_time, and plain backend_compile_and_load with the
persistent cache disabled — always the same triggering program, always
after ~160 prior tests, never standalone).  The poison is process state,
not the program or the cache, so the only structural fix available from
the outside is a fresh process: this wrapper subprocess-runs the module
(NBODY_WALK_REUSE_CHILD=1 lifts the skip installed in the module for
parent-suite collection) and asserts its result.  Costs ~70-90 s of
compile in the child; the module's five tests still run and report
their own pass/fail inside the child output, surfaced here on failure.
"""

import os
import subprocess
import sys

import pytest


def test_walk_reuse_module_in_fresh_interpreter(request):
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "test_walk_reuse.py")
    cmd = [sys.executable, "-m", "pytest", "-q", path]
    if request.config.getoption("--runslow"):
        cmd.append("--runslow")
    env = dict(os.environ)
    env["NBODY_WALK_REUSE_CHILD"] = "1"
    try:
        r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                           timeout=1500)
    except subprocess.TimeoutExpired as e:
        pytest.fail(f"walk-reuse child timed out: {e}")
    assert r.returncode == 0, (
        f"walk-reuse child failed (rc={r.returncode}):\n"
        f"--- stdout ---\n{r.stdout[-4000:]}\n"
        f"--- stderr ---\n{r.stderr[-2000:]}"
    )
