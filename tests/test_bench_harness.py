"""bench.py's watchdog harness: the driver runs it unattended at round
end, so a wedged relay client or a crashing child must still end in one
JSON line (value 0.0 + error), and a healthy child's number must pass
through. Uses the OLS_BENCH_FAKE hook — no TPU involved."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(fake, extra_env=None, timeout=120):
    # Retry backoff exists to let the real relay settle — pure dead time
    # for fake children.
    env = dict(os.environ, OLS_BENCH_FAKE=fake, OLS_BENCH_RETRY_SLEEP="0")
    env.update(extra_env or {})
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, timeout=timeout,
    )
    line = p.stdout.strip().splitlines()[-1]
    return p.returncode, json.loads(line), p.stderr


def test_healthy_child_reports_fps():
    code, out, _ = _run("54.75")
    assert code == 0
    assert out["value"] == 54.75
    assert out["unit"] == "frames/s"
    assert abs(out["vs_baseline"] - 54.75 / 40.0) < 1e-3


def test_crashing_child_retries_then_reports_error():
    code, out, err = _run("crash")
    assert code == 1
    assert out["value"] == 0.0
    assert "error" in out
    # All attempts exercised, flagged as exits (not bogus wedge sleeps).
    assert err.count("exited with code") == 3
