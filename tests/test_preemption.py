"""Preemption-resilient training: kill-and-resume reproduces the loss curve.

train.py writes FULL training snapshots (params/opt_state/update + RNG key +
env state + obs) and auto-resumes when its --checkpoint path already exists,
so restarting the same command after a preemption continues the run exactly
(VERDICT round-1 item 9; SURVEY §5.3/§5.4).
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(updates, ck, seed=3, extra=()):
    cmd = [sys.executable, os.path.join(REPO, "train.py"),
           "--device", "cpu", "--num-envs", "8", "--agents", "1",
           "--rollout-len", "4", "--updates", str(updates),
           "--log-every", "1", "--seed", str(seed),
           "--checkpoint", ck, "--checkpoint-every", "2", *extra]
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    rows = {}
    for line in r.stdout.splitlines():
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "update" in d and "pg_loss" in d:
            rows[int(d["update"])] = d
    return rows, r.stdout


@pytest.mark.slow
def test_kill_and_resume_reproduces_loss_curve(tmp_path):
    ck_a = str(tmp_path / "ck_uninterrupted")
    ck_b = str(tmp_path / "ck_preempted")

    # uninterrupted 6-update run
    full, _ = _run(6, ck_a)
    assert sorted(full) == list(range(6))

    # "preempted" after 3 updates...
    part1, _ = _run(3, ck_b)
    assert sorted(part1) == [0, 1, 2]
    # ...then the SAME command restarted with the full budget: auto-resume
    part2, out2 = _run(6, ck_b)
    assert "auto-resuming" in out2
    assert sorted(part2) == [3, 4, 5], out2

    # the resumed curve must continue the uninterrupted one exactly
    for u in (3, 4, 5):
        for kname in ("pg_loss", "v_loss", "entropy"):
            if kname in full[u]:
                assert np.isclose(part2[u][kname], full[u][kname],
                                  rtol=0, atol=1e-6), (u, kname,
                                                       part2[u], full[u])

    # pre-preemption part matches too (same seed, same program)
    for u in (0, 1, 2):
        assert np.isclose(part1[u]["pg_loss"], full[u]["pg_loss"], atol=1e-6)

    # a third restart with the budget already met is a clean no-op
    done, out3 = _run(6, ck_b)
    assert not done and "covers all updates" in out3
