"""Multi-process (simulated multi-host) distributed training test.

Spawns 2 separate processes, each with 2 virtual CPU devices;
jax.distributed.initialize assembles the 4-device global mesh and the sharded
PPO train step synchronizes gradients through cross-process collectives — the
same code path a TPU pod slice uses over ICI/DCN.
"""
import os
import pathlib
import socket
import subprocess
import sys

import pytest

_WORKER = pathlib.Path(__file__).resolve().parent.parent / "scripts" / "multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_procs(num_procs: int):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen([sys.executable, str(_WORKER), str(num_procs),
                          str(i), str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in range(num_procs)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"proc {i}: OK" in out, out[-2000:]
    # every process must agree on the synchronized losses bitwise — both the
    # no-traffic and the traffic-mode (shard-mapped tier conds) train steps
    for tag in ("OK pg_loss", "OK traffic_pg_loss"):
        losses = [[l for l in o.splitlines() if tag in l][0].split("=")[-1]
                  for o in outs]
        assert len(set(losses)) == 1, (tag, losses)


@pytest.mark.slow
@pytest.mark.parametrize("num_procs", [2, 4])
def test_multi_process_distributed_train_step(num_procs):
    """2- and 4-process jax.distributed runs (2 virtual devices each — the
    4-proc case assembles an 8-device global mesh across process
    boundaries): sharded PPO train step with cross-process gradient
    collectives, bitwise-equal synced losses on every process."""
    _run_procs(num_procs)
