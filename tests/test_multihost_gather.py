"""Real 2-process gather: the FVD stacks must see every host's shard.

Spawns two CPU processes wired through ``jax.distributed`` (the same
``initialize_distributed`` env-var path the entry points use) and asserts
``gather_across_hosts`` returns BOTH hosts' batches on both hosts — the
reference all-gathers predictions/GT across ranks before FVD
(``/root/reference/eval.py:226-231``, ``utils/compute_fvd.py:17-26``).
"""
from __future__ import annotations

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
import numpy as np
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["REPO"])
from seervideoldm_tpu.parallel.distributed import (
    gather_across_hosts, initialize_distributed, is_main_process,
)

initialize_distributed()
rank = jax.process_index()
assert jax.process_count() == 2, jax.process_count()
local = np.full((2, 3), rank, dtype=np.float32)  # rank-stamped batch
gathered = gather_across_hosts(local)
assert gathered.shape == (4, 3), gathered.shape
# axis-0 concat across ranks: first host's rows then second's
assert (gathered[:2] == 0).all() and (gathered[2:] == 1).all(), gathered
assert is_main_process() == (rank == 0)
print(f"rank {rank} gather OK", flush=True)
"""


@pytest.mark.slow
def test_two_process_gather(tmp_path):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    addr = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for rank in range(2):
        env = dict(os.environ, REPO=repo,
                   JAX_COORDINATOR_ADDRESS=addr,
                   JAX_NUM_PROCESSES="2", JAX_PROCESS_ID=str(rank))
        env.pop("XLA_FLAGS", None)
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"rank {rank} gather OK" in out
