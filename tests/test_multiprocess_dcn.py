"""Multi-host (DCN) bring-up, actually multi-process.

SURVEY §5 commits the framework to multi-host via
``jax.distributed.initialize``; the rest of the suite validates
sharding on a single-process 8-device mesh.  This test spawns TWO real
OS processes, each owning one CPU device, and runs the sharded
retrieval path across the process boundary: cross-process mesh,
``host_local_array_to_global_array`` DB ingestion (each process
contributes only its slab), per-shard scan + all-gather top-k merge
(the collectives ride Gloo here, DCN on real pods).
"""

import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
WORKER = REPO / "tests" / "helpers" / "dcn_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_sharded_retrieval():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), str(port)],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"p{pid}: DCN sharded retrieval OK" in out, out
