"""2-process localhost jax.distributed test (VERDICT round-1 item 8 /
BASELINE config 4: continuous batching across >=2 hosts).

Spawns two worker processes (tests/multihost_worker.py), each with 4
virtual CPU devices, forming an 8-device {data:4, model:2} hybrid mesh
across the process group. The workers drive the sharded Engine and the
mixed-model Router end-to-end; this test asserts both finished and that
every decoded image is IDENTICAL across processes (the sync_decision
broadcast + functional slot injection make the jitted step's inputs
equal everywhere, so outputs must be bit-equal)."""
import glob
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(900)
def test_two_process_serving(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=720)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert os.path.exists(tmp_path / f"ok_{i}"), out[-4000:]

    # every decoded image must match bit-exactly across the two processes
    for kind in ("img", "router"):
        p0 = sorted(glob.glob(str(tmp_path / f"{kind}_0_*.npy")))
        p1 = sorted(glob.glob(str(tmp_path / f"{kind}_1_*.npy")))
        assert p0 and len(p0) == len(p1), (kind, p0, p1)
        for a, b in zip(p0, p1):
            assert os.path.basename(a).replace("_0_", "_1_") == \
                os.path.basename(b)
            ia, ib = np.load(a), np.load(b)
            np.testing.assert_array_equal(ia, ib, err_msg=a)
            assert ia.dtype == np.uint8 and ia.shape[-1] == 3
