"""Worker process for the multi-process localhost jax.distributed tests.

Run by tests/test_multihost.py:
    python tests/multihost_worker.py <process_id> <port> <outdir> \
        [num_processes=2] [local_devices=4]

Each process brings <local_devices> virtual CPU devices, forms the
process group over a localhost coordinator, builds the (data, model)
mesh, and drives the sharded serving Engine + mixed-model Router exactly
as a real multi-host deployment would (BASELINE config 4). Two
configurations are exercised by the tests:
- 2 procs x 4 devices: hybrid ICI/DCN mesh {data:4, model:2} — the model
  axis stays inside a process (ICI-like), data spans processes (DCN).
- 4 procs x 1 device: flat {data:2, model:2} mesh where BOTH axes span
  process boundaries — catches collective/topology assumptions the
  2-process case can't (TP collectives crossing hosts).
Results are written to <outdir>/img_<pid>_<rid>.npy for cross-process
comparison.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pid = int(sys.argv[1])
port = sys.argv[2]
outdir = sys.argv[3]
nproc = int(sys.argv[4]) if len(sys.argv) > 4 else 2
local_dev = int(sys.argv[5]) if len(sys.argv) > 5 else 4

os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={local_dev}")

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=nproc,
    process_id=pid
)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == nproc * local_dev, jax.devices()
assert len(jax.local_devices()) == local_dev

from tinyfusers_tpu import parallel  # noqa: E402
from tinyfusers_tpu.parallel import distributed as dist  # noqa: E402
from tinyfusers_tpu.pipeline import sd  # noqa: E402
from tinyfusers_tpu.serve import Engine, Router  # noqa: E402

# --- sync_decision: every process must see process 0's value -------------
v = dist.sync_decision(np.array([float(7 + pid)], np.float32))
assert v[0] == 7.0, v

mesh = dist.hybrid_mesh(model=2)
expect = {"data": nproc * local_dev // 2, "model": 2}
assert dict(mesh.shape) == expect, (mesh.shape, expect)

# --- sharded engine across both processes ---------------------------------
cfg = sd.TINY
params = jax.tree.map(np.asarray, sd.init(jax.random.key(0), cfg))
sharded = {k: parallel.shard_params(p, mesh) for k, p in params.items()}

with jax.set_mesh(mesh):
    eng = Engine(sharded, cfg, num_slots=4, mesh=mesh)
    ids = np.full((cfg.clip.max_length,), 3, np.int32)
    uids = np.zeros_like(ids)
    rids = []
    for i, steps in enumerate((2, 3, 2)):
        rids.append(eng.submit(eng.make_request(
            ids, uids, num_steps=steps, guidance=5.0, seed=i)))
    results = eng.run_until_idle()
assert sorted(r.request_id for r in results) == sorted(rids), results
for r in results:
    np.save(os.path.join(outdir, f"img_{pid}_{r.request_id}.npy"), r.image)

# --- mixed-model router: sharded engine + a second (local) family ---------
eng.reset()
eng_b = Engine(params, cfg, num_slots=1)
router = Router({"big": eng, "small": eng_b})
with jax.set_mesh(mesh):
    rids = []
    for i in range(3):
        rids.append(router.submit("big" if i % 2 == 0 else "small", ids, uids,
                                  num_steps=2, seed=10 + i))
    out = router.run_until_idle()
assert sorted(r.request_id for r in out) == sorted(rids), out
h = router.health()
assert h["big"]["failures"] == 0 and h["small"]["failures"] == 0
for r in out:
    np.save(os.path.join(outdir, f"router_{pid}_{r.request_id}.npy"), r.image)

with open(os.path.join(outdir, f"ok_{pid}"), "w") as f:
    f.write("ok")
print(f"worker {pid} ok")
