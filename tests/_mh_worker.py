"""Worker process for tests/test_multihost.py: one of 2 real processes in
a jax.distributed CPU run (2 local devices each -> 4 global devices).

Usage: python tests/_mh_worker.py <process_id> <port> <out.npz>

Runs 2 SBP train steps over the global 4-device mesh (batch sharded on
'data', state replicated -- exactly what Trainer.fit does multi-host,
parallel/mesh.py) and dumps the final params / batch_stats / opt_state
leaves plus the loss for the parent to compare against the single-process
result.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

pid, port, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=2, process_id=pid)

import numpy as np  # noqa: E402

from pytorch_pose_estimation_tpu.parallel.mesh import (  # noqa: E402
    batch_sharding, make_mesh, replicated_sharding)
from pytorch_pose_estimation_tpu.train import create_train_state  # noqa: E402

import os  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _mh_common as mh  # noqa: E402

assert jax.process_count() == 2 and len(jax.devices()) == 4

model, optimizer, train_step = mh.build_model_and_step()
mesh = make_mesh()
b_sh = batch_sharding(mesh)
r_sh = replicated_sharding(mesh)

state = jax.device_put(
    create_train_state(model, optimizer, (1, mh.SIZE, mh.SIZE, 3)), r_sh)


def put_global(x):
    # each process contributes its contiguous half of the global batch
    n = x.shape[0]
    local = x[pid * n // 2:(pid + 1) * n // 2]
    return jax.make_array_from_process_local_data(b_sh, local, x.shape)


state, loss = mh.run_steps(train_step, state, put_global)

# replicated outputs: every process can read its addressable shard
leaves = (mh.flat_leaves(state.params) + mh.flat_leaves(state.batch_stats)
          + mh.flat_leaves(state.opt_state))
np.savez(out_path, loss=np.float32(loss),
         **{f"l{i}": v for i, v in enumerate(leaves)})
print(f"worker {pid}: done, loss={loss}", flush=True)
