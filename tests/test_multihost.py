"""REAL multi-host path: 2 OS processes under jax.distributed (CPU, Gloo
collectives, 2 local devices each) must train to the same state as a
single process (VERDICT r2 item 6 -- the one SURVEY §2.2 row whose
behavior only virtual single-process meshes had exercised).

Reference semantics being matched: torch DDP gradient equivalence +
DistributedSampler interleaved shards (reference: train_sbp.py:74,
dataset loaders via Lightning's sampler injection).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------------------
# loader process shards (DistributedSampler replacement, data/pipeline.py)
# ---------------------------------------------------------------------------

def _loader(n, process_index, process_count, shuffle=False, epoch=0):
    from pytorch_pose_estimation_tpu.data.pipeline import HostLoader

    ld = HostLoader(db=list(range(n)), sample_fn=lambda r, i, e: r,
                    batch_size=4, shuffle=shuffle, seed=7,
                    process_index=process_index,
                    process_count=process_count)
    ld.set_epoch(epoch)
    return ld


@pytest.mark.parametrize("n", [16, 17, 31])
def test_loader_shards_disjoint_and_cover(n):
    """Across processes the index shards are equal-length, their union
    covers every sample, and any overlap is only wraparound padding
    (< process_count extra samples total)."""
    for shuffle in (False, True):
        shards = [_loader(n, p, 2, shuffle=shuffle)._indices()
                  for p in range(2)]
        assert len(shards[0]) == len(shards[1])  # SPMD step-count sync
        union = np.concatenate(shards)
        assert set(union.tolist()) == set(range(n))  # full coverage
        # wraparound padding only: at most (target - n) duplicated ids
        target = -(-n // 2) * 2
        assert len(union) == target
        dup = len(union) - len(set(union.tolist()))
        assert dup == target - n


def test_loader_shards_same_permutation_across_processes():
    """Every process must draw the SAME epoch permutation (seed*1e6+epoch)
    before slicing -- otherwise shards overlap nondeterministically."""
    a = _loader(32, 0, 2, shuffle=True, epoch=3)._indices()
    b = _loader(32, 1, 2, shuffle=True, epoch=3)._indices()
    both = np.empty(32, np.int64)
    both[0::2], both[1::2] = a, b  # interleave back: idx[p::2] slicing
    assert set(both.tolist()) == set(range(32))
    assert len(set(both.tolist())) == 32  # disjoint, no padding at 32%2==0


# ---------------------------------------------------------------------------
# real 2-process distributed train step
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_two_process_train_matches_single(tmp_path):
    """Spawn 2 processes with jax.distributed.initialize on CPU (2 virtual
    devices each), run 2 full SBP train steps over the global 4-device
    mesh, and assert both processes' final params/batch_stats/opt_state
    match the single-process single-device run bit-for-tolerance."""
    env = dict(os.environ)
    # the conftest test-process XLA_FLAGS force 8 virtual devices; workers
    # set their own device count via jax_num_cpu_devices, so pass only the
    # scheduling/timeout flags through
    env["XLA_FLAGS"] = (
        "--xla_cpu_multi_thread_eigen=false"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
        " --xla_cpu_collective_call_terminate_timeout_seconds=900")
    # `python tests/_mh_worker.py` puts tests/ (not the repo root) on
    # sys.path; the package resolves via cwd only for -m / interactive
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # ephemeral coordinator port: a hardcoded one collides with stale
    # workers or concurrent runs on the same host
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    outs = [str(tmp_path / f"w{p}.npz") for p in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tests", "_mh_worker.py"),
         str(p), port, outs[p]],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT) for p in range(2)]
    try:
        logs = [pr.communicate(timeout=600)[0].decode() for pr in procs]
    except Exception:
        # a hung worker would otherwise leak both subprocesses (and keep
        # the rendezvous port busy for subsequent runs)
        for pr in procs:
            pr.kill()
        raise
    for pr, lg in zip(procs, logs):
        assert pr.returncode == 0, lg[-2000:]

    # single-process reference on one device, same module builds
    # everything; import via explicit file path so no sys.path entry
    # leaks into later tests in the session
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "_mh_common", os.path.join(REPO, "tests", "_mh_common.py"))
    mh = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mh)
    import jax

    model, optimizer, train_step = mh.build_model_and_step()
    from pytorch_pose_estimation_tpu.train import create_train_state

    state = create_train_state(model, optimizer, (1, mh.SIZE, mh.SIZE, 3))
    state, ref_loss = mh.run_steps(train_step, state, lambda x: x)
    ref_leaves = (mh.flat_leaves(state.params)
                  + mh.flat_leaves(state.batch_stats)
                  + mh.flat_leaves(state.opt_state))

    for p, path in enumerate(outs):
        got = np.load(path)
        np.testing.assert_allclose(got["loss"], ref_loss, rtol=1e-5)
        n = len([k for k in got.files
                 if k != "loss" and k.startswith("l")])
        assert n == len(ref_leaves)
        for i, ref in enumerate(ref_leaves):
            # same tolerance story as tests/test_parallel.py: sharded
            # reductions reorder the sums, momentum entries drift few ulp
            np.testing.assert_allclose(
                got[f"l{i}"], ref, rtol=2e-4, atol=1e-5,
                err_msg=f"proc {p} leaf {i}")
