"""Staged repro of the SPM-512 epoch program that crashes the TPU worker.

Each stage compiles + executes + syncs (scalar readback) and prints a
marker, so the crash site is the last missing marker.  Run:

    python /tmp/probe_spm.py [stage]

stages: cache, aug, fwd, step, scan3, scanN (N steps, e.g. scan156),
all (default)
"""
import os
import sys
import time

# runnable as `python tools/probe_spm_crash.py` (script dir is tools/,
# the package lives at the repo root)
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

stage = sys.argv[1] if len(sys.argv) > 1 else "all"


def want(name):
    return stage in ("all", name)


def mark(name, t0):
    print(f"[probe] {name} ok ({time.time() - t0:.1f}s)", flush=True)


B, S, K, P = 32, 512, 17, 10
OUT = 128

print("[probe] devices:", jax.devices(), flush=True)

# --- resident-cache HBM pressure: 5000 x 512x512x3 uint8 = 3.66 GiB,
# created ON device (tunnel upload would take minutes)
t0 = time.time()
cache_img = jax.jit(
    lambda: jnp.zeros((5000, S, S, 3), jnp.uint8))()
cache_j = jax.jit(lambda: jnp.zeros((5000, P, K, 2), jnp.float32))()
cache_c = jax.jit(lambda: jnp.zeros((5000, P, 1, 2), jnp.float32))()
float(jnp.sum(cache_img[0, 0, 0, 0]))  # materialize
mark(f"cache resident ({cache_img.nbytes / 2**30:.2f} GiB)", t0)

key = jax.random.PRNGKey(0)


def device_batch():
    img = jax.jit(lambda k: jax.random.randint(
        k, (B, S, S, 3), 0, 255, jnp.uint8))(key)
    pts = jax.jit(lambda k: jax.random.uniform(
        k, (B, P, K, 2), minval=0, maxval=S))(key)
    ctr = jax.jit(lambda k: jax.random.uniform(
        k, (B, P, 1, 2), minval=0, maxval=S))(key)
    float(jnp.sum(img[0, 0, 0, 0]))
    return img, pts, ctr


if want("aug"):
    from pytorch_pose_estimation_tpu.ops.image import augment_batch

    img, pts, ctr = device_batch()
    t0 = time.time()
    flat = jnp.concatenate([pts.reshape(B, P * K, 2),
                            ctr.reshape(B, P, 2)], axis=1)
    valid = jnp.ones(flat.shape[:2], jnp.float32)
    out, j2, v2 = augment_batch(
        key, img, flat, valid, (S, S), 30.0, (0.6, 1.0), (0.75, 1.33),
        (0.5, 0.2, 0.5, 0.1), 0.5)
    float(jnp.sum(out[0, 0, 0, 0]))
    mark("augment_batch 512 (geometric+clahe)", t0)

if want("fwd") or want("step") or stage.startswith("scan"):
    from pytorch_pose_estimation_tpu.models import SPM
    from pytorch_pose_estimation_tpu.optim import get_optimizer, yolo_lr
    from pytorch_pose_estimation_tpu.train import create_train_state
    from pytorch_pose_estimation_tpu.train.steps import make_spm_steps

    model = SPM(num_keypoints=K, dtype=jnp.bfloat16)
    opt = get_optimizer("sgd", momentum=0.9, weight_decay=5e-3,
                        nesterov=True,
                        schedule=yolo_lr(1e-3, 156, [20000], [0.1]))
    t0 = time.time()
    state = create_train_state(model, opt, (1, S, S, 3))
    mark("state init", t0)

if want("fwd"):
    img, _, _ = device_batch()
    t0 = time.time()

    @jax.jit
    def fwd(variables, im):
        return model.apply(variables, im.astype(jnp.float32) / 255.0,
                           train=False)

    y = fwd({"params": state.params, "batch_stats": state.batch_stats},
            img)
    float(jnp.sum(y[0, 0, 0, 0]))
    mark("SPM-512 forward b32", t0)

if want("step"):
    train_step, _ = make_spm_steps(
        model, opt, S, OUT, K, 1.0,
        augment={"geometric": True, "clahe_prob": 0.5},
        decode_conf_threshold=0.5, max_persons=P)
    img, pts, ctr = device_batch()
    t0 = time.time()
    state2, loss = train_step(
        state, {"image": img, "joints": pts, "centers": ctr}, key)
    print("[probe] step loss:", float(loss), flush=True)
    mark("SPM-512 fused train step b32 (geometric+clahe)", t0)

SCAN_N = 3
if stage.startswith("scan") and stage != "scan3":
    SCAN_N = int(stage[4:])

if want("scan3") or SCAN_N != 3:
    import functools

    train_step, _ = make_spm_steps(
        model, opt, S, OUT, K, 1.0,
        augment={"geometric": True, "clahe_prob": 0.5},
        decode_conf_threshold=0.5, max_persons=P)
    raw_step = getattr(train_step, "__wrapped__", train_step)
    names = ("centers", "image", "joints")
    data = {"image": cache_img, "joints": cache_j, "centers": cache_c}

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def _run(st, rng, idx_steps, *arrs):
        def body(carry, idx):
            s, kk = carry
            kk, sk = jax.random.split(kk)
            batch = {n: jnp.take(a, idx, axis=0)
                     for n, a in zip(names, arrs)}
            s, loss = raw_step(s, batch, sk)
            return (s, kk), loss

        (st, rng), losses = jax.lax.scan(body, (st, rng), idx_steps)
        return st, rng, losses

    idx = (jnp.arange(SCAN_N * B, dtype=jnp.int32) % 5000).reshape(
        SCAN_N, B)
    t0 = time.time()
    # fresh state: the step stage may have donated the shared one
    state_s = create_train_state(model, opt, (1, S, S, 3))
    state3, _, losses = _run(state_s, key, idx,
                             *(data[n] for n in names))
    print(f"[probe] scan{SCAN_N} last losses:",
          np.asarray(losses)[-3:], flush=True)
    mark(f"{SCAN_N}-step epoch-scan replica (gather from 3.66 GiB cache)",
         t0)

print("[probe] DONE", flush=True)
