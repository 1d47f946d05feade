"""Benchmark: SBP 256x192 inference throughput on one TPU chip vs the
PyTorch-CPU baseline (BASELINE.json metric).

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}
Diagnostics go to stderr.
"""

import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _preflight(timeout_s: float = 300.0):
    """Fail loudly instead of hanging forever when the TPU tunnel is
    unresponsive (observed: remote side wedges and the first device touch
    never returns; a hung bench run records nothing).  Touches the device
    from a side thread; if it doesn't come back in ``timeout_s``, prints
    an explicit error JSON line and exits -- a recorded infrastructure
    failure beats a silent hang."""
    import threading

    done = threading.Event()

    def touch():
        import jax
        import jax.numpy as jnp

        float(jax.jit(lambda v: v + 1)(jnp.float32(1)))
        done.set()

    t = threading.Thread(target=touch, daemon=True)
    t.start()
    if not done.wait(timeout_s):
        print(json.dumps({
            "metric": "sbp_256x192_inference_throughput",
            "value": 0.0,
            "unit": "images/sec/chip",
            "vs_baseline": 0.0,
            "error": f"device unresponsive: first dispatch did not "
                     f"complete within {timeout_s:.0f}s (tunnel down?)",
        }), flush=True)
        import os

        os._exit(2)
    log(f"preflight: device responsive")


def bench_tpu_sbp(batch: int = 256, iters: int = 20):
    """Timing rules learned on this tunnel backend (see verify skill):
    block_until_ready() does not actually block, and host<->device
    transfers are very slow -- so (1) inputs are created on device and
    materialized with a scalar readback before timing, (2) iterations are
    chained through a real tensor dependency inside one jitted fori_loop,
    and (3) the clock stops on a 4-byte scalar readback."""
    import functools

    import jax
    import jax.numpy as jnp

    from pytorch_pose_estimation_tpu.models import SBP

    model = SBP(num_keypoints=17, dtype=jnp.bfloat16)
    images = jax.random.uniform(jax.random.PRNGKey(0),
                                (batch, 256, 192, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), images)
    float(jnp.sum(images))  # materialize on device

    @functools.partial(jax.jit, static_argnums=(2,))
    def forward_n(variables, images, n):
        def body(_, carry):
            im, acc = carry
            out = model.apply(variables, im, train=False)
            # feed part of the output back into the input so no iteration
            # can be hoisted, elided, or overlapped past its dependency
            delta = jnp.pad(out[:, :, :, :3] * 1e-6,
                            ((0, 0), (0, 192), (0, 144), (0, 0)))
            return im + delta, acc + out[0, 0, 0, 0]
        _, acc = jax.lax.fori_loop(0, n, body, (images, jnp.float32(0)))
        return acc

    float(forward_n(variables, images, iters))  # compile + warm
    t0 = time.perf_counter()
    float(forward_n(variables, images, iters))  # scalar readback = sync
    dt = time.perf_counter() - t0
    ips = batch * iters / dt
    log(f"TPU SBP batch={batch}: {ips:.1f} img/s "
        f"({dt / iters * 1000:.2f} ms/batch) on {jax.devices()[0]}")
    return ips


def bench_torch_cpu_sbp(batch: int = 4, iters: int = 3):
    """Reference-architecture torch model on CPU (the baseline)."""
    import torch
    from torch import nn

    from pytorch_pose_estimation_tpu.models.darknet import STAGES

    layers = []
    c_in = 3
    for table in STAGES:
        for entry in table:
            if entry == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                c_out, k = entry
                layers += [nn.Conv2d(c_in, c_out, k, 1, (k - 1) // 2,
                                     bias=False),
                           nn.BatchNorm2d(c_out), nn.ReLU()]
                c_in = c_out
    for c_in_d in (1024, 512, 512):
        layers += [nn.ConvTranspose2d(c_in_d, 512, 4, 2, 1, bias=False),
                   nn.BatchNorm2d(512), nn.ReLU()]
    layers.append(nn.Conv2d(512, 17, 1, 1, bias=False))
    model = nn.Sequential(*layers).eval()

    x = torch.zeros(batch, 3, 256, 192)
    with torch.no_grad():
        model(x)  # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            model(x)
        dt = time.perf_counter() - t0
    ips = batch * iters / dt
    log(f"torch-CPU SBP batch={batch}: {ips:.1f} img/s")
    return ips


def bench_tpu_latency(iters: int = 50):
    """Batch-1 on-device forward latency (the reference's perf probe is a
    per-image ms print, inference_sbp.py:70-74)."""
    import functools

    import jax
    import jax.numpy as jnp

    from pytorch_pose_estimation_tpu.models import SBP
    from pytorch_pose_estimation_tpu.ops.pallas.decode import decode_sbp_pallas

    model = SBP(num_keypoints=17, dtype=jnp.bfloat16)
    image = jax.random.uniform(jax.random.PRNGKey(0), (1, 256, 192, 3),
                               jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), image)
    float(jnp.sum(image))

    @functools.partial(jax.jit, static_argnums=(2,))
    def fwd_decode_n(variables, image, n):
        def body(_, carry):
            im, acc = carry
            out = model.apply(variables, im, train=False)
            joints = decode_sbp_pallas(out, 192, 0.25, True)
            delta = jnp.zeros_like(im).at[0, 0, 0, 0].set(
                joints[0, 0, 2] * 1e-6)
            return im + delta, acc + joints[0, 0, 2]
        _, acc = jax.lax.fori_loop(0, n, body, (image, jnp.float32(0)))
        return acc

    float(fwd_decode_n(variables, image, iters))
    t0 = time.perf_counter()
    float(fwd_decode_n(variables, image, iters))
    ms = (time.perf_counter() - t0) / iters * 1000
    log(f"TPU SBP batch=1 forward+decode latency: {ms:.3f} ms/image")
    return ms


def bench_tpu_train(batch: int = 256, iters: int = 10):
    """Full fused train-step throughput (augment + target-gen + fwd/bwd +
    update) on device-resident uint8 batches.  The state threads a natural
    dependency between steps; the final loss readback syncs."""
    import jax
    import jax.numpy as jnp

    from pytorch_pose_estimation_tpu.models import SBP
    from pytorch_pose_estimation_tpu.optim import get_optimizer, yolo_lr
    from pytorch_pose_estimation_tpu.train import create_train_state
    from pytorch_pose_estimation_tpu.train.steps import make_sbp_steps

    model = SBP(num_keypoints=17, dtype=jnp.bfloat16)
    opt = get_optimizer("sgd", momentum=0.9, weight_decay=5e-3,
                        nesterov=True,
                        schedule=yolo_lr(1e-3, 100, [10 ** 6], [0.1]))
    train_step, _ = make_sbp_steps(model, opt, (256, 192), (64, 48), 17, 2.0)
    state = create_train_state(model, opt, (1, 256, 192, 3))

    key = jax.random.PRNGKey(0)
    batch_dev = {
        "image": (jax.random.uniform(key, (batch, 256, 192, 3)) * 255
                  ).astype(jnp.uint8),
        "joints": jax.random.uniform(key, (batch, 17, 2)) * 180,
        "joints_vis": jnp.ones((batch, 17), jnp.float32),
    }
    float(jnp.sum(batch_dev["joints"]))  # materialize

    state, loss = train_step(state, batch_dev, key)  # compile
    float(loss)
    t0 = time.perf_counter()
    for i in range(iters):
        state, loss = train_step(state, batch_dev, jax.random.fold_in(key, i))
    float(loss)
    dt = time.perf_counter() - t0
    ips = batch * iters / dt
    log(f"TPU SBP fused train step batch={batch}: {ips:.1f} img/s "
        f"({dt / iters * 1000:.1f} ms/step)")
    return ips


def _ensure_synth_corpus(root="./data/bench_synth", n_train=160):
    """Synthetic JPEG corpus on disk for the measured end-to-end numbers
    (no real COCO in this environment)."""
    import os

    ann = os.path.join(root, "annotations",
                       "person_keypoints_train2017.json")
    if not os.path.exists(ann):
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "tests"))
        from synth_fixture import make_dataset
        log(f"generating {n_train}-image synthetic corpus at {root}")
        make_dataset(root, "train2017", n_train, seed=0)
    return root, ann


def bench_e2e_train(batch: int = 64, steps: int = 20):
    """MEASURED end-to-end training throughput: native C++ JPEG loader ->
    host->device transfer -> fused train step, on real files.  This is the
    number the chip-capability figure from bench_tpu_train cannot give
    (the H2D path on this tunnel backend runs at ~20 MB/s, so this is
    transfer-bound here; on a co-located host it is loader-bound).

    Measurement hygiene (VERDICT r3 weak #2: 440 -> 180 img/s swings
    across rounds came from 4-step samples of a tunnel whose floor varies
    ~±50%): >=20 per-step wall times, each synced by a scalar readback,
    reported as mean±std together with the tunnel no-op floor measured in
    the SAME window so throughput variance can be attributed."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from pytorch_pose_estimation_tpu.data import SBPCOCODataModule
    from pytorch_pose_estimation_tpu.models import SBP
    from pytorch_pose_estimation_tpu.optim import get_optimizer, yolo_lr
    from pytorch_pose_estimation_tpu.train import create_train_state
    from pytorch_pose_estimation_tpu.train.steps import make_sbp_steps

    root, ann = _ensure_synth_corpus()
    dm = SBPCOCODataModule(
        train_path=ann, val_path=None, input_size=(256, 192),
        output_size=(64, 48), num_keypoints=17, sigma=2.0, workers=8,
        batch_size=batch, class_labels=[], img_dir=root)
    dm.setup()

    model = SBP(num_keypoints=17, dtype=jnp.bfloat16)
    opt = get_optimizer("sgd", momentum=0.9, weight_decay=5e-3,
                        nesterov=True,
                        schedule=yolo_lr(1e-3, 100, [10 ** 6], [0.1]))
    train_step, _ = make_sbp_steps(model, opt, (256, 192), (64, 48), 17,
                                   2.0)
    state = create_train_state(model, opt, (1, 256, 192, 3))
    key = jax.random.PRNGKey(0)

    def put(batch_np):
        return {
            "image": jax.device_put(jnp.asarray(batch_np["image"])),
            "joints": jax.device_put(
                jnp.asarray(batch_np["joints"], jnp.float32)),
            "joints_vis": jax.device_put(
                jnp.asarray(batch_np["joints_vis"], jnp.float32)),
        }

    @jax.jit
    def noop(x):
        return x + 1.0

    @jax.jit
    def h2d_probe(img_u8):
        # consumes the whole batch-sized uint8 array so the transfer
        # cannot be elided, returns a 4-byte scalar: floor + batch H2D
        return jnp.sum(img_u8.astype(jnp.uint32)).astype(jnp.float32)

    float(noop(jnp.float32(0)))  # compile

    loader = dm.train_loader()

    def batches():
        epoch = 0
        while True:
            loader.set_epoch(epoch)
            yield from loader
            epoch += 1

    it = batches()
    # warm-up batch: compile + first transfer
    warm = next(it)
    state, loss = train_step(state, put(warm), key)
    float(loss)
    float(h2d_probe(jnp.asarray(warm["image"])))  # compile
    step_s, floor_s, h2d_s, load_s = [], [], [], []
    for done in range(steps):
        t0 = time.perf_counter()
        batch_np = next(it)
        load_s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        state, loss = train_step(state, put(batch_np),
                                 jax.random.fold_in(key, done))
        float(loss)  # per-step sync
        step_s.append(time.perf_counter() - t0)
        # tunnel floor AND a batch-sized-H2D-only dispatch sampled in the
        # same window, interleaved with the real steps, so the step time
        # splits into floor + transfer + compute by measurement
        t0 = time.perf_counter()
        float(noop(jnp.float32(done)))
        floor_s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(h2d_probe(jnp.asarray(batch_np["image"])))
        h2d_s.append(time.perf_counter() - t0)
    step_s, floor_s = np.array(step_s), np.array(floor_s)
    h2d_s, load_s = np.array(h2d_s), np.array(load_s)
    ips = batch / step_s.mean()
    ms = 1000.0
    mb = batch_np["image"].nbytes / 2 ** 20
    log(f"E2E train (loader->H2D->step) batch={batch}: {ips:.1f} img/s "
        f"over {steps} steps (step {step_s.mean() * ms:.1f}"
        f"±{step_s.std() * ms:.1f} ms = floor {floor_s.mean() * ms:.1f}"
        f"±{floor_s.std() * ms:.1f} + {mb:.1f} MB-batch H2D "
        f"{(h2d_s.mean() - floor_s.mean()) * ms:.1f} + compute "
        f"{(step_s.mean() - h2d_s.mean()) * ms:.1f} ms; host loader "
        f"next() {load_s.mean() * ms:.1f}±{load_s.std() * ms:.1f} ms, "
        f"outside the timed step)")
    return ips, step_s, floor_s


def bench_e2e_train_cached(batch: int = 256, steps: int = 10):
    """MEASURED end-to-end training throughput through the device-resident
    cache (cache_device: true): real JPEG files decoded ONCE into HBM,
    then epochs run through make_epoch_runner -- ONE device dispatch per
    runner call, a lax.scan over the [S, B] index matrix with the
    shard-local gather folded into the train step
    (train/device_cache.py).  Measurement: one warm dispatch (compile),
    then a timed multi-epoch dispatch synced by a scalar readback of the
    last loss (which depends on every step through the carried state).
    This is the exact structure Trainer.fit uses when cache_device is on."""
    import jax

    import jax.numpy as jnp

    from pytorch_pose_estimation_tpu.data import SBPCOCODataModule
    from pytorch_pose_estimation_tpu.models import SBP
    from pytorch_pose_estimation_tpu.optim import get_optimizer, yolo_lr
    from pytorch_pose_estimation_tpu.parallel.mesh import make_mesh
    from pytorch_pose_estimation_tpu.train import (build_device_cache,
                                                   create_train_state)
    from pytorch_pose_estimation_tpu.train.steps import make_sbp_steps

    root, ann = _ensure_synth_corpus()
    dm = SBPCOCODataModule(
        train_path=ann, val_path=None, input_size=(256, 192),
        output_size=(64, 48), num_keypoints=17, sigma=2.0, workers=8,
        batch_size=batch, class_labels=[], img_dir=root)
    dm.setup()
    batch = min(batch, len(dm.train_db))  # corpus is ~2 persons/image

    mesh = make_mesh(jax.devices()[:1])
    t0 = time.perf_counter()
    cache = build_device_cache(dm, mesh, batch, seed=0)
    log(f"device cache: {cache.n_total} instances, "
        f"{cache.nbytes() / 2 ** 20:.0f} MB, built in "
        f"{time.perf_counter() - t0:.1f}s (one-time)")

    model = SBP(num_keypoints=17, dtype=jnp.bfloat16)
    opt = get_optimizer("sgd", momentum=0.9, weight_decay=5e-3,
                        nesterov=True,
                        schedule=yolo_lr(1e-3, 100, [10 ** 6], [0.1]))
    train_step, _ = make_sbp_steps(model, opt, (256, 192), (64, 48), 17,
                                   2.0)
    state = create_train_state(model, opt, (1, 256, 192, 3))
    key = jax.random.PRNGKey(0)

    runner = cache.make_epoch_runner(train_step)
    spe = cache.steps_per_epoch
    n_epochs = max(1, -(-steps // spe))  # epochs covering `steps` steps

    # TWO warm dispatches: the first compiles the scan runner, and on the
    # tunnel backend the first post-compile execution of a fresh
    # executable runs ~40x slow (one-time load artifact; measured
    # 212s compile -> 42.5s -> 1.07s -> 1.07s ... for this program);
    # every dispatch after that runs at steady state
    for w in range(2):
        state, key, losses = runner(
            state, key, range(w * n_epochs, (w + 1) * n_epochs))
        float(losses[-1])
    t0 = time.perf_counter()
    state, key, losses = runner(state, key,
                                range(2 * n_epochs, 3 * n_epochs))
    # the last loss depends on every prior step through the carried state
    float(losses[-1])
    dt = time.perf_counter() - t0
    done = n_epochs * spe
    ips = done * batch / dt
    log(f"E2E train via device cache batch={batch}: {ips:.1f} img/s "
        f"measured over {done} steps ({n_epochs} epochs/dispatch)")
    return ips


def bench_cli_latency(n: int = 16):
    """Per-image CLI inference latency INCLUDING the host->device transfer
    (the reference's probe times the loop body with H2D,
    inference_sbp.py:70-74).  Each image is synced with a scalar readback
    before the next starts.

    Also measures the tunnel floor (a no-op scalar dispatch + readback):
    on this backend the floor alone is ~35-55 ms, so the CLI number is
    floor-dominated — the device-side work is the separately-reported
    ~1.2 ms batch-1 latency, and the whole pipeline is already ONE fused
    uint8->joints dispatch (pytorch_pose_estimation_tpu/train/trainer.py
    ``load_sbp_predictor``), i.e. one tunnel round-trip per image."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from pytorch_pose_estimation_tpu.models import SBP
    from pytorch_pose_estimation_tpu.ops.decode import decode_sbp_fast

    model = SBP(num_keypoints=17, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(1),
                           jnp.zeros((1, 256, 192, 3)))

    @jax.jit
    def fwd_decode(variables, img_u8):
        images = img_u8.astype(jnp.float32) / 255.0
        out = model.apply(variables, images, train=False)
        return decode_sbp_fast(out, 192, 0.25, True)

    @jax.jit
    def noop(x):
        return x + 1.0

    @jax.jit
    def h2d_probe(img_u8):
        # consumes the whole 147 KB uint8 crop so the transfer cannot be
        # elided, returns a 4-byte scalar: dispatch floor + H2D only
        return jnp.sum(img_u8.astype(jnp.uint32)).astype(jnp.float32)

    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (n, 1, 256, 192, 3), np.uint8)
    float(fwd_decode(variables, jnp.asarray(imgs[0]))[0, 0, 2])  # compile
    float(noop(jnp.float32(0)))  # compile
    float(h2d_probe(jnp.asarray(imgs[0])))  # compile
    t0 = time.perf_counter()
    for i in range(n):
        float(noop(jnp.float32(i)))
    floor_ms = (time.perf_counter() - t0) / n * 1000
    t0 = time.perf_counter()
    for i in range(n):
        float(h2d_probe(jnp.asarray(imgs[i])))
    h2d_ms = (time.perf_counter() - t0) / n * 1000
    t0 = time.perf_counter()
    for i in range(n):
        joints = fwd_decode(variables, jnp.asarray(imgs[i]))
        float(joints[0, 0, 2])  # readback = sync
    ms = (time.perf_counter() - t0) / n * 1000
    log(f"CLI-path SBP batch=1 latency incl. H2D: {ms:.2f} ms/image = "
        f"floor {floor_ms:.2f} + transfer {h2d_ms - floor_ms:.2f} + "
        f"compute {ms - h2d_ms:.2f} ms (no-op dispatch floor and "
        f"147 KB-H2D-only dispatch measured in the same window)")
    return ms, floor_ms, h2d_ms


def bench_tpu_spm(batch: int = 32, iters: int = 10, max_persons: int = 30):
    """SPM 512->128 inference throughput + fused decode cost (the model
    family the reference never finished; no reference number exists)."""
    import functools

    import jax
    import jax.numpy as jnp

    from pytorch_pose_estimation_tpu.models import SPM
    from pytorch_pose_estimation_tpu.ops.decode import decode_spm_batch

    model = SPM(num_keypoints=17, dtype=jnp.bfloat16)
    images = jax.random.uniform(jax.random.PRNGKey(0),
                                (batch, 512, 512, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), images)
    float(jnp.sum(images))

    @functools.partial(jax.jit, static_argnums=(2, 3))
    def forward_n(variables, images, n, decode):
        def body(_, carry):
            im, acc = carry
            out = model.apply(variables, im, train=False)
            if decode:
                roots, joints = decode_spm_batch(out, 512, 2.0, 0.25,
                                                 True, max_persons)
                acc = acc + roots[0, 0, 2]
            else:
                acc = acc + out[0, 0, 0, 0]
            delta = jnp.pad(out[:, :, :, :3] * 1e-6,
                            ((0, 0), (0, 384), (0, 384), (0, 0)))
            return im + delta, acc
        _, acc = jax.lax.fori_loop(0, n, body, (images, jnp.float32(0)))
        return acc

    float(forward_n(variables, images, iters, False))  # compile
    t0 = time.perf_counter()
    float(forward_n(variables, images, iters, False))
    dt = time.perf_counter() - t0
    ips = batch * iters / dt
    log(f"TPU SPM 512 batch={batch} forward: {ips:.1f} img/s "
        f"({dt / iters * 1000:.2f} ms/batch)")

    # decode separately at a smaller batch: the 30-round bounded-iteration
    # NMS graph is big, and per-image decode cost is what matters
    db, di = 8, 5
    small = images[:db]
    float(forward_n(variables, small, di, True))  # compile
    t0 = time.perf_counter()
    float(forward_n(variables, small, di, True))
    dt_dec = time.perf_counter() - t0
    ips_dec = db * di / dt_dec
    log(f"TPU SPM 512 batch={db} forward+decode (max_persons="
        f"{max_persons}): {ips_dec:.1f} img/s "
        f"({dt_dec / di * 1000:.2f} ms/batch)")
    return ips


def bench_spm_max_persons(batch: int = 8, iters: int = 5):
    """Decode cost vs the static ``max_persons`` NMS bound (VERDICT r3
    item 2): the jitted greedy peak-suppression loop runs exactly
    max_persons rounds (ops/decode.py), so the knob trades decode cost
    for crowd capacity.  Sweeps {10, 30, 60} at SPM 512, reporting
    forward+decode ms/batch next to the forward-only baseline.

    Run: python bench.py spm_mp   (not part of the default driver run)
    """
    import functools

    import jax
    import jax.numpy as jnp

    from pytorch_pose_estimation_tpu.models import SPM
    from pytorch_pose_estimation_tpu.ops.decode import decode_spm_batch

    model = SPM(num_keypoints=17, dtype=jnp.bfloat16)
    images = jax.random.uniform(jax.random.PRNGKey(0),
                                (batch, 512, 512, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), images)
    float(jnp.sum(images))

    @functools.partial(jax.jit, static_argnums=(2, 3))
    def forward_n(variables, images, n, max_persons):
        def body(_, carry):
            im, acc = carry
            out = model.apply(variables, im, train=False)
            if max_persons:
                roots, joints = decode_spm_batch(out, 512, 2.0, 0.25,
                                                 True, max_persons)
                acc = acc + roots[0, 0, 2]
            else:
                acc = acc + out[0, 0, 0, 0]
            delta = jnp.pad(out[:, :, :, :3] * 1e-6,
                            ((0, 0), (0, 384), (0, 384), (0, 0)))
            return im + delta, acc
        _, acc = jax.lax.fori_loop(0, n, body, (images, jnp.float32(0)))
        return acc

    results = {}
    for mp in (0, 10, 30, 60):
        float(forward_n(variables, images, iters, mp))  # compile
        t0 = time.perf_counter()
        float(forward_n(variables, images, iters, mp))
        ms = (time.perf_counter() - t0) / iters * 1000
        results[mp] = ms
        tag = "forward only" if mp == 0 else f"max_persons={mp}"
        log(f"SPM 512 batch={batch} {tag}: {ms:.2f} ms/batch "
            f"({batch * 1000 / ms:.0f} img/s)")
    return results


def bench_hbm_budget(n_instances: int = 64115, batch: int = 256):
    """Load-test the full-COCO device-cache HBM claim (VERDICT r3 item 8):
    train/device_cache.py pitches 64,115 cached crops (~9.4 GB uint8) as
    fitting HBM alongside params/opt-state/workspace at batch 256.  This
    allocates a synthetic cache of exactly that shape ON DEVICE (generated
    there -- the 20 MB/s tunnel would take ~8 min to upload it), runs the
    fused train step on an index-gathered batch exactly like
    DeviceCache.make_epoch_runner does, and reports allocator stats.

    Run: python bench.py hbm   (not part of the default driver run)
    """
    import jax
    import jax.numpy as jnp

    from pytorch_pose_estimation_tpu.models import SBP
    from pytorch_pose_estimation_tpu.optim import get_optimizer, yolo_lr
    from pytorch_pose_estimation_tpu.train import create_train_state
    from pytorch_pose_estimation_tpu.train.steps import make_sbp_steps

    dev = jax.devices()[0]
    model = SBP(num_keypoints=17, dtype=jnp.bfloat16)
    opt = get_optimizer("sgd", momentum=0.9, weight_decay=5e-3,
                        nesterov=True,
                        schedule=yolo_lr(1e-3, 100, [10 ** 6], [0.1]))
    train_step, _ = make_sbp_steps(model, opt, (256, 192), (64, 48), 17,
                                   2.0)
    state = create_train_state(model, opt, (1, 256, 192, 3))

    # cache arrays generated on device, same dtypes/shapes as
    # build_device_cache stores (image uint8 NHWC, joints f32, vis f32)
    @jax.jit
    def make_cache(key):
        # one random tile + a per-instance offset: forces XLA to
        # materialize the full 9.4 GiB buffer (a bare broadcast would be
        # kept lazy) without generating 9.4 GiB of RNG intermediates
        tile = jax.random.randint(
            key, (256, 192, 3), 0, 255, jnp.int32).astype(jnp.uint8)
        offs = (jnp.arange(n_instances, dtype=jnp.uint32) % 251
                ).astype(jnp.uint8)
        return {
            "image": tile[None] + offs[:, None, None, None],
            "joints": jax.random.uniform(key, (n_instances, 17, 2)) * 180,
            "joints_vis": jnp.ones((n_instances, 17), jnp.float32),
        }

    cache = make_cache(jax.random.PRNGKey(0))
    float(cache["joints"][0, 0, 0])  # materialize
    cache_gb = sum(v.nbytes for v in cache.values()) / 2 ** 30

    @jax.jit
    def gathered_step(state, cache, idx, key):
        batch_dev = jax.tree_util.tree_map(lambda a: a[idx], cache)
        return train_step(state, batch_dev, key)

    idx = jnp.arange(batch, dtype=jnp.int32)
    state, loss = gathered_step(state, cache, idx, jax.random.PRNGKey(1))
    float(loss)  # compile + run once: peak includes fwd/bwd workspace
    state, loss = gathered_step(state, cache, idx + batch,
                                jax.random.PRNGKey(2))
    float(loss)

    stats = dev.memory_stats() or {}

    def gib(key):
        v = stats.get(key)
        return f"{v / 2 ** 30:.2f} GiB" if v is not None else "n/a"

    log(f"HBM budget: cache {n_instances} instances = {cache_gb:.2f} GiB; "
        f"after 2 gathered train steps at batch {batch}: "
        f"in_use={gib('bytes_in_use')}, peak={gib('peak_bytes_in_use')}, "
        f"limit={gib('bytes_limit')} on {dev}")
    return cache_gb, stats


def bench_angle_groups(batch: int = 256, iters: int = 10):
    """Fused-train-step cost as a function of the rotation angle-group
    count G (VERDICT r3 item 4: the G=8 default was justified only by a
    docstring claim).  G groups share one 3-shear rotation einsum each
    (ops/image.py rotate_shear3_grouped); G=batch is fully per-sample
    like the reference's A.Rotate (dataset/sbp_coco_dataset.py:220-232).

    Run: python bench.py angles   (not part of the default driver run)
    """
    import jax
    import jax.numpy as jnp

    from pytorch_pose_estimation_tpu.models import SBP
    from pytorch_pose_estimation_tpu.optim import get_optimizer, yolo_lr
    from pytorch_pose_estimation_tpu.train import create_train_state
    from pytorch_pose_estimation_tpu.train.steps import make_sbp_steps

    model = SBP(num_keypoints=17, dtype=jnp.bfloat16)
    opt = get_optimizer("sgd", momentum=0.9, weight_decay=5e-3,
                        nesterov=True,
                        schedule=yolo_lr(1e-3, 100, [10 ** 6], [0.1]))
    key = jax.random.PRNGKey(0)
    batch_dev = {
        "image": (jax.random.uniform(key, (batch, 256, 192, 3)) * 255
                  ).astype(jnp.uint8),
        "joints": jax.random.uniform(key, (batch, 17, 2)) * 180,
        "joints_vis": jnp.ones((batch, 17), jnp.float32),
    }
    float(jnp.sum(batch_dev["joints"]))  # materialize

    results = {}
    for g in (8, 16, 32, 64, 128, 256):
        train_step, _ = make_sbp_steps(
            model, opt, (256, 192), (64, 48), 17, 2.0,
            augment={"angle_groups": g})
        state = create_train_state(model, opt, (1, 256, 192, 3))
        state, loss = train_step(state, batch_dev, key)  # compile
        float(loss)
        t0 = time.perf_counter()
        for i in range(iters):
            state, loss = train_step(state, batch_dev,
                                      jax.random.fold_in(key, i))
        float(loss)
        ms = (time.perf_counter() - t0) / iters * 1000
        results[g] = ms
        log(f"angle groups G={g:4d}: {ms:.1f} ms/step "
            f"({batch * 1000 / ms:.0f} img/s) fused train step batch={batch}")
    return results


def main():
    _preflight()
    if len(sys.argv) > 1 and sys.argv[1] == "hbm":
        bench_hbm_budget()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "angles":
        bench_angle_groups()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "spm_mp":
        bench_spm_max_persons()
        return
    tpu_ips = bench_tpu_sbp()
    bench_tpu_latency()
    bench_tpu_train()
    bench_e2e_train()
    bench_e2e_train_cached()
    bench_cli_latency()
    bench_tpu_spm()
    cpu_ips = bench_torch_cpu_sbp()
    print(json.dumps({
        "metric": "sbp_256x192_inference_throughput",
        "value": round(tpu_ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(tpu_ips / cpu_ips, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
