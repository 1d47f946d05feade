"""Pretrain the darknet19 classifier backbone (tiny-imagenet style).

Produces the checkpoint consumed via ``backbone_pretrained`` in the pose
configs (the reference loads such a checkpoint but ships no trainer for it,
reference: models/backbone/darknet.py:138-150).

    python train_classifier.py --cfg configs/darknet19_classifier.yaml
"""

import argparse
import os
import time

import numpy as np

from pytorch_pose_estimation_tpu.config import get_configs, make_model_name
from pytorch_pose_estimation_tpu.data.classifier_dataset import (
    ImageFolderDataModule,
)


def train(cfg):
    import jax
    import jax.numpy as jnp

    from pytorch_pose_estimation_tpu.models import darknet19
    from pytorch_pose_estimation_tpu.optim import build_optimizer_from_cfg
    from pytorch_pose_estimation_tpu.parallel import (batch_sharding,
                                                      make_mesh,
                                                      replicated_sharding,
                                                      select_devices)
    from pytorch_pose_estimation_tpu.train import create_train_state
    from pytorch_pose_estimation_tpu.train.checkpoint import (
        CheckpointManager, next_version_dir)
    from pytorch_pose_estimation_tpu.train.trainer import (
        apply_precision_config)

    dm = ImageFolderDataModule(
        train_dir=cfg["train_dir"], val_dir=cfg["val_dir"],
        input_size=cfg["input_size"], workers=cfg["workers"],
        batch_size=cfg["batch_size"])
    dm.setup()
    num_classes = cfg.get("num_classes") or len(dm.classes)

    precision = apply_precision_config(cfg)
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    model = darknet19(num_classes=num_classes, dtype=dtype)
    optimizer, schedule = build_optimizer_from_cfg(cfg)

    mesh = make_mesh(select_devices(cfg.get("devices", "auto")))
    sharding = batch_sharding(mesh)
    size = int(cfg["input_size"])
    state = create_train_state(model, optimizer, (1, size, size, 3),
                               rng=jax.random.PRNGKey(cfg.get("seed", 0)))
    state = jax.device_put(state, replicated_sharding(mesh))

    @jax.jit
    def train_step(state, images, labels, rng):
        images = images.astype(jnp.float32) / 255.0

        def loss_fn(params):
            logits, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng})
            onehot = jax.nn.one_hot(labels, num_classes)
            loss = -jnp.mean(jnp.sum(
                onehot * jax.nn.log_softmax(logits), axis=-1))
            return loss, (mutated["batch_stats"], logits)

        (loss, (stats, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        acc = jnp.mean((jnp.argmax(logits, -1) == labels)
                       .astype(jnp.float32))
        return state.apply_gradients(grads=grads, batch_stats=stats), \
            loss, acc

    @jax.jit
    def eval_step(state, images, labels):
        images = images.astype(jnp.float32) / 255.0
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, train=False)
        correct = (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
        return jnp.sum(correct)

    version_dir = next_version_dir(cfg.get("save_dir", "./saved"),
                                   make_model_name(cfg))
    ckpt = CheckpointManager(os.path.join(version_dir, "checkpoints"))
    rng = jax.random.PRNGKey(cfg.get("seed", 0))
    loader = dm.train_loader()
    for epoch in range(int(cfg["epochs"])):
        loader.set_epoch(epoch)
        t0, n, losses = time.time(), 0, []
        for batch in loader:
            rng, k = jax.random.split(rng)
            images = jax.device_put(batch["image"], sharding)
            labels = jax.device_put(batch["label"], sharding)
            state, loss, acc = train_step(state, images, labels, k)
            n += len(batch["label"])
            losses.append(float(loss))
        print(f"epoch {epoch}: loss={np.mean(losses):.4f} "
              f"({n / max(time.time() - t0, 1e-9):.1f} img/s)")

        if (epoch + 1) % int(cfg.get("check_val_every_n_epoch", 5)) == 0 \
                and dm.val_db:
            correct, total = 0.0, 0
            for batch in dm.val_loader():
                bs = len(batch["label"])
                if bs % len(mesh.devices):
                    pad = len(mesh.devices) - bs % len(mesh.devices)
                    batch["image"] = np.concatenate(
                        [batch["image"], batch["image"][:pad]], 0)
                    batch["label"] = np.concatenate(
                        [batch["label"], np.full(pad, -1,
                                                 batch["label"].dtype)], 0)
                images = jax.device_put(batch["image"], sharding)
                labels = jax.device_put(batch["label"], sharding)
                correct += float(eval_step(state, images, labels))
                total += bs
            acc = correct / max(total, 1)
            print(f"epoch {epoch}: val_acc={acc:.4f}")
            ckpt.save_epoch(state, epoch, val_loss=1.0 - acc)
        ckpt.save_last(state, epoch)
    return state


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", required=True, type=str, help="config file")
    args = parser.parse_args()
    train(get_configs(args.cfg))
