"""Training orchestration: the TPU-native replacement for pl.Trainer.

Reproduces the reference training contract (train_sbp.py:55-79):
* validation every ``trainer_options.check_val_every_n_epoch`` epochs,
* TensorBoard logs (train_loss / val_loss / val_mAP / lr-step),
* checkpoints under ``saved/<model>_<dataset>/version_N/checkpoints``
  with best-by-val_loss + last,
* early stopping on val_loss with patience 30 validation rounds,
* optional partial warm start from ``model_pretrained``.

TPU-native mechanics: one jitted step fuses augmentation + target
generation + fwd/bwd/update; the batch is sharded over a 1-D device mesh
(data parallelism over ICI); the host loader prefetches while the device
runs; eval decodes whole batches on device and pads ragged tails to keep
shapes static.
"""

from __future__ import annotations

import functools
import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import make_model_name
from ..eval.metrics import SBPmAPCOCO, SBPmAPPIS, SPMmAPCOCO
from ..models import SBP, SPM
from ..models.summary import print_summary
from ..optim import build_optimizer_from_cfg
from ..parallel.mesh import (batch_sharding, make_mesh,
                             maybe_init_distributed, replicated_sharding,
                             select_devices)
from .checkpoint import (CheckpointManager, load_pretrained,
                         next_version_dir, restore_checkpoint,
                         restore_checkpoint_flexible)
from .state import create_train_state
from .steps import make_sbp_steps, make_spm_steps

try:
    from tensorboardX import SummaryWriter
except ImportError:  # pragma: no cover
    SummaryWriter = None


def apply_precision_config(cfg: dict) -> str:
    """'bf16' (default): bf16 conv/matmul compute; 'fp32': fp32 with
    highest-precision MXU passes (needed for decode-level parity)."""
    precision = cfg.get("precision", "bf16")
    if precision == "fp32":
        jax.config.update("jax_default_matmul_precision", "highest")
    return precision


def build_model(cfg: dict, kind: str):
    precision = apply_precision_config(cfg)
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    remat = bool(cfg.get("remat", False))
    if kind == "spm":
        return SPM(num_keypoints=cfg["num_keypoints"], dtype=dtype,
                   remat=remat)
    return SBP(num_keypoints=cfg["num_keypoints"], dtype=dtype, remat=remat)


def build_metric(cfg: dict, kind: str):
    if kind == "spm":
        return SPMmAPCOCO(cfg["val_path"], cfg["input_size"], cfg["sigma"],
                          cfg["conf_threshold"],
                          cfg.get("max_persons", 30))
    cls = SBPmAPPIS if kind == "pis" else SBPmAPCOCO
    return cls(cfg["val_path"], cfg["input_size"], cfg["conf_threshold"])


def load_for_inference(cfg: dict, ckpt: Optional[str], kind: str = "sbp"):
    """Build the model, restore a checkpoint, and return (variables,
    jitted_forward) where forward maps uint8/float NHWC images -> logits."""
    model = build_model(cfg, kind)
    if kind == "spm":
        in_shape = (1, cfg["input_size"], cfg["input_size"], 3)
    else:
        in_shape = (1, cfg["input_size"][0], cfg["input_size"][1], 3)
    optimizer, _ = build_optimizer_from_cfg(cfg)
    state = create_train_state(model, optimizer, in_shape)
    if ckpt:
        state = restore_checkpoint_flexible(ckpt, state)
    # device_put ONCE and pass variables as a jit ARGUMENT: closing over
    # them would embed every param as an MLIR constant, and on the tunnel
    # backend lowering then reads all ~146 MB back host-side at ~20 MB/s
    # (observed as an hours-long "hang" in the inference CLIs)
    variables = jax.device_put(
        {"params": state.params, "batch_stats": state.batch_stats})

    @jax.jit
    def forward(variables, images):
        # uint8 pixel batches -> the training pipeline's Normalize(0, 1)
        images = images.astype(jnp.float32) / 255.0
        return model.apply(variables, images, train=False)

    return variables, functools.partial(forward, variables)


def load_sbp_predictor(cfg: dict, ckpt: Optional[str]):
    """Fused uint8-in / joints-out SBP predictor: normalize + forward +
    sigmoid-decode in ONE jitted dispatch, so the per-image CLI path pays
    a single H2D transfer and a single device round-trip (the reference's
    latency probe times this whole loop body, inference_sbp.py:70-74).

    Returns ``predict(images_u8_nhwc) -> joints [B, K, 3]`` in input-size
    pixel coordinates with the reference's sentinel scaling.
    """
    from ..ops.decode import decode_sbp_fast

    model = build_model(cfg, "sbp")
    in_shape = (1, cfg["input_size"][0], cfg["input_size"][1], 3)
    optimizer, _ = build_optimizer_from_cfg(cfg)
    state = create_train_state(model, optimizer, in_shape)
    if ckpt:
        state = restore_checkpoint_flexible(ckpt, state)
    # see load_for_inference: variables must be a jit argument, not a
    # closure constant, or tunnel-backend lowering stalls on param readback
    variables = jax.device_put(
        {"params": state.params, "batch_stats": state.batch_stats})
    input_w = int(cfg["input_size"][1])
    conf = float(cfg["conf_threshold"])

    @jax.jit
    def predict(variables, images):
        images = images.astype(jnp.float32) / 255.0
        logits = model.apply(variables, images, train=False)
        return decode_sbp_fast(logits, input_w, conf, True)

    return functools.partial(predict, variables)


class Trainer:
    def __init__(self, cfg: dict, data_module, kind: str = "sbp",
                 logging: bool = True):
        assert kind in ("sbp", "spm", "pis")
        self.cfg = cfg
        self.kind = kind
        self.dm = data_module

        # multi-host: init the coordination service if configured and give
        # this process its interleaved data shard
        proc_idx, proc_cnt = maybe_init_distributed(cfg)
        if data_module is not None and proc_cnt > 1:
            data_module.process_index = proc_idx
            data_module.process_count = proc_cnt

        self.devices = select_devices(cfg.get("devices", "auto"))
        self.mesh = make_mesh(self.devices)
        self.n_devices = len(self.devices)
        self.batch_sharding = batch_sharding(self.mesh)
        self.replicated = replicated_sharding(self.mesh)

        self.model = build_model(cfg, kind)
        self.optimizer, self.schedule = build_optimizer_from_cfg(cfg)

        # CLAHE placement: 'host' = cv2-on-crop (exact reference/
        # Albumentations semantics), 'device' = luma CLAHE fused into the
        # jitted train step (ops/image.py::clahe_luma), 'off' disables it
        clahe_mode = cfg.get("clahe", "host")
        # device-resident train cache serves batches that never touch the
        # host again -> per-sample CLAHE must run on device too
        self.cache_device = bool(cfg.get("cache_device"))
        if self.cache_device and proc_cnt > 1:
            print("cache_device is single-host; falling back to the "
                  "streaming loader with per-process shards")
            self.cache_device = False
        self._device_cache = None  # built lazily on first fit()
        if self.cache_device and clahe_mode == "host":
            clahe_mode = "device"
        if data_module is not None and clahe_mode != "host" and \
                hasattr(data_module, "clahe_prob"):
            data_module.clahe_prob = 0.0
        augment = {"clahe_prob": 0.5} if clahe_mode == "device" else {}
        # user overrides: rotate_limit / scale_range / ratio_range /
        # color_jitter (defaults reproduce the reference's Albumentations
        # parameters; e.g. upper-body datasets want milder crops so RRC
        # doesn't regularly remove every keypoint)
        augment.update(cfg.get("augment_options") or {})

        if kind == "spm":
            in_shape = (1, cfg["input_size"], cfg["input_size"], 3)
            spm_augment = dict(augment)
            if cfg.get("augment_geometric"):
                spm_augment["geometric"] = True
            self.train_step, self.eval_step = make_spm_steps(
                self.model, self.optimizer, cfg["input_size"],
                cfg["output_size"], cfg["num_keypoints"], cfg["sigma"],
                augment=spm_augment,
                decode_conf_threshold=cfg["conf_threshold"],
                max_persons=cfg.get("max_persons", 30))
        else:
            in_shape = (1, cfg["input_size"][0], cfg["input_size"][1], 3)
            self.train_step, self.eval_step = make_sbp_steps(
                self.model, self.optimizer, cfg["input_size"],
                tuple(cfg["output_size"]), cfg["num_keypoints"],
                cfg["sigma"], augment=augment,
                decode_conf_threshold=cfg["conf_threshold"])

        self.state = create_train_state(
            self.model, self.optimizer, in_shape,
            rng=jax.random.PRNGKey(cfg.get("seed", 0)))
        self.state = jax.device_put(self.state, self.replicated)

        self._warm_start_backbone(cfg.get("backbone_pretrained"))

        if cfg.get("model_pretrained"):
            path = cfg["model_pretrained"]
            if os.path.exists(path):
                self.state = load_pretrained(self.state, path)
                self.state = jax.device_put(self.state, self.replicated)
                print(f"warm-started from {path}")
            else:
                print(f"model_pretrained not found, skipping: {path}")

        self.metric = build_metric(cfg, kind) if cfg.get("val_path") and \
            os.path.exists(cfg["val_path"]) else None

        self.logging = logging
        self.version_dir = None
        self.writer = None
        self.ckpt = None
        if logging:
            self.version_dir = next_version_dir(
                cfg.get("save_dir", "./saved"), make_model_name(cfg))
            self.ckpt = CheckpointManager(
                os.path.join(self.version_dir, "checkpoints"))
            if SummaryWriter is not None:
                self.writer = SummaryWriter(self.version_dir)

        self.global_step = 0
        self.log_every = int(cfg.get("log_every_n_steps", 50))
        # profiling window [start_step, end_step) -> jax.profiler trace into
        # the run's version dir (replaces the reference's per-image timing
        # prints as the perf-observability surface, SURVEY.md section 5)
        prof = (cfg.get("trainer_options") or {}).get("profile_steps")
        self.profile_steps = tuple(prof) if prof else None
        self._profiling = False

    # ------------------------------------------------------------------
    def _warm_start_backbone(self, bp) -> None:
        """Overlay backbone params from either layout the framework
        produces/consumes:
        * 'tiny-imagenet': the reference's torch classifier checkpoint at
          ./ckpt/darknet19-tiny-imagenet.ckpt
          (reference: models/backbone/darknet.py:138-150);
        * a directory path: an orbax classifier checkpoint from
          train_classifier.py (stages at the top level)."""
        if not bp:
            return
        if bp == "tiny-imagenet":
            ckpt_path = os.path.join(os.getcwd(),
                                     "ckpt/darknet19-tiny-imagenet.ckpt")
            if not os.path.exists(ckpt_path):
                print(f"backbone_pretrained ckpt not found: {ckpt_path}")
                return
            from ..models.torch_import import import_torch_checkpoint

            tree = import_torch_checkpoint(ckpt_path)
            src = bp = ckpt_path
        elif os.path.isdir(bp):
            import orbax.checkpoint as ocp

            tree = ocp.PyTreeCheckpointer().restore(os.path.abspath(bp))
            src = bp
        else:
            print(f"backbone_pretrained not found, skipping: {bp}")
            return

        from ..models.darknet import STAGE_NAMES
        from .checkpoint import _merge

        if "backbone" in tree["params"]:
            bb = tree["params"]["backbone"]
            bb_s = tree["batch_stats"]["backbone"]
        else:  # classifier layout: stages at the top level
            bb = {k: v for k, v in tree["params"].items()
                  if k in STAGE_NAMES}
            bb_s = {k: v for k, v in tree["batch_stats"].items()
                    if k in STAGE_NAMES}
        params = dict(self.state.params)
        stats = dict(self.state.batch_stats)
        params["backbone"] = _merge(params["backbone"], bb)
        stats["backbone"] = _merge(stats["backbone"], bb_s)
        self.state = self.state.replace(params=params, batch_stats=stats)
        print(f"backbone warm-started from {src}")

    def summary(self):
        if self.kind == "spm":
            shape = (1, self.cfg["input_size"], self.cfg["input_size"], 3)
        else:
            shape = (1, self.cfg["input_size"][0],
                     self.cfg["input_size"][1], 3)
        print_summary(self.model, shape)

    def _log(self, tag: str, value: float, step: int):
        if self.writer is not None:
            self.writer.add_scalar(tag, value, step)

    def _device_batch(self, batch: dict, keys):
        return {k: jax.device_put(batch[k], self.batch_sharding)
                for k in keys if k in batch}

    def _pad_to_devices(self, batch: dict, keys):
        """Pad the ragged tail batch up to a multiple of the mesh size."""
        n = len(batch["image"])
        m = -(-n // self.n_devices) * self.n_devices
        if m == n:
            return batch, n
        out = dict(batch)
        for k in keys:
            if k in batch and isinstance(batch[k], np.ndarray):
                pad = np.repeat(batch[k][:1], m - n, axis=0)
                out[k] = np.concatenate([batch[k], pad], axis=0)
        return out, n

    # ------------------------------------------------------------------
    def _find_auto_resume(self) -> Optional[str]:
        """Highest-step finalized checkpoint across version dirs
        (preemption recovery).  'last' may be missing or half-written (a
        kill mid-save leaves only ``*.orbax-checkpoint-tmp``), so fall
        back to the newest ``epoch=E-step=S`` checkpoint; ties prefer
        'last'.  'best' is excluded (resuming from it would silently
        rewind training to the best-val epoch)."""
        base = os.path.join(self.cfg.get("save_dir", "./saved"),
                            make_model_name(self.cfg))
        if not os.path.isdir(base):
            return None
        candidates = []  # (step, prefer_last, path)
        for v in os.listdir(base):
            cdir = os.path.join(base, v, "checkpoints")
            if not v.startswith("version_") or not os.path.isdir(cdir):
                continue
            for name in os.listdir(cdir):
                path = os.path.join(cdir, name)
                if not os.path.isdir(path) or name.endswith(
                        ".orbax-checkpoint-tmp"):
                    continue
                if name == "last":
                    meta = self._read_ckpt_meta(path)
                    candidates.append(
                        (int(meta.get("step", 0)), 1, path))
                elif name.startswith("epoch=") and "step=" in name:
                    try:
                        step = int(name.split("step=")[1])
                    except ValueError:
                        continue
                    candidates.append((step, 0, path))
        if not candidates:
            return None
        return max(candidates)[2]

    @staticmethod
    def _read_ckpt_meta(path: str) -> dict:
        meta_path = path + ".meta.json"
        try:
            with open(meta_path) as f:
                return json.load(f)
        except (OSError, ValueError):
            return {}

    def fit(self, resume: Optional[str] = None):
        cfg = self.cfg
        if resume == "auto":
            resume = self._find_auto_resume()
            print(f"auto-resume: {resume or 'no checkpoint found'}")
        start_epoch = 0
        if resume:
            self.state = restore_checkpoint(resume, self.state)
            self.state = jax.device_put(self.state, self.replicated)
            # continue the run, don't restart it: the epoch counter comes
            # from the checkpoint's meta sidecar (written by save_last /
            # save_epoch), the step counter from the restored state itself
            # (state.step == number of optimizer updates == global step).
            # Without this the loop re-ran epochs 0..N-1 on top of the
            # restored params, overwriting earlier epoch=E checkpoints and
            # restarting the TB step axis.
            meta = self._read_ckpt_meta(resume)
            if "epoch" in meta:
                start_epoch = int(meta["epoch"]) + 1
            self.global_step = int(self.state.step)
            print(f"resuming at epoch {start_epoch} "
                  f"(global step {self.global_step})")
        trainer_options = cfg.get("trainer_options", {}) or {}
        val_every = int(trainer_options.get("check_val_every_n_epoch", 1))
        patience = int(cfg.get("early_stop_patience", 30))
        max_epochs = int(cfg["epochs"])

        # Lightning-style sanity validation: run N val batches before
        # training so eval-path breakage surfaces immediately
        sanity = int(trainer_options.get("num_sanity_val_steps", 0))
        if sanity > 0 and self.dm.val_db:
            eval_keys = (("image", "joints", "centers")
                         if self.kind == "spm"
                         else ("image", "joints", "joints_vis"))
            for i, batch in enumerate(self.dm.val_loader()):
                if i >= sanity:
                    break
                padded, n_real = self._pad_to_devices(batch, eval_keys)
                self.eval_step(self.state,
                               self._device_batch(padded, eval_keys))
            print(f"sanity validation: {sanity} batch(es) ok")

        train_keys = (("image", "joints", "centers") if self.kind == "spm"
                      else ("image", "joints", "joints_vis"))
        rng = jax.random.PRNGKey(cfg.get("seed", 0))
        if start_epoch:
            # resumed runs draw a fresh augmentation stream instead of
            # replaying the epochs-0..N-1 randomness
            rng = jax.random.fold_in(rng, start_epoch)

        best_val = float("inf")
        bad_rounds = 0
        device_cache = None
        train_loader = None
        if self.cache_device:
            if self._device_cache is None:
                from .device_cache import build_device_cache

                t0 = time.time()
                self._device_cache = build_device_cache(
                    self.dm, self.mesh, self.dm.batch_size,
                    seed=cfg.get("seed", 0), keys=train_keys)
                print(f"device cache: {self._device_cache.n_total} "
                      f"instances, "
                      f"{self._device_cache.nbytes() / 2 ** 20:.0f} MB in "
                      f"HBM, {self._device_cache.steps_per_epoch} "
                      f"steps/epoch (built in {time.time() - t0:.1f}s)")
            device_cache = self._device_cache
        else:
            train_loader = self.dm.train_loader()

        # cache_scan: false keeps the HBM-resident cache but dispatches one
        # train step at a time through epoch_batches instead of compiling
        # the whole-epoch lax.scan -- the fallback when the fused epoch
        # program is too expensive to compile (the scan runner is the
        # default and is bit-identical in trajectory)
        use_scan = bool(cfg.get("cache_scan", True))
        epoch_runner = None
        for epoch in range(start_epoch, max_epochs):
            if device_cache is not None and not use_scan:
                t0 = time.time()
                epoch_losses = []
                for batch in device_cache.epoch_batches(epoch):
                    rng, step_key = jax.random.split(rng)
                    self.state, loss = self.train_step(self.state, batch,
                                                       step_key)
                    self.global_step += 1
                    epoch_losses.append(loss)
                    if self.global_step % self.log_every == 0:
                        self._log("train_loss", float(loss),
                                  self.global_step)
                        self._log("lr-step", float(self.schedule(
                            self.global_step - 1)), self.global_step)
                dt = time.time() - t0
                n_img = len(epoch_losses) * device_cache.batch_size
                mean_loss = float(jnp.mean(jnp.stack(epoch_losses))) if \
                    epoch_losses else float("nan")
                print(f"epoch {epoch}: train_loss={mean_loss:.4f} "
                      f"({n_img / max(dt, 1e-9):.1f} img/s)", flush=True)
            elif device_cache is not None:
                # one dispatch per epoch: lax.scan over the epoch's index
                # matrix with the shard-local gather folded into the step
                # (train/device_cache.py::make_epoch_runner); bit-identical
                # parameter trajectory to the per-step loop below
                if epoch_runner is None:
                    epoch_runner = device_cache.make_epoch_runner(
                        self.train_step,
                        chunk_steps=cfg.get("scan_steps_per_dispatch"))
                t0 = time.time()
                profiling = bool(
                    self.profile_steps and not self._profiling and
                    self.global_step <= self.profile_steps[0] <
                    self.global_step + device_cache.steps_per_epoch)
                if profiling:  # the whole epoch dispatch is the trace unit
                    jax.profiler.start_trace(
                        self.version_dir or cfg.get("save_dir", "./saved"))
                self.state, rng, losses = epoch_runner(self.state, rng,
                                                       [epoch])
                losses = np.asarray(losses)  # syncs the epoch dispatch
                if profiling:
                    jax.profiler.stop_trace()
                n_img = losses.size * device_cache.batch_size
                for lv in losses:
                    self.global_step += 1
                    if self.global_step % self.log_every == 0:
                        self._log("train_loss", float(lv), self.global_step)
                        self._log("lr-step", float(self.schedule(
                            self.global_step - 1)), self.global_step)
                dt = time.time() - t0
                mean_loss = (float(losses.mean()) if losses.size
                             else float("nan"))
                print(f"epoch {epoch}: train_loss={mean_loss:.4f} "
                      f"({n_img / max(dt, 1e-9):.1f} img/s)")
            else:
                train_loader.set_epoch(epoch)
                epoch_losses = []
                t0 = time.time()
                n_img = 0
                for batch in train_loader:
                    if self.profile_steps and \
                            self.global_step == self.profile_steps[0] and \
                            not self._profiling:
                        jax.profiler.start_trace(
                            self.version_dir or
                            cfg.get("save_dir", "./saved"))
                        self._profiling = True
                    rng, step_key = jax.random.split(rng)
                    dev_batch = self._device_batch(batch, train_keys)
                    self.state, loss = self.train_step(
                        self.state, dev_batch, step_key)
                    self.global_step += 1
                    if self._profiling and \
                            self.global_step >= self.profile_steps[1]:
                        jax.profiler.stop_trace()
                        self._profiling = False
                    n_img += len(batch["image"])
                    # keep the device scalar (no host sync per step); the
                    # epoch mean below is then the exact mean over ALL
                    # steps, not a every-log_every-th sample
                    epoch_losses.append(loss)
                    if self.global_step % self.log_every == 0:
                        self._log("train_loss", float(loss),
                                  self.global_step)
                        self._log("lr-step", float(self.schedule(
                            self.global_step - 1)), self.global_step)
                dt = time.time() - t0
                mean_loss = float(jnp.mean(jnp.stack(epoch_losses))) if \
                    epoch_losses else float("nan")
                print(f"epoch {epoch}: train_loss={mean_loss:.4f} "
                      f"({n_img / max(dt, 1e-9):.1f} img/s)")

            val_loss = None
            if (epoch + 1) % val_every == 0 and self.dm.val_db:
                val_loss, val_map = self.validate(verbose=False)
                self._log("val_loss", val_loss, self.global_step)
                self._log("val_mAP", val_map, self.global_step)
                print(f"epoch {epoch}: val_loss={val_loss:.4f} "
                      f"val_mAP={val_map:.4f}")
                if self.ckpt and (epoch + 1) % int(
                        cfg.get("save_freq", 1)) == 0:
                    self.ckpt.save_epoch(self.state, epoch, val_loss)
                if val_loss < best_val - 1e-12:
                    best_val = val_loss
                    bad_rounds = 0
                else:
                    bad_rounds += 1
            if self.ckpt and (epoch + 1) % int(
                    cfg.get("save_last_every_n_epochs", 1)) == 0:
                self.ckpt.save_last(self.state, epoch, val_loss)
            if bad_rounds >= patience:
                print(f"early stopping at epoch {epoch} "
                      f"(no val_loss improvement in {patience} rounds)")
                break
        return self.state

    # ------------------------------------------------------------------
    def validate(self, ckpt: Optional[str] = None, verbose: bool = True):
        if ckpt:
            self.state = restore_checkpoint_flexible(ckpt, self.state)
            self.state = jax.device_put(self.state, self.replicated)
        if self.metric is not None:
            self.metric.reset_states()

        eval_keys = (("image", "joints", "centers") if self.kind == "spm"
                     else ("image", "joints", "joints_vis"))
        loss_sum, n_total = 0.0, 0
        for batch in self.dm.val_loader():
            padded, n_real = self._pad_to_devices(
                batch, eval_keys + ("bbox", "image_id", "category_id",
                                    "image_size"))
            dev_batch = self._device_batch(padded, eval_keys)
            per_sample, decoded = self.eval_step(self.state, dev_batch)
            loss_sum += float(jnp.sum(per_sample[:n_real]))
            n_total += n_real
            if self.metric is not None:
                # eval_step decodes on device; only K*3 floats/sample move
                self.metric.update_state_decoded(padded, decoded,
                                                 count=n_real)
        val_loss = loss_sum / max(n_total, 1)
        val_map = self.metric.result(verbose=verbose) if self.metric else 0.0
        if verbose:
            print(f"val_loss={val_loss:.4f} val_mAP={val_map:.4f}")
        return val_loss, val_map
