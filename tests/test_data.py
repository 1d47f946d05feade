"""Host loader + datamodule + device-augmentation unit tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pytorch_pose_estimation_tpu.data.pipeline import HostLoader, collate, pad_batch
from pytorch_pose_estimation_tpu.ops.image import (
    _compose,
    _invert,
    _reflect101,
    _rotation_about,
    affine_warp,
    augment_batch,
    color_jitter,
    sample_train_affine,
    transform_points,
)

from synth_fixture import make_dataset


def _sample_fn(rec, index, epoch):
    return {"v": np.asarray([rec["x"], index, epoch], np.int64)}


def _db(n):
    return [{"x": i * 10} for i in range(n)]


def test_host_loader_order_and_len():
    loader = HostLoader(_db(10), _sample_fn, batch_size=4)
    batches = list(loader)
    assert len(loader) == 3 and len(batches) == 3
    assert batches[0]["v"][:, 0].tolist() == [0, 10, 20, 30]
    assert batches[2]["v"].shape == (2, 3)


def test_host_loader_drop_last_and_shuffle_determinism():
    loader = HostLoader(_db(10), _sample_fn, batch_size=4, shuffle=True,
                        seed=7, drop_last=True)
    loader.set_epoch(3)
    a = [b["v"][:, 0].tolist() for b in loader]
    loader2 = HostLoader(_db(10), _sample_fn, batch_size=4, shuffle=True,
                         seed=7, drop_last=True)
    loader2.set_epoch(3)
    b = [b["v"][:, 0].tolist() for b in loader2]
    assert a == b
    assert len(a) == 2
    loader2.set_epoch(4)
    c = [b["v"][:, 0].tolist() for b in loader2]
    assert a != c  # epoch reshuffles


def test_host_loader_process_sharding():
    full = {v for b in HostLoader(_db(10), _sample_fn, 4) for v in
            b["v"][:, 0].tolist()}
    shard0 = {v for b in HostLoader(_db(10), _sample_fn, 4,
                                    process_index=0, process_count=2)
              for v in b["v"][:, 0].tolist()}
    shard1 = {v for b in HostLoader(_db(10), _sample_fn, 4,
                                    process_index=1, process_count=2)
              for v in b["v"][:, 0].tolist()}
    assert shard0 | shard1 == full
    assert not (shard0 & shard1)


def test_host_loader_shards_run_equal_step_counts():
    """Uneven dataset sizes must NOT give processes different batch counts
    (DistributedSampler wraparound-padding semantics): 7 records, 2
    processes, batch 4, drop_last -- both shards must see ceil(7/2)=4
    records and produce the same number of batches, or the SPMD
    collectives in the jitted step would deadlock."""
    def mk(pi):
        return HostLoader(_db(7), _sample_fn, 4, drop_last=True,
                          process_index=pi, process_count=2)

    b0 = list(mk(0))
    b1 = list(mk(1))
    assert len(mk(0)) == len(mk(1)) == len(b0) == len(b1) == 1
    # wraparound padding still covers the whole dataset across shards
    seen = {v for b in (b0 + b1) for v in b["v"][:, 0].tolist()}
    assert seen == {v * 10 for v in range(7)}


def test_pad_batch():
    b = collate([{"x": np.ones((3,))} for _ in range(5)])
    p = pad_batch(b, 8)
    assert p["x"].shape == (8, 3)
    assert p["pad_mask"].tolist() == [1, 1, 1, 1, 1, 0, 0, 0]


def test_sbp_datamodule_sample(tmp_path):
    from pytorch_pose_estimation_tpu.data import SBPCOCODataModule

    root = str(tmp_path)
    json_path = make_dataset(root, "val2017", 4, seed=5)
    dm = SBPCOCODataModule(
        train_path=json_path, val_path=json_path, img_dir=root,
        input_size=[128, 96], output_size=[32, 24], num_keypoints=17,
        sigma=2, workers=2, batch_size=2,
        class_labels=[str(i) for i in range(17)])
    dm.setup()
    batch = next(iter(dm.val_loader()))
    assert batch["image"].shape == (2, 128, 96, 3)
    assert batch["image"].dtype == np.uint8
    assert batch["joints"].shape == (2, 17, 2)
    # visible joints are inside the resized crop
    vis = batch["joints_vis"][0] > 0
    j = batch["joints"][0][vis]
    assert (j[:, 0] >= 0).all() and (j[:, 0] <= 96).all()
    assert (j[:, 1] >= 0).all() and (j[:, 1] <= 128).all()


def test_sbp_datamodule_image_cache(tmp_path):
    """cache_images=True: epochs 2+ are served from RAM (no file access),
    and cached batches are byte-identical to fresh decodes."""
    import os

    from pytorch_pose_estimation_tpu.data import SBPCOCODataModule

    root = str(tmp_path)
    json_path = make_dataset(root, "val2017", 4, seed=5)

    def build(cache):
        dm = SBPCOCODataModule(
            train_path=json_path, val_path=json_path, img_dir=root,
            input_size=[128, 96], output_size=[32, 24], num_keypoints=17,
            sigma=2, workers=2, batch_size=2,
            class_labels=[str(i) for i in range(17)], cache_images=cache)
        dm.setup()
        return dm

    fresh = [b["image"] for b in build(False).val_loader()]
    dm = build(True)
    first = [b["image"] for b in dm.val_loader()]
    for a, b in zip(fresh, first):
        np.testing.assert_array_equal(a, b)

    # remove the image files: only the cache can serve the second epoch
    img_dir = os.path.join(root, "val2017")
    moved = os.path.join(root, "val2017_moved")
    os.rename(img_dir, moved)
    try:
        second = [b["image"] for b in dm.val_loader()]
    finally:
        os.rename(moved, img_dir)
    for a, b in zip(first, second):
        np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------------
# affine / photometric math
# ---------------------------------------------------------------------

def test_reflect101():
    got = np.asarray(_reflect101(jnp.asarray(
        [-2.0, -1.0, 0.0, 3.0, 4.0, 5.0, 6.0]), 5))
    np.testing.assert_allclose(got, [2, 1, 0, 3, 4, 3, 2])


def test_rotation_about_center():
    m = _rotation_about(10.0, 10.0, jnp.pi / 2)
    pts = transform_points(m, jnp.asarray([[10.0, 10.0], [20.0, 10.0]]))
    np.testing.assert_allclose(np.asarray(pts),
                               [[10, 10], [10, 20]], atol=1e-5)


def test_invert_compose_identity():
    key = jax.random.PRNGKey(0)
    m = sample_train_affine(key, (64, 48))
    ident = _compose(m, _invert(m))
    np.testing.assert_allclose(np.asarray(ident),
                               [[1, 0, 0], [0, 1, 0]], atol=1e-4)


def test_affine_warp_identity():
    img = jnp.asarray(np.random.RandomState(0).rand(16, 12, 3)
                      .astype(np.float32))
    ident = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    out = affine_warp(img, ident, (16, 12))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_color_jitter_range_and_determinism():
    img = jnp.asarray(np.random.RandomState(1).rand(8, 8, 3)
                      .astype(np.float32))
    a = color_jitter(jax.random.PRNGKey(3), img)
    b = color_jitter(jax.random.PRNGKey(3), img)
    c = color_jitter(jax.random.PRNGKey(4), img)
    assert float(jnp.min(a)) >= 0.0 and float(jnp.max(a)) <= 1.0
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_augment_batch_joint_image_consistency():
    """Stamp a bright dot at a joint; after augmentation the dot must sit at
    the transformed joint location (image and keypoints ride one affine)."""
    h, w = 64, 48
    imgs = np.zeros((4, h, w, 3), np.uint8)
    joints = np.zeros((4, 1, 2), np.float32)
    rng = np.random.RandomState(0)
    for b in range(4):
        x, y = rng.randint(10, w - 10), rng.randint(10, h - 10)
        imgs[b, y - 1:y + 2, x - 1:x + 2] = 255
        joints[b, 0] = (x, y)
    vis = np.ones((4, 1), np.float32)

    out, new_joints, new_vis = augment_batch(
        jax.random.PRNGKey(1), jnp.asarray(imgs), jnp.asarray(joints),
        jnp.asarray(vis), (h, w), 30.0, (0.5, 1.0), (0.8, 1.2),
        (0.0, 0.0, 0.0, 0.0))
    out = np.asarray(out)
    new_joints = np.asarray(new_joints)
    for b in range(4):
        if not float(new_vis[b, 0]):
            continue
        x, y = new_joints[b, 0]
        yy, xx = np.unravel_index(np.argmax(out[b].sum(-1)), (h, w))
        dist = np.hypot(xx - x, yy - y)
        assert dist < 4.0, (b, (x, y), (xx, yy))


def test_clahe_luma_vs_cv2():
    """Device luma CLAHE should behave like cv2 CLAHE on a gray image
    (where luma == L up to affine), and leave pure black untouched."""
    import cv2

    rng = np.random.RandomState(0)
    gray = rng.randint(20, 235, (64, 64), np.uint8)
    gray = cv2.GaussianBlur(gray, (5, 5), 2)
    img = np.stack([gray] * 3, axis=-1)

    from pytorch_pose_estimation_tpu.ops.image import clahe_luma

    got = np.asarray(clahe_luma(jnp.asarray(img.astype(np.float32) / 255),
                                clip_limit=2.0))
    ref = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(gray)

    # same qualitative equalization: high correlation with cv2's output,
    # and a real change from the input
    got8 = (got[..., 0] * 255).astype(np.float64)
    c = np.corrcoef(got8.ravel(), ref.astype(np.float64).ravel())[0, 1]
    assert c > 0.98, c
    assert np.abs(got8 - gray).mean() > 1.0  # actually did something

    # black pixels stay black
    black = np.zeros((64, 64, 3), np.float32)
    out = np.asarray(clahe_luma(jnp.asarray(black), 2.0))
    assert np.abs(out).max() == 0.0


def test_clahe_luma_batch_chunked_equals_vmap():
    """The lax.map-chunked batch CLAHE (memory-bounding path taken when
    b % chunk == 0) must be numerically identical to the plain full-batch
    vmap it replaces, including which samples the Bernoulli mask skips."""
    from pytorch_pose_estimation_tpu.ops.image import clahe_luma_batch

    rng = np.random.RandomState(2)
    imgs = jnp.asarray(rng.rand(8, 32, 32, 3).astype(np.float32))
    key = jax.random.PRNGKey(5)
    chunked = np.asarray(clahe_luma_batch(key, imgs, 0.5, chunk=4))
    plain = np.asarray(clahe_luma_batch(key, imgs, 0.5, chunk=8))

    # identical up to LUT round() flips from fp reduction-order changes
    # between the vmapped and lax.map schedules (~1/255-scale, rare)
    diff = np.abs(chunked - plain)
    assert diff.max() < 2.5 / 255, diff.max()
    assert (diff > 1e-6).mean() < 1e-3
    # with p=0.5 over 8 samples, some must differ from the input and
    # (overwhelmingly likely) some must not
    changed = [bool(np.abs(chunked[i] - np.asarray(imgs)[i]).max() > 1e-6)
               for i in range(8)]
    assert any(changed)


def test_clahe_luma_batch_nondivisor_batch_pads():
    """A batch size with no divisor <= the budgeted slice (e.g. prime 7,
    chunk 4) must take the pad-and-trim path and still match the plain
    full-batch vmap sample-for-sample (ADVICE r4: the old largest-divisor
    fallback silently went fully sequential here)."""
    from pytorch_pose_estimation_tpu.ops.image import clahe_luma_batch

    rng = np.random.RandomState(3)
    imgs = jnp.asarray(rng.rand(7, 32, 32, 3).astype(np.float32))
    key = jax.random.PRNGKey(9)
    chunked = np.asarray(clahe_luma_batch(key, imgs, 0.5, chunk=4))
    plain = np.asarray(clahe_luma_batch(key, imgs, 0.5, chunk=7))
    assert chunked.shape == (7, 32, 32, 3)
    diff = np.abs(chunked - plain)
    assert diff.max() < 2.5 / 255, diff.max()
    assert (diff > 1e-6).mean() < 1e-3


def test_augment_batch_with_device_clahe():
    imgs = np.random.RandomState(1).randint(0, 255, (2, 64, 64, 3), np.uint8)
    joints = np.full((2, 1, 2), 32.0, np.float32)
    vis = np.ones((2, 1), np.float32)
    out, j, v = augment_batch(
        jax.random.PRNGKey(0), jnp.asarray(imgs), jnp.asarray(joints),
        jnp.asarray(vis), (64, 64), 10.0, (0.8, 1.0), (0.9, 1.1),
        (0.0, 0.0, 0.0, 0.0), 1.0)
    assert np.asarray(out).shape == (2, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


# -------------------------------------------------------------------------
# MXU (matmul-shaped) resampling path
# -------------------------------------------------------------------------

def test_rotate_shear3_matches_gather_warp():
    """The 3-shear einsum rotation must agree with the reference
    gather-bilinear warp away from borders (different resampling schemes,
    same geometry)."""
    from pytorch_pose_estimation_tpu.ops.image import rotate_shear3

    h, w = 64, 48
    xs = np.linspace(0, 1, w)
    ys = np.linspace(0, 1, h)
    smooth = (np.sin(ys[:, None] * 7)[:, :, None]
              * np.cos(xs[None, :, None] * 5) * 0.5 + 0.5).astype(np.float32)
    img = np.broadcast_to(smooth, (1, h, w, 3))
    angle = 0.3
    rot = _rotation_about(w / 2.0, h / 2.0, jnp.float32(angle))
    ref = jax.vmap(lambda im: affine_warp(im, _invert(rot), (h, w)))(
        jnp.asarray(img))
    got = rotate_shear3(jnp.asarray(img), jnp.float32(angle),
                        h / 2.0, w / 2.0)
    m = 12
    diff = np.abs(np.asarray(ref) - np.asarray(got))[:, m:-m, m:-m]
    assert diff.max() < 0.02, diff.max()


def test_crop_resize_mxu_matches_scale_and_translate():
    from pytorch_pose_estimation_tpu.ops.image import crop_resize_mxu

    h, w = 32, 24
    rng = np.random.RandomState(0)
    img = rng.rand(2, h, w, 3).astype(np.float32)
    x0 = np.asarray([2.0, 0.0], np.float32)
    y0 = np.asarray([3.0, 1.5], np.float32)
    cw = np.asarray([15.0, 20.0], np.float32)
    ch = np.asarray([20.0, 28.0], np.float32)
    got = np.asarray(crop_resize_mxu(jnp.asarray(img), jnp.asarray(x0),
                                     jnp.asarray(y0), jnp.asarray(cw),
                                     jnp.asarray(ch)))
    for b in range(2):
        sx, sy = w / cw[b], h / ch[b]
        ref = jax.image.scale_and_translate(
            jnp.asarray(img[b]), (h, w, 3), (0, 1),
            jnp.asarray([sy, sx]), jnp.asarray([-y0[b] * sy, -x0[b] * sx]),
            method="linear")
        # interior: identical up to bf16 rounding; border rows differ by
        # design (scale_and_translate zero-pads, ours renormalizes)
        diff = np.abs(np.asarray(ref) - got[b])[1:-1, 1:-1]
        assert diff.max() < 0.02, diff.max()


def test_color_jitter_batch_determinism_and_range():
    from pytorch_pose_estimation_tpu.ops.image import color_jitter_batch

    imgs = jnp.asarray(np.random.RandomState(1).rand(3, 8, 8, 3)
                       .astype(np.float32))
    a = color_jitter_batch(jax.random.PRNGKey(3), imgs)
    b = color_jitter_batch(jax.random.PRNGKey(3), imgs)
    c = color_jitter_batch(jax.random.PRNGKey(4), imgs)
    assert float(jnp.min(a)) >= 0.0 and float(jnp.max(a)) <= 1.0
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))
    # per-example factors: different examples get different jitter
    ratios = np.asarray(a) / np.maximum(np.asarray(imgs), 1e-6)
    assert not np.allclose(ratios[0].mean(), ratios[1].mean(), atol=1e-3)


def test_augment_batch_geometry_property_many_keys():
    """Over many PRNG keys: visible joints stay inside the frame, images
    stay finite and in [0, 1], and the bright dot stamped at each joint is
    found near the transformed joint (image and keypoints ride the same
    composed affine)."""
    h, w = 48, 32
    imgs = np.zeros((2, h, w, 3), np.uint8)
    joints = np.zeros((2, 1, 2), np.float32)
    for b, (x, y) in enumerate([(12, 20), (20, 30)]):
        imgs[b, y - 1:y + 2, x - 1:x + 2] = 255
        joints[b, 0] = (x, y)
    vis = np.ones((2, 1), np.float32)

    found = 0
    for seed in range(16):
        out, nj, nv = augment_batch(
            jax.random.PRNGKey(seed), jnp.asarray(imgs),
            jnp.asarray(joints), jnp.asarray(vis), (h, w),
            35.0, (0.5, 1.0), (0.7, 1.4), (0.0, 0.0, 0.0, 0.0))
        out, nj, nv = map(np.asarray, (out, nj, nv))
        assert np.isfinite(out).all()
        assert out.min() >= -1e-3 and out.max() <= 1.0 + 1e-3
        for b in range(2):
            if nv[b, 0] < 1:
                continue
            x, y = nj[b, 0]
            assert 0 <= x < w and 0 <= y < h, (seed, b, x, y)
            yy, xx = np.unravel_index(np.argmax(out[b].sum(-1)), (h, w))
            if np.hypot(xx - x, yy - y) < 5.0:
                found += 1
    # most visible dots must be recovered at the transformed location
    assert found >= 12, found
