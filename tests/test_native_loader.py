"""Native C++ loader core vs the cv2 reference path."""

import shutil

import cv2
import numpy as np
import pytest

from pytorch_pose_estimation_tpu.data import native_loader


# conftest.py builds native/libppe_loader.so at session start whenever a
# compiler exists, so on any host with g++ these tests RUN (and fail
# loudly if the build or bindings break); the skip survives only for
# genuinely compiler-less environments.
pytestmark = pytest.mark.skipif(
    not native_loader.available() and shutil.which("g++") is None,
    reason="native loader not built and no C++ compiler available")


def test_native_loader_built_when_compiler_present():
    if shutil.which("g++") is None:
        pytest.skip("no C++ compiler")
    assert native_loader.available(), (
        "g++ is present but native/libppe_loader.so failed to build/load; "
        "run `make -C native` and check the output")


def _make_jpeg(rng, h, w, quality=95):
    img = rng.randint(0, 255, (h, w, 3), np.uint8)
    # smooth it so JPEG error is small and resize comparisons are stable
    img = cv2.GaussianBlur(img, (7, 7), 3)
    ok, enc = cv2.imencode(".jpg", img,
                           [cv2.IMWRITE_JPEG_QUALITY, quality])
    assert ok
    return img, enc.tobytes()


def test_decode_matches_cv2():
    rng = np.random.RandomState(0)
    _, blob = _make_jpeg(rng, 120, 90)
    got = native_loader.decode_jpeg(blob)
    want = cv2.cvtColor(cv2.imdecode(
        np.frombuffer(blob, np.uint8), cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)
    assert got.shape == want.shape
    # both use libjpeg; allow tiny IDCT implementation differences
    assert np.mean(np.abs(got.astype(int) - want.astype(int))) < 1.0
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 16


def test_batch_crop_resize_matches_cv2_path():
    rng = np.random.RandomState(1)
    blobs, boxes, wants = [], [], []
    out_h, out_w = 128, 96
    for i in range(6):
        h, w = rng.randint(100, 300), rng.randint(100, 300)
        img, blob = _make_jpeg(rng, h, w)
        x1 = rng.randint(0, w // 2)
        y1 = rng.randint(0, h // 2)
        bw = rng.randint(20, w - x1 - 1)
        bh = rng.randint(20, h - y1 - 1)
        blobs.append(blob)
        boxes.append((x1, y1, bw, bh))
        ref_img = cv2.cvtColor(cv2.imdecode(
            np.frombuffer(blob, np.uint8), cv2.IMREAD_COLOR),
            cv2.COLOR_BGR2RGB)
        crop = ref_img[y1:y1 + bh + 1, x1:x1 + bw + 1]
        wants.append(cv2.resize(crop, (out_w, out_h),
                                interpolation=cv2.INTER_LINEAR))
    got = native_loader.batch_decode_crop_resize(blobs, boxes, out_h, out_w,
                                                 n_threads=3)
    assert got.shape == (6, out_h, out_w, 3)
    for g, w_ in zip(got, wants):
        # decode (±libjpeg diffs) x bilinear fixed-point vs float rounding
        assert np.mean(np.abs(g.astype(int) - w_.astype(int))) < 2.0


def test_whole_image_box():
    rng = np.random.RandomState(2)
    img, blob = _make_jpeg(rng, 100, 80)
    got = native_loader.batch_decode_crop_resize(
        [blob], [(-1, -1, -1, -1)], 50, 40)
    want = cv2.resize(cv2.cvtColor(cv2.imdecode(
        np.frombuffer(blob, np.uint8), cv2.IMREAD_COLOR),
        cv2.COLOR_BGR2RGB), (40, 50), interpolation=cv2.INTER_LINEAR)
    assert np.mean(np.abs(got[0].astype(int) - want.astype(int))) < 2.0


def test_corrupt_jpeg_reports_failure():
    with pytest.raises(RuntimeError):
        native_loader.batch_decode_crop_resize(
            [b"not a jpeg"], [(0, 0, 10, 10)], 32, 32)


def test_datamodule_native_matches_cv2_path(tmp_path):
    from pytorch_pose_estimation_tpu.data import SBPCOCODataModule
    from synth_fixture import make_dataset

    root = str(tmp_path)
    json_path = make_dataset(root, "val2017", 4, seed=9)
    kw = dict(train_path=json_path, val_path=json_path, img_dir=root,
              input_size=[128, 96], output_size=[32, 24], num_keypoints=17,
              sigma=2, workers=2, batch_size=4,
              class_labels=[str(i) for i in range(17)])
    dm_native = SBPCOCODataModule(use_native=True, **kw)
    dm_cv2 = SBPCOCODataModule(use_native=False, **kw)
    dm_native.setup()
    dm_cv2.setup()
    a = next(iter(dm_native.val_loader()))
    b = next(iter(dm_cv2.val_loader()))
    np.testing.assert_allclose(a["joints"], b["joints"], rtol=1e-5)
    np.testing.assert_array_equal(a["joints_vis"], b["joints_vis"])
    np.testing.assert_array_equal(a["bbox"], b["bbox"])
    np.testing.assert_array_equal(a["image_id"], b["image_id"])
    assert a["image"].shape == b["image"].shape
    diff = np.abs(a["image"].astype(int) - b["image"].astype(int))
    assert diff.mean() < 2.0
