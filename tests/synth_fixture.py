"""Synthetic COCO-format keypoint dataset generator.

Real COCO images are not available in this environment, so tests and smoke
training runs use generated data: simple rendered "persons" (colored torso +
limb dots so there is actual visual signal at the keypoint locations) with
COCO-style person_keypoints annotations.

Usage:  python -m tests.synth_fixture <outdir> [n_train] [n_val]
"""

from __future__ import annotations

import json
import os
import sys

import cv2
import numpy as np

COCO_KP_NAMES = [
    "nose", "left_eye", "right_eye", "left_ear", "right_ear",
    "left_shoulder", "right_shoulder", "left_elbow", "right_elbow",
    "left_wrist", "right_wrist", "left_hip", "right_hip",
    "left_knee", "right_knee", "left_ankle", "right_ankle",
]
COCO_SKELETON = [
    [16, 14], [14, 12], [17, 15], [15, 13], [12, 13], [6, 12], [7, 13],
    [6, 7], [6, 8], [7, 9], [8, 10], [9, 11], [2, 3], [1, 2], [1, 3],
    [2, 4], [3, 5], [4, 6], [5, 7],
]

# nominal keypoint offsets inside a unit person box (x, y in [0,1])
_UNIT_POSE = np.array([
    [0.50, 0.08], [0.44, 0.05], [0.56, 0.05], [0.38, 0.08], [0.62, 0.08],
    [0.30, 0.25], [0.70, 0.25], [0.22, 0.45], [0.78, 0.45],
    [0.18, 0.62], [0.82, 0.62], [0.38, 0.58], [0.62, 0.58],
    [0.36, 0.78], [0.64, 0.78], [0.35, 0.96], [0.65, 0.96],
])


def _render_person(img, box, joints, rng):
    x, y, w, h = box
    color = tuple(int(c) for c in rng.randint(60, 255, 3))
    # torso
    cv2.rectangle(img, (int(x + 0.3 * w), int(y + 0.2 * h)),
                  (int(x + 0.7 * w), int(y + 0.6 * h)), color, -1)
    # head
    cv2.circle(img, (int(x + 0.5 * w), int(y + 0.1 * h)),
               max(2, int(0.1 * h)), color, -1)
    # keypoint dots (distinct color so the net can find them)
    for (jx, jy) in joints:
        cv2.circle(img, (int(jx), int(jy)), max(1, int(0.02 * h)),
                   (255, 255, 255), -1)


def make_dataset(outdir: str, split: str, n_images: int, seed: int = 0,
                 img_size=(320, 400), max_persons: int = 3,
                 min_persons: int = 1,
                 absolute_paths: bool = False,
                 clutter: int = 0, occlude_prob: float = 0.0,
                 scale_jitter: bool = False) -> str:
    """Write images + annotations; returns the annotation json path.

    Reference-scale evidence corpora (VERDICT.md round-1 item 2) add the
    variation real COCO has and the basic fixture lacks:
    * ``clutter``: N distractor shapes (person-colored rectangles/circles
      with white dots) per image -- the net must reject false keypoints;
    * ``occlude_prob``: per-person chance of a background-colored bar
      across the torso (annotations keep v=2, as COCO often does);
    * ``scale_jitter``: widens person size to 36..300 px (crowded small
      persons through near-full-frame), overlapping freely.
    """
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(outdir, split)
    os.makedirs(img_dir, exist_ok=True)
    ann_dir = os.path.join(outdir, "annotations")
    os.makedirs(ann_dir, exist_ok=True)

    images, annotations = [], []
    ann_id = 1
    H, W = img_size
    for i in range(n_images):
        img_id = i + 1
        fname = f"{img_id:012d}.jpg"
        img = np.full((H, W, 3), 30, np.uint8)
        for _ in range(clutter):
            cx, cy = rng.randint(0, W), rng.randint(0, H)
            cw, chh = rng.randint(10, 60), rng.randint(10, 60)
            col = tuple(int(c) for c in rng.randint(60, 255, 3))
            if rng.rand() < 0.5:
                cv2.rectangle(img, (cx, cy), (cx + cw, cy + chh), col, -1)
            else:
                cv2.circle(img, (cx, cy), cw // 2, col, -1)
            if rng.rand() < 0.5:  # false keypoint-like dot
                cv2.circle(img, (cx + cw // 2, cy + chh // 2),
                           rng.randint(2, 5), (255, 255, 255), -1)
        n_person = rng.randint(min_persons, max_persons + 1)
        for _ in range(n_person):
            if scale_jitter:
                pw = rng.randint(36, 180)
                ph = rng.randint(60, min(300, H - 1))
            else:
                pw = rng.randint(60, 140)
                ph = rng.randint(100, 220)
            px = rng.randint(0, max(1, W - pw))
            py = rng.randint(0, max(1, H - ph))
            jitter = rng.uniform(-0.03, 0.03, _UNIT_POSE.shape)
            joints = (_UNIT_POSE + jitter) * [pw, ph] + [px, py]
            joints = np.clip(joints, [px + 1, py + 1],
                             [px + pw - 1, py + ph - 1])
            _render_person(img, (px, py, pw, ph), joints, rng)
            if rng.rand() < occlude_prob:
                # background-colored bar over part of the person
                oy = py + rng.randint(0, max(1, ph - 10))
                oh = rng.randint(ph // 8, max(ph // 4, ph // 8 + 1))
                cv2.rectangle(img, (px, oy), (px + pw, oy + oh),
                              (30, 30, 30), -1)
            kps = []
            for (jx, jy) in joints:
                kps.extend([float(jx), float(jy), 2])
            annotations.append({
                "id": ann_id,
                "image_id": img_id,
                "category_id": 1,
                "iscrowd": 0,
                "area": float(pw * ph),
                "bbox": [float(px), float(py), float(pw), float(ph)],
                "keypoints": kps,
                "num_keypoints": 17,
            })
            ann_id += 1
        path = os.path.join(img_dir, fname)
        cv2.imwrite(path, img)
        images.append({
            "id": img_id,
            "file_name": os.path.abspath(path) if absolute_paths else fname,
            "width": W,
            "height": H,
        })

    db = {
        "images": images,
        "annotations": annotations,
        "categories": [{
            "id": 1,
            "name": "person",
            "supercategory": "person",
            "keypoints": COCO_KP_NAMES,
            "skeleton": COCO_SKELETON,
        }],
    }
    json_path = os.path.join(ann_dir, f"person_keypoints_{split}.json")
    with open(json_path, "w") as f:
        json.dump(db, f)
    return json_path


def make_pis_dataset(outdir: str, split: str, n_images: int,
                     seed: int = 0) -> str:
    """11-keypoint upper-body PIS-style dataset with absolute file paths
    (reference: dataset/sbp_pis_dataset.py:156)."""
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(outdir, split)
    os.makedirs(img_dir, exist_ok=True)
    ann_dir = os.path.join(outdir, "annotations")
    os.makedirs(ann_dir, exist_ok=True)
    images, annotations = [], []
    H, W = 320, 400
    for i in range(n_images):
        img_id = i + 1
        img = np.full((H, W, 3), 40, np.uint8)
        pw, ph = rng.randint(80, 160), rng.randint(120, 240)
        px = rng.randint(0, W - pw)
        py = rng.randint(0, H - ph)
        joints = (_UNIT_POSE[:11] + rng.uniform(-0.03, 0.03, (11, 2))) \
            * [pw, ph] + [px, py]
        joints = np.clip(joints, [px + 1, py + 1], [px + pw - 1, py + ph - 1])
        _render_person(img, (px, py, pw, ph), joints, rng)
        path = os.path.abspath(os.path.join(img_dir, f"pis_{img_id:06d}.jpg"))
        cv2.imwrite(path, img)
        images.append({"id": img_id, "file_name": path,
                       "width": W, "height": H})
        # PIS GT annotations are 17-slot COCO keypoints with the 6 lower-body
        # slots zeroed (the reference's 11-kp detections are padded with 18
        # zeros to score against 17-kp OKS eval, utils/sbp_pis_utils.py:40,
        # which only adds up if the GT is 17-slot too)
        kps = []
        for (jx, jy) in joints:
            kps.extend([float(jx), float(jy), 2])
        kps.extend([0, 0, 0] * 6)
        annotations.append({
            "id": img_id, "image_id": img_id, "category_id": 1,
            "iscrowd": 0, "area": float(pw * ph),
            "bbox": [float(px), float(py), float(pw), float(ph)],
            "keypoints": kps, "num_keypoints": 11,
        })
    db = {
        "images": images,
        "annotations": annotations,
        "categories": [{
            "id": 1, "name": "person", "supercategory": "person",
            "keypoints": COCO_KP_NAMES,
            "skeleton": COCO_SKELETON,
        }],
    }
    json_path = os.path.join(ann_dir, f"pis_person_keypoints_{split}.json")
    with open(json_path, "w") as f:
        json.dump(db, f)
    return json_path


# per-keypoint distinct colors (BGR) so a trained net can identify joints
# at any body orientation (needed for the fallen-pose PIS classes; the
# plain white dots of _render_person are only separable by upright layout)
_KP_COLORS = [
    (0, 0, 255), (0, 128, 255), (0, 255, 255), (0, 255, 128), (0, 255, 0),
    (128, 255, 0), (255, 255, 0), (255, 128, 0), (255, 0, 0), (255, 0, 128),
    (255, 0, 255),
]
_PIS_LIMBS = [(0, 1), (0, 2), (1, 3), (2, 4), (5, 6), (5, 7), (7, 9),
              (6, 8), (8, 10)]


def _render_pose11(img, joints, body_px, rng):
    """Upper-body person at arbitrary orientation: torso quad between the
    shoulders and a point down the body axis, limb lines, and a distinct
    color dot per keypoint."""
    color = tuple(int(c) for c in rng.randint(60, 200, 3))
    ls, rs = joints[5], joints[6]
    center = (ls + rs) / 2
    down = center - joints[0]  # nose -> shoulder-center = body axis
    n = np.hypot(*down) + 1e-6
    down = down / n * body_px * 0.45
    quad = np.array([ls, rs, rs + down, ls + down], np.int32)
    cv2.fillPoly(img, [quad], color)
    cv2.circle(img, tuple(np.int32(joints[0])), max(3, int(0.10 * body_px)),
               color, -1)
    for a, b in _PIS_LIMBS:
        cv2.line(img, tuple(np.int32(joints[a])), tuple(np.int32(joints[b])),
                 color, max(2, int(0.04 * body_px)))
    for k, (jx, jy) in enumerate(joints):
        cv2.circle(img, (int(jx), int(jy)), max(2, int(0.025 * body_px)),
                   _KP_COLORS[k], -1)


def _pose11(rng, size_px, theta_deg, center_xy):
    """11-kp upper-body pose: _UNIT_POSE[:11] centered, rotated by theta
    (positive = nose tilts toward +x), scaled to size_px, + jitter."""
    u = _UNIT_POSE[:11] + rng.uniform(-0.015, 0.015, (11, 2))
    u = (u - [0.5, 0.35]) * size_px  # pivot near the shoulder line
    th = np.deg2rad(theta_deg)
    rot = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    return u @ rot.T + center_xy


_HANDLE_ROI = ((1220, 1300), (1600, 1130))  # pis_handle_test_code.py


def _grip_intersection_x(y):
    (ax, ay), (bx, by) = _HANDLE_ROI
    g = (ay - by) / (ax - bx)
    return (y - (ay - g * ax)) / g


def _pis_record(images, annotations, img, joints, path, W, H):
    img_id = len(images) + 1
    cv2.imwrite(path, img)
    images.append({"id": img_id, "file_name": os.path.abspath(path),
                   "width": W, "height": H})
    kps = []
    for (jx, jy) in joints:
        kps.extend([float(jx), float(jy), 2])
    kps.extend([0, 0, 0] * 6)  # 17-slot layout, lower body zeroed
    x0, y0 = joints.min(0) - 12
    x1, y1 = joints.max(0) + 12
    x0, y0 = max(x0, 0.0), max(y0, 0.0)
    annotations.append({
        "id": img_id, "image_id": img_id, "category_id": 1, "iscrowd": 0,
        "area": float((x1 - x0) * (y1 - y0)),
        "bbox": [float(x0), float(y0),
                 float(min(x1, W - 1) - x0), float(min(y1, H - 1) - y0)],
        "keypoints": kps, "num_keypoints": 11,
    })


def _pis_db(images, annotations):
    return {"images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "person",
                            "supercategory": "person",
                            "keypoints": COCO_KP_NAMES,
                            "skeleton": COCO_SKELETON}]}


def make_pis_behavior_dataset(outdir: str, n_train: int = 1600,
                              n_val_per_class: int = 100, seed: int = 0):
    """Labeled PIS behavior-task fixture (VERDICT r3 item 5): the
    reference's harness CLIs read the class from a directory component of
    the image path and print a confusion matrix + accuracy
    (pis_handle_test_code.py:69-128, pis_falling_down_test_code.py:63-153).

    Writes three absolute-path 11-kp sets:
    * train: 1280x720, poses over the FULL orientation range with the
      right wrist displaced to random reachable targets, so both val
      tasks are in-distribution for a model trained on it;
    * handle_val/{grip,no_grip}: 2560x1440 (the reference HANDLE_ROI line
      (1220,1300)-(1600,1130) lives in real-camera coordinates), upright
      poses, right wrist placed strictly on the grip / no-grip side;
    * fall_val/{normal,fallen}: 1280x720; 'normal' tilts the nose->
      shoulder axis inside the harness's asymmetric upright band
      (gradient < -1 or > 8, i.e. nose-right tilts up to ~40deg but
      nose-left only ~5deg), 'fallen' lies within ~10deg of horizontal.

    Returns (train_json, handle_json, fall_json).
    """
    rng = np.random.RandomState(seed)
    ann_dir = os.path.join(outdir, "annotations")
    os.makedirs(ann_dir, exist_ok=True)

    def canvas(W, H):
        img = np.full((H, W, 3), 40, np.uint8)
        # mild background texture so crops aren't trivially flat
        for _ in range(6):
            cx, cy = rng.randint(0, W), rng.randint(0, H)
            col = tuple(int(c) for c in rng.randint(20, 55, 3))
            cv2.circle(img, (cx, cy), rng.randint(20, 80), col, -1)
        return img

    # --- train: full orientation + wrist-displacement coverage ----------
    W, H = 1280, 720
    images, annotations = [], []
    tdir = os.path.join(outdir, "train")
    os.makedirs(tdir, exist_ok=True)
    for i in range(n_train):
        img = canvas(W, H)
        size = rng.randint(200, 420)
        cx = rng.uniform(0.25 * W, 0.75 * W)
        cy = rng.uniform(0.3 * H, 0.7 * H)
        joints = _pose11(rng, size, rng.uniform(-180, 180), (cx, cy))
        # right wrist reaches toward a random target half the time
        if rng.rand() < 0.5:
            ang = rng.uniform(0, 2 * np.pi)
            reach = rng.uniform(0.3, 0.75) * size
            joints[10] = joints[8] + reach * np.array(
                [np.cos(ang), np.sin(ang)])
        joints = np.clip(joints, 4, [W - 5, H - 5])
        _render_pose11(img, joints, size, rng)
        _pis_record(images, annotations, img, joints,
                    os.path.join(tdir, f"pis_{i:06d}.jpg"), W, H)
    train_json = os.path.join(ann_dir, "pis_behavior_train.json")
    with open(train_json, "w") as f:
        json.dump(_pis_db(images, annotations), f)

    # --- handle_val: grip decided by wrist vs the ROI line --------------
    W, H = 2560, 1440
    images, annotations = [], []
    for label in ("grip", "no_grip"):
        ldir = os.path.join(outdir, "handle_val", label)
        os.makedirs(ldir, exist_ok=True)
        for i in range(n_val_per_class):
            img = canvas(W, H)
            size = rng.randint(260, 420)
            wy = rng.uniform(1150, 1390)
            xi = _grip_intersection_x(wy)
            if label == "grip":
                wx = min(xi + rng.uniform(60, 300), W - 40)
            else:
                wx = max(xi - rng.uniform(60, 600), 40)
            # body up-left of the wrist so the reach is plausible
            cx = wx - rng.uniform(0.3, 0.5) * size
            cy = wy - rng.uniform(0.5, 0.8) * size
            joints = _pose11(rng, size, rng.uniform(-3, 12), (cx, cy))
            joints[10] = (wx, wy)
            joints = np.clip(joints, 4, [W - 5, H - 5])
            _render_pose11(img, joints, size, rng)
            _pis_record(images, annotations, img, joints,
                        os.path.join(ldir, f"pis_{i:06d}.jpg"), W, H)
    handle_json = os.path.join(ann_dir, "pis_behavior_handle_val.json")
    with open(handle_json, "w") as f:
        json.dump(_pis_db(images, annotations), f)

    # --- fall_val: orientation decided by the class ---------------------
    W, H = 1280, 720
    images, annotations = [], []
    for label in ("normal", "fallen"):
        ldir = os.path.join(outdir, "fall_val", label)
        os.makedirs(ldir, exist_ok=True)
        for i in range(n_val_per_class):
            img = canvas(W, H)
            size = rng.randint(200, 380)
            cx = rng.uniform(0.3 * W, 0.7 * W)
            cy = rng.uniform(0.35 * H, 0.65 * H)
            if label == "normal":
                # inside the asymmetric upright band with margin
                theta = rng.uniform(3, 35) if rng.rand() < 0.8 \
                    else rng.uniform(-4, -1)
            else:
                theta = rng.choice([-1, 1]) * rng.uniform(82, 98)
            joints = _pose11(rng, size, theta, (cx, cy))
            joints = np.clip(joints, 4, [W - 5, H - 5])
            _render_pose11(img, joints, size, rng)
            _pis_record(images, annotations, img, joints,
                        os.path.join(ldir, f"pis_{i:06d}.jpg"), W, H)
    fall_json = os.path.join(ann_dir, "pis_behavior_fall_val.json")
    with open(fall_json, "w") as f:
        json.dump(_pis_db(images, annotations), f)
    return train_json, handle_json, fall_json


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--hard"]
    hard = "--hard" in sys.argv
    outdir = args[0] if len(args) > 0 else "./data/synth_coco"
    n_train = int(args[1]) if len(args) > 1 else 64
    n_val = int(args[2]) if len(args) > 2 else 16
    kw = dict(clutter=6, occlude_prob=0.3, scale_jitter=True) if hard \
        else {}
    tr = make_dataset(outdir, "train2017", n_train, seed=0, **kw)
    va = make_dataset(outdir, "val2017", n_val, seed=1, **kw)
    print(tr)
    print(va)
