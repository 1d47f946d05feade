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
