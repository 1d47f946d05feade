"""SPM (bottom-up, one sample per image) COCO data layer.

The reference builds whole-image samples carrying every person's joints
plus a bbox-center "root joint" per person, and generates root-heatmap +
displacement targets on the host (reference: dataset/spm_coco_dataset.py:
40-95, :120-192).  Here the host ships the resized uint8 image and the
scaled joint/center coordinates; target generation (ops/targets.py::
spm_target) and augmentation run inside the jitted device step.

Static-shape design for XLA: persons are padded to ``max_persons`` with
the (0, 0) absent-point sentinel the reference's generators already skip
(utils/spm_utils.py:29-95).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

from . import native_loader
from .coco import CocoAnnotations
from .pipeline import HostLoader, collate
from .sbp_dataset import (_sample_rng, apply_clahe, coco_img_dir,
                          joints_from_ann, sanitize_bbox)

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def load_spm_image_db(coco: CocoAnnotations, img_dir: str,
                      num_keypoints: int) -> List[dict]:
    """One record per image with >=1 valid person; centers are int-cast
    clean-bbox centers (reference: dataset/spm_coco_dataset.py:120-192)."""
    person_cats = {cid for cid, c in coco.cats.items()
                   if c.get("name") == "person"}
    db = []
    for img_id in coco.get_img_ids():
        im = coco.imgs[img_id]
        joints_list, vis_list, centers = [], [], []
        cat_id = None
        for ann_id in coco.get_ann_ids(img_id):
            ann = coco.anns[ann_id]
            if ann.get("iscrowd", 0):
                continue
            if ann["category_id"] not in person_cats:
                continue
            if not ann.get("keypoints") or max(ann["keypoints"]) == 0:
                continue
            clean = sanitize_bbox(ann["bbox"], im["width"], im["height"])
            if clean is None or ann.get("area", 0) <= 0:
                continue
            joints, joints_vis = joints_from_ann(ann, clean, num_keypoints)
            if joints_vis.sum() == 0:
                continue
            x1, y1 = int(clean[0]), int(clean[1])
            x2 = x1 + int(clean[2])
            y2 = y1 + int(clean[3])
            joints_list.append(joints)
            vis_list.append(joints_vis)
            centers.append([(x1 + x2) / 2.0, (y1 + y2) / 2.0])
            cat_id = ann["category_id"]
        if joints_list:
            db.append({
                "image_path": os.path.join(img_dir, im["file_name"]),
                "joints": np.asarray(joints_list, np.float64),
                "joints_vis": np.asarray(vis_list, np.float64),
                "centers": np.asarray(centers, np.float64),
                "image_id": img_id,
                "category_id": cat_id,
                "image_size": (im["width"], im["height"]),
            })
    return db


class SPMCOCODataModule:
    """Whole-image samples, persons padded to ``max_persons``."""

    def __init__(self, train_path: str, val_path: str, img_dir: str,
                 input_size: int, output_size: int, num_keypoints: int,
                 sigma: float, workers: int, batch_size: int,
                 class_labels: Sequence[str], max_persons: int = 30,
                 use_native: Optional[bool] = None, clahe_prob: float = 0.5,
                 seed: int = 0, cache_images: bool = False):
        self.train_path = train_path
        self.val_path = val_path
        self.img_dir = img_dir
        self.input_size = int(input_size)
        self.output_size = int(output_size)
        self.num_keypoints = int(num_keypoints)
        self.sigma = sigma
        self.workers = int(workers)
        self.batch_size = int(batch_size)
        self.class_labels = list(class_labels)
        self.max_persons = int(max_persons)
        self.use_native = native_loader.available() if use_native is None \
            else bool(use_native)
        self.clahe_prob = float(clahe_prob)
        self.seed = int(seed)
        # opt-in RAM cache of the resized uint8 images (see
        # sbp_dataset.SBPCOCODataModule.cache_images)
        self.cache_images = bool(cache_images)
        self._img_cache = {True: {}, False: {}}
        self.process_index = 0
        self.process_count = 1
        self.train_db: List[dict] = []
        self.val_db: List[dict] = []

    def prepare_data(self):
        pass

    def setup(self):
        if self.train_path and os.path.exists(self.train_path):
            self.train_db = load_spm_image_db(
                CocoAnnotations(self.train_path),
                coco_img_dir(self.img_dir, self.train_path),
                self.num_keypoints)
        if self.val_path and os.path.exists(self.val_path):
            self.val_db = load_spm_image_db(
                CocoAnnotations(self.val_path),
                coco_img_dir(self.img_dir, self.val_path),
                self.num_keypoints)

    # ------------------------------------------------------------------
    def _metadata(self, rec: dict) -> dict:
        """Scale all persons' joints/centers original px -> input px and
        pad the person axis.  The (0, 0) absent sentinel survives scaling
        (reference keypoint chain: dataset/spm_coco_dataset.py:53-73)."""
        s = self.input_size
        w0, h0 = rec["image_size"]
        scale = np.asarray([s / w0, s / h0], np.float32)
        p = min(rec["joints"].shape[0], self.max_persons)
        joints = np.zeros((self.max_persons, self.num_keypoints, 2),
                          np.float32)
        centers = np.zeros((self.max_persons, 1, 2), np.float32)
        joints[:p] = rec["joints"][:p].astype(np.float32) * scale
        centers[:p, 0] = rec["centers"][:p].astype(np.float32) * scale
        return {
            "joints": joints,
            "centers": centers,
            "image_id": np.int64(rec["image_id"]),
            "category_id": np.int64(rec["category_id"]),
            "image_size": np.asarray(rec["image_size"], np.int64),
        }

    def _sample_fn(self, train: bool):
        s = self.input_size
        cache = self._img_cache[train] if self.cache_images else None

        def fn(rec, index, epoch):
            img = cache.get(index) if cache is not None else None
            if img is None:
                img = cv2.cvtColor(cv2.imread(rec["image_path"]),
                                   cv2.COLOR_BGR2RGB)
                img = cv2.resize(img, (s, s),
                                 interpolation=cv2.INTER_LINEAR)
                if cache is not None:
                    cache[index] = img
            if train and self.clahe_prob > 0:
                rng = _sample_rng(self.seed, epoch, index)
                if rng.uniform() < self.clahe_prob:
                    img = apply_clahe(img, rng)
            out = self._metadata(rec)
            out["image"] = img
            return out
        return fn

    def _batch_fn(self, train: bool):
        s = self.input_size

        def fn(records, indices, epoch):
            cache = self._img_cache[train] if self.cache_images else None
            images = [None] * len(records)
            miss, blobs = [], []
            for i, (rec, index) in enumerate(zip(records, indices)):
                if cache is not None:
                    hit = cache.get(int(index))
                    if hit is not None:
                        images[i] = hit
                        continue
                miss.append(i)
                with open(rec["image_path"], "rb") as f:
                    blobs.append(f.read())
            if blobs:
                decoded = native_loader.batch_decode_crop_resize(
                    blobs, [(-1, -1, -1, -1)] * len(blobs), s, s,
                    n_threads=max(self.workers, 1))
                for pos, img in zip(miss, decoded):
                    images[pos] = img
                    if cache is not None:
                        cache[int(indices[pos])] = img
            samples = []
            for i, (rec, index) in enumerate(zip(records, indices)):
                image = images[i]
                if train and self.clahe_prob > 0:
                    rng = _sample_rng(self.seed, epoch, int(index))
                    if rng.uniform() < self.clahe_prob:
                        image = apply_clahe(image, rng)
                out = self._metadata(rec)
                out["image"] = image
                samples.append(out)
            return collate(samples)
        return fn

    def _loader(self, db, train: bool, batch_size=None) -> HostLoader:
        kwargs = dict(batch_size=batch_size or self.batch_size,
                      shuffle=train, seed=self.seed, drop_last=train,
                      workers=self.workers,
                      process_index=self.process_index,
                      process_count=self.process_count)
        if self.use_native:
            return HostLoader(db, None, batch_fn=self._batch_fn(train),
                              **kwargs)
        return HostLoader(db, self._sample_fn(train), **kwargs)

    def train_loader(self, batch_size=None) -> HostLoader:
        return self._loader(self.train_db, True, batch_size)

    def val_loader(self, batch_size=None) -> HostLoader:
        return self._loader(self.val_db, False, batch_size)
