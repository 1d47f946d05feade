"""ImageFolder-style classification data layer for darknet19 backbone
pretraining (the reference consumes a tiny-imagenet classifier checkpoint,
models/backbone/darknet.py:138-150; train_classifier.py produces the
equivalent artifact here)."""

from __future__ import annotations

import os
from typing import List

import numpy as np

from .pipeline import HostLoader

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

_EXTS = {".jpg", ".jpeg", ".png", ".bmp"}


def _scan(root: str, classes: List[str]) -> List[dict]:
    db = []
    for label, name in enumerate(classes):
        d = os.path.join(root, name)
        if not os.path.isdir(d):
            # classes come from train_dir; a val_dir is allowed to lack
            # some of them (it simply contributes no samples there)
            continue
        for fname in sorted(os.listdir(d)):
            if os.path.splitext(fname)[1].lower() in _EXTS:
                db.append({"path": os.path.join(d, fname), "label": label})
    return db


class ImageFolderDataModule:
    """<dir>/<class_name>/<image> layout; labels are the sorted class-dir
    index (torchvision ImageFolder semantics)."""

    def __init__(self, train_dir: str, val_dir: str, input_size: int,
                 workers: int, batch_size: int, seed: int = 0):
        self.train_dir = train_dir
        self.val_dir = val_dir
        self.input_size = int(input_size)
        self.workers = int(workers)
        self.batch_size = int(batch_size)
        self.seed = int(seed)
        self.process_index = 0
        self.process_count = 1
        self.classes: List[str] = []
        self.train_db: List[dict] = []
        self.val_db: List[dict] = []

    def prepare_data(self):
        pass

    def setup(self):
        self.classes = sorted(
            d for d in os.listdir(self.train_dir)
            if os.path.isdir(os.path.join(self.train_dir, d)))
        self.train_db = _scan(self.train_dir, self.classes)
        if self.val_dir and os.path.isdir(self.val_dir):
            self.val_db = _scan(self.val_dir, self.classes)

    def _sample_fn(self):
        s = self.input_size

        def fn(rec, index, epoch):
            raw = cv2.imread(rec["path"])
            if raw is None:
                raise IOError(
                    f"cv2.imread failed (corrupt/unreadable image): "
                    f"{rec['path']}")
            img = cv2.cvtColor(raw, cv2.COLOR_BGR2RGB)
            img = cv2.resize(img, (s, s), interpolation=cv2.INTER_LINEAR)
            return {"image": img, "label": np.int32(rec["label"])}
        return fn

    def _loader(self, db, train: bool, batch_size=None) -> HostLoader:
        return HostLoader(db, self._sample_fn(),
                          batch_size=batch_size or self.batch_size,
                          shuffle=train, seed=self.seed, drop_last=train,
                          workers=self.workers,
                          process_index=self.process_index,
                          process_count=self.process_count)

    def train_loader(self, batch_size=None) -> HostLoader:
        return self._loader(self.train_db, True, batch_size)

    def val_loader(self, batch_size=None) -> HostLoader:
        return self._loader(self.val_db, False, batch_size)
