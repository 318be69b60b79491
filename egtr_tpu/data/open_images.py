"""Open Images V6 (VRD) dataset, no torch deps.

Mirrors the reference ``OIDetection``/``OIDataset``/``oi_get_statistics``
(data/open_image.py:31-185): vrd-{split}-anno.json with xyxy boxes (+1 pixel
xywh conversion), categories_dict.json with 601 object / 30 predicate
classes, train-split filters (<= num_queries boxes, duplicate-triple dedup,
optional single-predicate-per-pair sampling).
"""

from __future__ import annotations

import json
import os
from collections import defaultdict
from typing import List

import numpy as np
from PIL import Image

from .transforms import Sample, preprocess


class OIDataset:
    def __init__(self, data_folder: str, split: str, *, train_aug: bool = False,
                 filter_duplicate_rels: bool = True,
                 filter_multiple_rels: bool = False,
                 num_object_queries: int = 200,
                 size: int = 800, max_size: int = 1333, debug: bool = False,
                 seed: int = 42, use_crop: bool = False):
        assert split in {"train", "val", "test"}
        self.data_folder = data_folder
        self.img_dir = os.path.join(data_folder, "images")
        self.split = split
        self.train_aug = train_aug and split == "train"
        self.size = size
        self.max_size = max_size
        self.rng = np.random.default_rng(seed)
        self.use_crop = use_crop

        with open(os.path.join(
                data_folder, "annotations", f"vrd-{split}-anno.json")) as f:
            self.targets: List[dict] = json.load(f)
        with open(os.path.join(
                data_folder, "annotations", "categories_dict.json")) as f:
            info = json.load(f)
        self.ind_to_classes = info["obj"]
        self.rel_categories = info["rel"]

        self.filter_multiple_rels = filter_multiple_rels and split == "train"
        if split == "train":
            self.targets = [t for t in self.targets
                            if len(t["bbox"]) <= num_object_queries]
            if filter_duplicate_rels:
                for t in self.targets:
                    seen = {}
                    for s, o, r in t["rel"]:
                        seen.setdefault((s, o, r), r)
                    t["rel"] = [[s, o, r] for (s, o, r) in seen]
        if debug and split == "train":
            self.targets = self.targets[:5000]
        self.ids = list(range(len(self.targets)))

    def __len__(self):
        return len(self.targets)

    def num_classes(self) -> int:
        return len(self.ind_to_classes)

    def nominal_size(self, idx: int):
        """Same contract as VGDataset.nominal_size. The OI annotation
        format carries no image dimensions (reference open_image.py
        decodes to learn them), so read the JPEG header — PIL's open is
        lazy, no pixel decode — and cache it."""
        from .transforms import DETR_TRAIN_SCALES, size_with_aspect_ratio
        if not hasattr(self, "_size_cache"):
            self._size_cache = {}
        wh = self._size_cache.get(idx)
        if wh is None:
            t = self.targets[idx]
            with Image.open(os.path.join(
                    self.img_dir, f"{t['img_fn']}.jpg")) as im:
                wh = self._size_cache[idx] = im.size
        s = max(DETR_TRAIN_SCALES) if self.train_aug else self.size
        return size_with_aspect_ratio(wh[0], wh[1], s, self.max_size)

    def precache_sizes(self) -> None:
        """Fill the ``nominal_size`` header cache for the WHOLE dataset in
        one upfront pass. Multi-host bucketing queries ``nominal_size``
        for every index of every *global* batch — lazily, that is an
        O(global_batch) file-open (for other hosts' images this host
        never decodes) on every single batch, forever; one init-time pass
        bounds it at one open per image total. Called by the Loader only
        when it will actually derive per-batch buckets (multi-host, no
        fixed bucket)."""
        for idx in range(len(self.targets)):
            self.nominal_size(idx)

    def __getitem__(self, idx: int) -> Sample:
        t = self.targets[idx]
        img = Image.open(
            os.path.join(self.img_dir, f"{t['img_fn']}.jpg")).convert("RGB")
        # xyxy -> xywh(+1) -> xyxy round trip preserves the reference's
        # +1-pixel convention (open_image.py:59-76): x2' = x2 + 1
        boxes = np.asarray(t["bbox"], np.float32).reshape(-1, 4)
        if len(boxes):
            boxes = boxes.copy()
            boxes[:, 2] += 1.0
            boxes[:, 3] += 1.0
        labels = np.asarray(t["det_labels"], np.int32)

        rel_list = t["rel"]
        if self.filter_multiple_rels:
            by_pair = defaultdict(list)
            for s, o, r in rel_list:
                by_pair[(s, o)].append(r)
            rel_list = [[s, o, int(self.rng.choice(rs))]
                        for (s, o), rs in by_pair.items()]
        rel = np.asarray(rel_list, np.int32).reshape(-1, 3)

        return preprocess(
            img, boxes, labels, rel, train=self.train_aug, rng=self.rng,
            size=self.size, max_size=self.max_size, image_id=idx,
            use_crop=self.use_crop)


def oi_get_statistics(dataset: OIDataset) -> np.ndarray:
    """fg_matrix for OI (data/open_image.py:161-185)."""
    C = dataset.num_classes()
    P = len(dataset.rel_categories)
    fg = np.zeros((C + 1, C + 1, P), np.int64)
    for t in dataset.targets:
        labels = t["det_labels"]
        for s, o, r in t["rel"]:
            fg[labels[s], labels[o], r] += 1
    return fg
