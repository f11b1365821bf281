"""Base dataset (ref: mmdet/datasets/custom.py (CustomDataset)).

Annotation contract (same as the reference):
  img_infos: list of dict(filename, width, height, [id]);
  get_ann_info(idx) -> dict(bboxes (n,4) xyxy float32, labels (n,) 1-based,
  bboxes_ignore (k,4)).

TPU-relevant departures:
  * ``prepare_train_img`` re-samples on empty-GT like the reference
    (_rand_another), but padding to ``max_gt`` happens in the pipeline
    (DefaultFormatBundle) so every sample is fixed-shape;
  * the aspect-ratio ``flag`` drives orientation bucketing (landscape /
    portrait canvases) instead of the reference's GroupSampler batching.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..pipelines.compose import Compose
from ..rng import sample_rng
from ..registry import DATASETS


@DATASETS.register_module
class CustomDataset:
    CLASSES: Optional[tuple] = None

    def __init__(self, ann_file: str, pipeline, img_prefix: str = "",
                 seg_prefix: str = "", proposal_file: Optional[str] = None,
                 test_mode: bool = False,
                 filter_empty_gt: bool = True,
                 min_size: int = 32, classes=None, **kwargs):
        self.ann_file = ann_file
        self.img_prefix = img_prefix
        self.seg_prefix = seg_prefix
        self.test_mode = test_mode
        self.filter_empty_gt = filter_empty_gt
        if classes is not None:
            self.CLASSES = tuple(classes)
        self.img_infos = self.load_annotations(ann_file)
        # precomputed proposals for the FastRCNN family (ref: CustomDataset
        # proposal_file + load_proposals): one (n, 4|5) array per image,
        # aligned with load_annotations order — loaded BEFORE _filter_imgs
        # so the same filtering applies to both lists
        self.proposals = (self.load_proposals(proposal_file)
                          if proposal_file else None)
        if not test_mode:
            valid = self._filter_imgs(min_size)
            self.img_infos = [self.img_infos[i] for i in valid]
            if self.proposals is not None:
                self.proposals = [self.proposals[i] for i in valid]
        self._set_group_flag()
        self.pipeline = Compose(pipeline)

    # ---- to be overridden -------------------------------------------------

    def load_annotations(self, ann_file: str) -> List[dict]:
        import json
        with open(ann_file) as f:
            return json.load(f)

    def get_ann_info(self, idx: int) -> dict:
        return self.img_infos[idx]["ann"]

    @staticmethod
    def load_proposals(proposal_file: str):
        """ref: mmcv.load of the reference's .pkl proposal lists; .npy
        (object array) is also accepted here."""
        if proposal_file.endswith((".pkl", ".pickle")):
            import pickle
            with open(proposal_file, "rb") as f:
                return pickle.load(f)
        if proposal_file.endswith(".npy"):
            return list(np.load(proposal_file, allow_pickle=True))
        raise ValueError(f"unsupported proposal file {proposal_file}")

    # ---- shared machinery --------------------------------------------------

    def _filter_imgs(self, min_size: int = 32) -> List[int]:
        valid = []
        for i, info in enumerate(self.img_infos):
            if min(info["width"], info["height"]) < min_size:
                continue
            if self.filter_empty_gt and len(self.get_ann_info(i)["bboxes"]) == 0:
                continue
            valid.append(i)
        return valid

    def _set_group_flag(self):
        """0 = portrait, 1 = landscape (ref: aspect ratio > 1)."""
        self.flag = np.zeros(len(self), dtype=np.uint8)
        for i, info in enumerate(self.img_infos):
            if info["width"] / info["height"] > 1:
                self.flag[i] = 1

    def __len__(self) -> int:
        return len(self.img_infos)

    def _rand_another(self, idx: int) -> int:
        pool = np.where(self.flag == self.flag[idx])[0]
        return int(sample_rng().choice(list(pool)))

    def prepare_train_img(self, idx: int):
        results = dict(img_info=self.img_infos[idx],
                       ann_info=self.get_ann_info(idx),
                       img_prefix=self.img_prefix,
                       seg_prefix=self.seg_prefix, idx=idx)
        if self.proposals is not None:
            results["proposals"] = self.proposals[idx]
        return self.pipeline(results)

    def prepare_test_img(self, idx: int):
        results = dict(img_info=self.img_infos[idx],
                       img_prefix=self.img_prefix, idx=idx)
        if self.proposals is not None:
            results["proposals"] = self.proposals[idx]
        return self.pipeline(results)

    def __getitem__(self, idx: int):
        if self.test_mode:
            return self.prepare_test_img(idx)
        while True:
            data = self.prepare_train_img(idx)
            if data is None or (self.filter_empty_gt and
                                not data.get("gt_valid", np.ones(1)).any()):
                idx = self._rand_another(idx)
                continue
            return data
