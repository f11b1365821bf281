"""Pascal-VOC-style XML dataset (ref: mmdet/datasets/xml_style.py (XMLDataset)
and voc.py (VOCDataset))."""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import List

import numpy as np

from ...core.evaluation.class_names import VOC_CLASSES
from ..registry import DATASETS
from .custom import CustomDataset


@DATASETS.register_module
class XMLDataset(CustomDataset):
    def load_annotations(self, ann_file: str) -> List[dict]:
        self.cat2label = {c: i + 1 for i, c in enumerate(self.CLASSES)}
        with open(ann_file) as f:
            img_ids = [line.strip() for line in f if line.strip()]
        infos = []
        for img_id in img_ids:
            xml_path = os.path.join(self.img_prefix, "Annotations",
                                    f"{img_id}.xml")
            root = ET.parse(xml_path).getroot()
            size = root.find("size")
            infos.append(dict(
                id=img_id,
                filename=os.path.join("JPEGImages", f"{img_id}.jpg"),
                width=int(size.find("width").text),
                height=int(size.find("height").text)))
        return infos

    def get_ann_info(self, idx: int) -> dict:
        img_id = self.img_infos[idx]["id"]
        xml_path = os.path.join(self.img_prefix, "Annotations", f"{img_id}.xml")
        root = ET.parse(xml_path).getroot()
        bboxes, labels, ignore = [], [], []
        for obj in root.findall("object"):
            name = obj.find("name").text
            if name not in self.cat2label:
                continue
            difficult = int(obj.find("difficult").text or 0) \
                if obj.find("difficult") is not None else 0
            bb = obj.find("bndbox")
            box = [float(bb.find(t).text) for t in
                   ("xmin", "ymin", "xmax", "ymax")]
            if difficult:
                ignore.append(box)
            else:
                bboxes.append(box)
                labels.append(self.cat2label[name])
        return dict(
            bboxes=np.asarray(bboxes, np.float32).reshape(-1, 4),
            labels=np.asarray(labels, np.int64),
            bboxes_ignore=np.asarray(ignore, np.float32).reshape(-1, 4))

    def evaluate(self, results, metric: str = "mAP", iou_thr: float = 0.5,
                 logger=None):
        from ...core.evaluation import eval_map
        gts = [self.get_ann_info(i) for i in range(len(self))]
        mean_ap, per_cls = eval_map(
            results,
            [g["bboxes"] for g in gts],
            [g["labels"] for g in gts],
            iou_thr=iou_thr,
            num_classes=len(self.CLASSES),
            mode="11points" if getattr(self, "year", 2012) == 2007 else "area")
        return dict(mAP=mean_ap, per_class=per_cls)


@DATASETS.register_module
class VOCDataset(XMLDataset):
    CLASSES = VOC_CLASSES

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        if "VOC2007" in self.img_prefix:
            self.year = 2007
        elif "VOC2012" in self.img_prefix:
            self.year = 2012
        else:
            self.year = 2012


@DATASETS.register_module
class WIDERFaceDataset(XMLDataset):
    """WIDER Face (ref: mmdet/datasets/wider_face.py (WIDERFaceDataset)):
    XML-style annotations, but image files live under per-event FOLDERS
    (e.g. ``0--Parade/xxx.jpg``) recorded in each annotation's <folder> tag
    — not under JPEGImages/ like VOC."""

    CLASSES = ("face",)

    def load_annotations(self, ann_file: str) -> List[dict]:
        self.cat2label = {c: i + 1 for i, c in enumerate(self.CLASSES)}
        with open(ann_file) as f:
            img_ids = [line.strip() for line in f if line.strip()]
        infos = []
        for img_id in img_ids:
            xml_path = os.path.join(self.img_prefix, "Annotations",
                                    f"{img_id}.xml")
            root = ET.parse(xml_path).getroot()
            size = root.find("size")
            folder = root.find("folder").text
            infos.append(dict(
                id=img_id,
                filename=os.path.join(folder, f"{img_id}.jpg"),
                width=int(size.find("width").text),
                height=int(size.find("height").text)))
        return infos
