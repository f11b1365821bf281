#!/usr/bin/env python
"""Convert PASCAL VOC XML annotations into COCO-format json (ref:
tools/convert_datasets/pascal_voc.py), so VOC can also run through the COCO
evaluator."""

import argparse
import json
import os
import sys
import xml.etree.ElementTree as ET

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("devkit", help="VOCdevkit path")
    p.add_argument("--year", default="2007")
    p.add_argument("--split", default="trainval")
    p.add_argument("--out", required=True)
    args = p.parse_args()

    from ioudet.core.evaluation.class_names import VOC_CLASSES

    root = os.path.join(args.devkit, f"VOC{args.year}")
    with open(os.path.join(root, "ImageSets", "Main",
                           f"{args.split}.txt")) as f:
        ids = [l.strip() for l in f if l.strip()]
    cat2id = {c: i + 1 for i, c in enumerate(VOC_CLASSES)}
    images, annotations = [], []
    ann_id = 0
    for idx, img_id in enumerate(ids):
        xml = ET.parse(os.path.join(root, "Annotations",
                                    f"{img_id}.xml")).getroot()
        size = xml.find("size")
        images.append(dict(id=idx, file_name=f"JPEGImages/{img_id}.jpg",
                           width=int(size.find("width").text),
                           height=int(size.find("height").text)))
        for obj in xml.findall("object"):
            name = obj.find("name").text
            if name not in cat2id:
                continue
            bb = obj.find("bndbox")
            x1, y1, x2, y2 = (float(bb.find(t).text) for t in
                              ("xmin", "ymin", "xmax", "ymax"))
            difficult = int(obj.find("difficult").text or 0) \
                if obj.find("difficult") is not None else 0
            annotations.append(dict(
                id=ann_id, image_id=idx, category_id=cat2id[name],
                bbox=[x1, y1, x2 - x1, y2 - y1],
                area=(x2 - x1) * (y2 - y1), iscrowd=0, ignore=difficult))
            ann_id += 1
    categories = [dict(id=i, name=c) for c, i in cat2id.items()]
    with open(args.out, "w") as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=categories), f)
    print(f"wrote {args.out}: {len(images)} images, {len(annotations)} anns")


if __name__ == "__main__":
    main()
