"""Config-space build test (ref: tests/test_config.py): every config in
configs/ must parse and build a detector — catches registry/schema drift
across the whole zoo without weights or data."""

import glob
import os

import pytest

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")
CONFIGS = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.py")))


@pytest.mark.parametrize("cfg_path", CONFIGS, ids=os.path.basename)
def test_config_builds(cfg_path):
    from ioudet import Config
    from ioudet.models import build_detector

    cfg = Config.fromfile(cfg_path)
    assert "model" in cfg and "train_cfg" in cfg and "test_cfg" in cfg
    det = build_detector(dict(cfg.model), cfg.get("train_cfg"),
                         cfg.get("test_cfg"))
    # proposal-only models (RPN / GA-RPN) carry rpn_head instead of bbox_head
    assert (getattr(det, "bbox_head", None) is not None or
            getattr(det, "rpn_head", None) is not None)
    assert det.backbone is not None
    # data pipelines must also build
    from ioudet.data.pipelines.compose import Compose
    for split in ("train", "val", "test"):
        if split in cfg.data:
            Compose(cfg.data[split]["pipeline"])


def test_config_inheritance():
    from ioudet import Config
    cfg = Config.fromfile(os.path.join(CONFIG_DIR, "retinanet_r50_fpn_1x.py"))
    # inherits the base's backbone but swaps the head type
    assert cfg.model["type"] == "RetinaNet"
    assert cfg.model["backbone"]["depth"] == 50
    assert cfg.model["bbox_head"]["type"] == "RetinaHead"
    # None override deletes the inherited key at build time
    from ioudet.models import build_detector
    det = build_detector(dict(cfg.model), cfg.get("train_cfg"),
                         cfg.get("test_cfg"))
    assert type(det.bbox_head).__name__ == "RetinaHead"
