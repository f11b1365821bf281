"""Checkpoint I/O (ref capability: mmcv save_checkpoint/load_checkpoint +
CheckpointHook; payload parity: {meta(epoch, iter, version, CLASSES, config),
state_dict, optimizer}).

Format: a directory with ``state.msgpack`` (flax serialization of
{params, opt_state, step, ...}) + ``meta.json``; ``latest`` marker file for
auto-resume.  Also ships a torch ``.pth`` -> params converter so reference
weights can be loaded for parity testing (torch-cpu is available in the dev
environment)."""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def save_checkpoint(work_dir: str, name: str, state_dict: Dict[str, Any],
                    meta: Optional[dict] = None) -> str:
    path = os.path.join(work_dir, name)
    os.makedirs(path, exist_ok=True)
    host_state = jax.tree.map(np.asarray, state_dict)
    with open(os.path.join(path, "state.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(host_state))
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta or {}, f, indent=2, default=str)
    with open(os.path.join(work_dir, "latest"), "w") as f:
        f.write(name)
    return path


def load_checkpoint(path: str, target: Optional[Dict[str, Any]] = None):
    """Returns (state_dict, meta).  With ``target`` given, restores into its
    pytree structure (dtype/shape validated); otherwise returns raw nested
    dicts."""
    if os.path.isfile(os.path.join(path, "..", "latest")) and not \
            os.path.isdir(path):
        raise FileNotFoundError(path)
    with open(os.path.join(path, "state.msgpack"), "rb") as f:
        data = f.read()
    if target is not None:
        state = serialization.from_bytes(target, data)
    else:
        state = serialization.msgpack_restore(data)
    meta_path = os.path.join(path, "meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


def latest_checkpoint(work_dir: str) -> Optional[str]:
    marker = os.path.join(work_dir, "latest")
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        return os.path.join(work_dir, f.read().strip())


# --------------------------------------------------------------------------
# torch .pth -> flax params converter (for loading reference / torchvision
# pretrained backbones; ref: load_checkpoint's torchvision:// scheme).
# --------------------------------------------------------------------------

def convert_torch_resnet(state_dict, depth: int = 50) -> dict:
    """Map a torchvision/mmdet ResNet state_dict to our flax param tree.

    Layout notes: torch conv weights are OIHW -> flax HWIO; BN becomes
    FrozenBatchNorm {scale, bias, mean, var}.
    """
    import re

    def conv(w):
        return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))

    def get(k):
        v = state_dict[k]
        try:  # torch tensor
            v = v.detach().cpu().numpy()
        except AttributeError:
            v = np.asarray(v)
        return v

    params: dict = {}

    def put(path, leaf):
        d = params
        for p in path[:-1]:
            d = d.setdefault(p, {})
        d[path[-1]] = leaf

    def bn(prefix, out_prefix):
        put(out_prefix + ("scale",), get(prefix + ".weight"))
        put(out_prefix + ("bias",), get(prefix + ".bias"))
        put(out_prefix + ("mean",), get(prefix + ".running_mean"))
        put(out_prefix + ("var",), get(prefix + ".running_var"))

    keys = list(state_dict.keys())
    put(("conv1", "kernel"), conv(get("conv1.weight")))
    bn("bn1", ("bn1",))
    block_pat = re.compile(r"layer(\d)\.(\d+)\.(conv|bn|downsample)(\d?)\.?(.*)")
    handled = set()
    for k in keys:
        m = block_pat.match(k)
        if not m:
            continue
        stage, block, kind, num, _rest = m.groups()
        name = f"layer{stage}_{block}"
        base = f"layer{stage}.{block}"
        if (base, kind, num) in handled:
            continue
        handled.add((base, kind, num))
        if kind == "conv":
            put((name, f"conv{num}", "kernel"), conv(get(f"{base}.conv{num}.weight")))
        elif kind == "bn":
            bn(f"{base}.bn{num}", (name, f"bn{num}"))
        elif kind == "downsample":
            put((name, "downsample_conv", "kernel"),
                conv(get(f"{base}.downsample.0.weight")))
            bn(f"{base}.downsample.1", (name, "downsample_bn"))
    return params


def _t2np(v):
    try:
        return v.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(v)


def _conv_oihw_to_hwio(w):
    return np.ascontiguousarray(np.transpose(_t2np(w), (2, 3, 1, 0)))


def convert_torch_fpn(state_dict, num_laterals: int) -> dict:
    """Map mmdet FPN weights (lateral_convs.N.conv / fpn_convs.N.conv) to our
    flax FPN tree (lateral_N/conv, fpn_N/conv, extra_N/conv).  mmdet stores
    the stride-2 extra convs as fpn_convs[num_laterals + j]."""
    params: dict = {}
    for k in state_dict:
        if not k.endswith(".conv.weight"):
            continue
        group, idx = k.split(".")[0], int(k.split(".")[1])
        if group == "lateral_convs":
            name = f"lateral_{idx}"
        elif group == "fpn_convs":
            name = f"fpn_{idx}" if idx < num_laterals else \
                f"extra_{idx - num_laterals}"
        else:
            continue
        base = f"{group}.{idx}.conv"
        params[name] = {"conv": {
            "kernel": _conv_oihw_to_hwio(state_dict[base + ".weight"]),
            "bias": _t2np(state_dict[base + ".bias"]),
        }}
    return params


def convert_torch_retina_head(state_dict, stacked_convs: int = 4) -> dict:
    """Map mmdet RetinaHead / IoUAwareRetinaHead weights to our flax tree.

    mmdet: cls_convs.N.conv, reg_convs.N.conv, retina_cls, retina_reg
    (+ retina_iou in the fork) -> ours: cls_convN, reg_convN, retina_cls,
    retina_reg, retina_iou.  Channel layout needs no shuffling: both sides
    emit anchor-major (a*C + c) channels and flatten location-major.
    """
    params: dict = {}

    def conv_entry(src, dst):
        if src + ".weight" not in state_dict:
            return
        params[dst] = {
            "kernel": _conv_oihw_to_hwio(state_dict[src + ".weight"]),
            "bias": _t2np(state_dict[src + ".bias"]),
        }

    for i in range(stacked_convs):
        conv_entry(f"cls_convs.{i}.conv", f"cls_conv{i}")
        conv_entry(f"reg_convs.{i}.conv", f"reg_conv{i}")
    for leaf in ("retina_cls", "retina_reg", "retina_iou"):
        conv_entry(leaf, leaf)
    return params


def convert_torch_hrnet(state_dict) -> dict:
    """Map an mmcv/mmdet HRNet state_dict to our flax HRNet tree (ref:
    mmdet/models/backbones/hrnet.py param naming).

    torch -> flax correspondence:
      conv1/bn1, conv2/bn2 (stem)        -> stem{0,1} / stem_bn{0,1}
      layer1.{j}.*                        -> layer1_{j}.* (Bottleneck)
      transition{t}.{b}.(0|0.0).weight    -> stage{t+1}_trans{b}
      transition{t}.{b}.(1|0.1).*         -> stage{t+1}_trans_bn{b}
      stage{s}.{m}.branches.{b}.{j}.*     -> stage{s}_module{m}.branch{b}_block{j}.*
      stage{s}.{m}.fuse_layers.{i}.{j}.0  -> ...fuse_{i}_{j} (+ fuse_bn, j>i)
      stage{s}.{m}.fuse_layers.{i}.{j}.{k}.0 -> ...fuse_{i}_{j}_{k} (j<i)
    """
    import re

    params: dict = {}

    def put(path, leaf):
        d = params
        for p in path[:-1]:
            d = d.setdefault(p, {})
        d[path[-1]] = leaf

    def bn(prefix, out):
        put(out + ("scale",), _t2np(state_dict[prefix + ".weight"]))
        put(out + ("bias",), _t2np(state_dict[prefix + ".bias"]))
        put(out + ("mean",), _t2np(state_dict[prefix + ".running_mean"]))
        put(out + ("var",), _t2np(state_dict[prefix + ".running_var"]))

    put(("stem0", "kernel"), _conv_oihw_to_hwio(state_dict["conv1.weight"]))
    bn("bn1", ("stem_bn0",))
    put(("stem1", "kernel"), _conv_oihw_to_hwio(state_dict["conv2.weight"]))
    bn("bn2", ("stem_bn1",))

    block_pat = re.compile(r"layer1\.(\d+)\.(conv(\d)|bn(\d)|downsample)")
    trans_pat = re.compile(r"transition(\d)\.(\d+)\.")
    stage_pat = re.compile(r"stage(\d)\.(\d+)\.(branches|fuse_layers)\.")
    done = set()
    for k in state_dict:
        m = block_pat.match(k)
        if m:
            j = m.group(1)
            name = f"layer1_{j}"
            base = f"layer1.{j}"
            if (base, m.group(2)) in done:
                continue
            done.add((base, m.group(2)))
            if m.group(2) == "downsample":
                put((name, "downsample_conv", "kernel"),
                    _conv_oihw_to_hwio(state_dict[base + ".downsample.0.weight"]))
                bn(base + ".downsample.1", (name, "downsample_bn"))
            elif m.group(3):  # convN
                n = m.group(3)
                put((name, f"conv{n}", "kernel"),
                    _conv_oihw_to_hwio(state_dict[f"{base}.conv{n}.weight"]))
            else:
                n = m.group(4)
                bn(f"{base}.bn{n}", (name, f"bn{n}"))
            continue
        m = trans_pat.match(k)
        if m:
            t, b = m.group(1), m.group(2)
            base = f"transition{t}.{b}"
            if base in done:
                continue
            done.add(base)
            stage = f"stage{int(t) + 1}"
            # existing-branch: Sequential(conv, bn); new-branch: nested
            cw = (base + ".0.weight" if base + ".0.weight" in state_dict
                  else base + ".0.0.weight")
            bnp = (base + ".1" if base + ".1.weight" in state_dict
                   else base + ".0.1")
            put((f"{stage}_trans{b}", "kernel"),
                _conv_oihw_to_hwio(state_dict[cw]))
            bn(bnp, (f"{stage}_trans_bn{b}",))
            continue
        m = stage_pat.match(k)
        if m:
            s, mod, group = m.groups()
            base = f"stage{s}.{mod}.{group}"
            flax_mod = f"stage{s}_module{mod}"
            if group == "branches":
                pat = re.compile(re.escape(base) +
                                 r"\.(\d+)\.(\d+)\.(conv|bn)(\d)")
                mm = pat.match(k)
                if not mm:
                    continue
                b, j, kind, n = mm.groups()
                key = (base, b, j, kind, n)
                if key in done:
                    continue
                done.add(key)
                blk = (flax_mod, f"branch{b}_block{j}")
                src = f"{base}.{b}.{j}"
                if kind == "conv":
                    put(blk + (f"conv{n}", "kernel"),
                        _conv_oihw_to_hwio(state_dict[f"{src}.conv{n}.weight"]))
                else:
                    bn(f"{src}.bn{n}", blk + (f"bn{n}",))
            else:  # fuse_layers
                up = re.compile(re.escape(base) + r"\.(\d+)\.(\d+)\.(0|1)\.")
                down = re.compile(re.escape(base) +
                                  r"\.(\d+)\.(\d+)\.(\d+)\.(0|1)\.")
                md = down.match(k)
                if md and md.group(4) in "01" and k.count(".") >= 6:
                    i, j, kk = md.group(1), md.group(2), md.group(3)
                    if int(j) < int(i):  # genuine downsample chain
                        key = (base, i, j, kk)
                        if key in done:
                            continue
                        done.add(key)
                        src = f"{base}.{i}.{j}.{kk}"
                        put((flax_mod, f"fuse_{i}_{j}_{kk}", "kernel"),
                            _conv_oihw_to_hwio(state_dict[src + ".0.weight"]))
                        bn(src + ".1", (flax_mod, f"fuse_bn_{i}_{j}_{kk}"))
                        continue
                mu = up.match(k)
                if mu:
                    i, j = mu.group(1), mu.group(2)
                    if int(j) > int(i):
                        key = (base, i, j)
                        if key in done:
                            continue
                        done.add(key)
                        src = f"{base}.{i}.{j}"
                        put((flax_mod, f"fuse_{i}_{j}", "kernel"),
                            _conv_oihw_to_hwio(state_dict[src + ".0.weight"]))
                        bn(src + ".1", (flax_mod, f"fuse_bn_{i}_{j}"))
    return params


_VGG16_FEATURE_IDX = {  # torch Sequential index -> flax conv name
    0: "conv1_1", 2: "conv1_2", 5: "conv2_1", 7: "conv2_2",
    10: "conv3_1", 12: "conv3_2", 14: "conv3_3",
    17: "conv4_1", 19: "conv4_2", 21: "conv4_3",
    24: "conv5_1", 26: "conv5_2", 28: "conv5_3",
    31: "fc6", 33: "fc7",
}


def convert_torch_ssd_vgg(state_dict) -> dict:
    """Map an mmdet SSDVGG state_dict (torchvision vgg16 ``features.N``
    Sequential indices + ``extra.N`` tower + ``l2_norm``) to our flax tree
    (ref: mmdet/models/backbones/ssd_vgg.py layer layout)."""
    params: dict = {}
    for k in state_dict:
        if k.startswith("features."):
            idx = int(k.split(".")[1])
            name = _VGG16_FEATURE_IDX.get(idx)
            if name is None:
                continue
            entry = params.setdefault(name, {})
            if k.endswith(".weight"):
                entry["kernel"] = _conv_oihw_to_hwio(state_dict[k])
            else:
                entry["bias"] = _t2np(state_dict[k])
        elif k.startswith("extra."):
            idx = int(k.split(".")[1])
            entry = params.setdefault(f"extra{idx}", {})
            if k.endswith(".weight"):
                entry["kernel"] = _conv_oihw_to_hwio(state_dict[k])
            else:
                entry["bias"] = _t2np(state_dict[k])
        elif k.startswith("l2_norm"):
            params["l2norm"] = {"gamma": _t2np(state_dict[k])}
    return params


def convert_torch_retinanet(state_dict, depth: int = 50,
                            num_laterals: int = 3,
                            stacked_convs: int = 4) -> dict:
    """Full-detector converter for the RetinaNet/IoU-aware family: a
    reference checkpoint ({backbone,neck,bbox_head}.-prefixed torch
    state_dict) -> our {backbone, neck, bbox_head} flax param tree
    (ref capability: mmcv load_checkpoint on the full model)."""
    def sub(prefix):
        return {k[len(prefix):]: v for k, v in state_dict.items()
                if k.startswith(prefix)}

    return {
        "backbone": convert_torch_resnet(sub("backbone."), depth=depth),
        "neck": convert_torch_fpn(sub("neck."), num_laterals=num_laterals),
        "bbox_head": convert_torch_retina_head(sub("bbox_head."),
                                               stacked_convs=stacked_convs),
    }


def convert_torch_rpn_head(state_dict) -> dict:
    """Map mmdet RPNHead weights (rpn_conv / rpn_cls / rpn_reg plain Conv2d,
    ref: mmdet/models/anchor_heads/rpn_head.py) to our flax tree (same
    names).  Channel layout needs no shuffling (anchor-major channels both
    sides)."""
    params: dict = {}
    for leaf in ("rpn_conv", "rpn_cls", "rpn_reg"):
        params[leaf] = {
            "kernel": _conv_oihw_to_hwio(state_dict[leaf + ".weight"]),
            "bias": _t2np(state_dict[leaf + ".bias"]),
        }
    return params


def convert_torch_shared_fc_bbox_head(state_dict, roi_feat_size: int = 7,
                                      in_channels: int = 256,
                                      num_shared_fcs: int = 2) -> dict:
    """Map mmdet SharedFCBBoxHead weights (shared_fcs.N / fc_cls / fc_reg,
    ref: mmdet/models/bbox_heads/convfc_bbox_head.py) to our flax tree
    (shared_fcN / fc_cls / fc_reg).

    The FIRST shared fc consumes the flattened RoI feature: torch flattens
    (C, S, S) channel-major, our trunk flattens (S, S, C) spatial-major, so
    that fc's input axis must be permuted CHW -> HWC; later fcs and the
    cls/reg heads are plain transposes."""
    params: dict = {}

    def dense(src, dst, permute_first=False):
        w = _t2np(state_dict[src + ".weight"])      # (out, in)
        if permute_first:
            out = w.shape[0]
            w = w.reshape(out, in_channels, roi_feat_size, roi_feat_size)
            w = w.transpose(0, 2, 3, 1).reshape(out, -1)
        params[dst] = {"kernel": w.T.copy(),
                       "bias": _t2np(state_dict[src + ".bias"])}

    for i in range(num_shared_fcs):
        dense(f"shared_fcs.{i}", f"shared_fc{i}", permute_first=(i == 0))
    dense("fc_cls", "fc_cls")
    dense("fc_reg", "fc_reg")
    return params


def convert_torch_fcn_mask_head(state_dict, num_convs: int = 4) -> dict:
    """Map mmdet FCNMaskHead weights (convs.N.conv / upsample / conv_logits,
    ref: mmdet/models/mask_heads/fcn_mask_head.py) to our flax tree
    (convN / upsample / conv_logits).

    Two layout crossings live here (asserted in
    tests/test_two_stage_parity.py::TestMaskHeadParity):
      * ``upsample`` is a ConvTranspose2d whose torch weight is
        (in, out, kh, kw) and which computes the GRADIENT-of-conv transpose;
        flax nn.ConvTranspose is a fractionally-strided forward conv
        ((kh, kw, in, out) kernel, no flip), so the spatial dims must be
        FLIPPED in addition to the axis permute.
      * mmdet's conv_logits emits ``num_classes`` channels (bg channel 0
        never trained nor read — get_seg_masks indexes 1-based labels);
        ours emits num_classes-1, so channel 0 is dropped when present.
    """
    params: dict = {}
    for i in range(num_convs):
        base = f"convs.{i}.conv"
        params[f"conv{i}"] = {
            "kernel": _conv_oihw_to_hwio(state_dict[base + ".weight"]),
            "bias": _t2np(state_dict[base + ".bias"]),
        }
    w = _t2np(state_dict["upsample.weight"])          # (in, out, kh, kw)
    params["upsample"] = {
        "kernel": np.ascontiguousarray(
            w.transpose(2, 3, 0, 1)[::-1, ::-1]),
        "bias": _t2np(state_dict["upsample.bias"]),
    }
    lw = _conv_oihw_to_hwio(state_dict["conv_logits.weight"])  # (1,1,in,C)
    lb = _t2np(state_dict["conv_logits.bias"])
    if lw.shape[-1] > 1:  # class-specific: drop the unused bg channel
        lw, lb = lw[..., 1:], lb[1:]
    params["conv_logits"] = {"kernel": np.ascontiguousarray(lw), "bias": lb}
    return params


def convert_torch_faster_rcnn(state_dict, depth: int = 50,
                              num_laterals: int = 4,
                              roi_feat_size: int = 7,
                              head_in_channels: int = 256,
                              num_shared_fcs: int = 2) -> dict:
    """Full-detector converter for the Faster R-CNN family: a reference
    checkpoint ({backbone,neck,rpn_head,bbox_head}.-prefixed torch
    state_dict) -> our flax param tree.  End-to-end parity with an
    independent torch twin is asserted in tests/test_two_stage_parity.py."""
    def sub(prefix):
        return {k[len(prefix):]: v for k, v in state_dict.items()
                if k.startswith(prefix)}

    return {
        "backbone": convert_torch_resnet(sub("backbone."), depth=depth),
        "neck": convert_torch_fpn(sub("neck."), num_laterals=num_laterals),
        "rpn_head": convert_torch_rpn_head(sub("rpn_head.")),
        "bbox_head": convert_torch_shared_fc_bbox_head(
            sub("bbox_head."), roi_feat_size=roi_feat_size,
            in_channels=head_in_channels, num_shared_fcs=num_shared_fcs),
    }


def convert_torch_mask_rcnn(state_dict, depth: int = 50,
                            num_laterals: int = 4,
                            roi_feat_size: int = 7,
                            head_in_channels: int = 256,
                            num_shared_fcs: int = 2,
                            mask_num_convs: int = 4) -> dict:
    """Mask R-CNN converter = Faster R-CNN + FCNMaskHead (ref:
    mmdet/models/detectors/mask_rcnn.py module layout).  Parity asserted in
    tests/test_two_stage_parity.py."""
    def sub(prefix):
        return {k[len(prefix):]: v for k, v in state_dict.items()
                if k.startswith(prefix)}

    tree = convert_torch_faster_rcnn(
        state_dict, depth=depth, num_laterals=num_laterals,
        roi_feat_size=roi_feat_size, head_in_channels=head_in_channels,
        num_shared_fcs=num_shared_fcs)
    tree["mask_head"] = convert_torch_fcn_mask_head(
        sub("mask_head."), num_convs=mask_num_convs)
    return tree
