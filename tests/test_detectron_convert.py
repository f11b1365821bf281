"""Detectron(caffe2) -> ioudet backbone converter (ref capability:
tools/detectron2pytorch.py; VERDICT r2 noted it as the one missing analysis
tool)."""

import numpy as np
import jax
import jax.numpy as jnp

from tools.detectron2ioudet import STAGE_BLOCKS, convert_detectron_resnet


def _fake_blobs(depth=50):
    rng = np.random.default_rng(0)
    blobs = {"conv1_w": rng.normal(0, 0.1, (64, 3, 7, 7)).astype(np.float32),
             "res_conv1_bn_s": rng.uniform(0.5, 1.5, 64).astype(np.float32),
             "res_conv1_bn_b": rng.normal(0, 0.1, 64).astype(np.float32)}
    in_ch = 64
    for si, n in enumerate(STAGE_BLOCKS[depth]):
        planes = 64 * 2 ** si
        out_ch = planes * 4
        for b in range(n):
            widths = [(planes, in_ch if b == 0 else out_ch, 1),
                      (planes, planes, 3), (out_ch, planes, 1)]
            for letter, (o, i, k) in zip("abc", widths):
                blobs[f"res{si + 2}_{b}_branch2{letter}_w"] = rng.normal(
                    0, 0.1, (o, i, k, k)).astype(np.float32)
                blobs[f"res{si + 2}_{b}_branch2{letter}_bn_s"] = rng.uniform(
                    0.5, 1.5, o).astype(np.float32)
                blobs[f"res{si + 2}_{b}_branch2{letter}_bn_b"] = rng.normal(
                    0, 0.1, o).astype(np.float32)
            if b == 0:
                blobs[f"res{si + 2}_{b}_branch1_w"] = rng.normal(
                    0, 0.1, (out_ch, in_ch, 1, 1)).astype(np.float32)
                blobs[f"res{si + 2}_{b}_branch1_bn_s"] = rng.uniform(
                    0.5, 1.5, out_ch).astype(np.float32)
                blobs[f"res{si + 2}_{b}_branch1_bn_b"] = rng.normal(
                    0, 0.1, out_ch).astype(np.float32)
        in_ch = out_ch
    return blobs


def test_tree_matches_resnet50_init():
    from ioudet.models.backbones import ResNet
    tree = convert_detectron_resnet(_fake_blobs(), depth=50)
    bb = ResNet(depth=50, frozen_stages=-1,
                norm_cfg=dict(type="FrozenBN"))
    init = bb.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 64, 64, 3)))["params"]
    init_paths = {jax.tree_util.keystr(p): v.shape for p, v in
                  jax.tree_util.tree_leaves_with_path(init)}
    conv_paths = {jax.tree_util.keystr(p): np.shape(v) for p, v in
                  jax.tree_util.tree_leaves_with_path(tree)}
    assert init_paths == conv_paths


def test_affine_only_bn_folds_exactly():
    """With no running-stat blobs, converted FrozenBN(mean=0, var=1) must
    reproduce the caffe2 AffineChannel y = x*s + b (up to the eps in
    rsqrt(1+eps))."""
    from ioudet.models.utils.layers import FrozenBatchNorm
    blobs = _fake_blobs()
    tree = convert_detectron_resnet(blobs, depth=50)
    p = tree["bn1"]
    m = FrozenBatchNorm(features=64)
    x = jnp.asarray(np.random.default_rng(1).normal(
        0, 1, (1, 4, 4, 64)).astype(np.float32))
    y = m.apply({"params": jax.tree.map(jnp.asarray, p)}, x)
    want = np.asarray(x) * blobs["res_conv1_bn_s"] + blobs["res_conv1_bn_b"]
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-4, atol=1e-4)
