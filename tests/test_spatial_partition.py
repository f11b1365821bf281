"""GSPMD spatial partitioning (parallel/spatial.py): the conv grid sharded
across a mesh axis at inference must be numerically identical to the
unsharded program — XLA inserts the halo exchanges, we assert exactness.

No reference analog (SURVEY §5.7 marks spatial sharding roadmap-only); this
is TPU-native scale-out for images too large for one chip's HBM.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ioudet.parallel.spatial import make_spatial_mesh, spatial_predict_fn


def small_detector():
    from ioudet.models import build_detector

    cfg = dict(
        type="IoUAwareRetinaNet",
        backbone=dict(type="ResNet", depth=18, frozen_stages=1,
                      norm_cfg=dict(type="FrozenBN")),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1, add_extra_convs=True,
                  num_outs=5),
        bbox_head=dict(type="IoUAwareRetinaHead", num_classes=5,
                       in_channels=32, feat_channels=32, stacked_convs=1,
                       anchor_strides=(8, 16, 32, 64, 128),
                       loss_cls=dict(type="FocalLoss", use_sigmoid=True,
                                     gamma=2.0, alpha=0.25, loss_weight=1.0),
                       loss_bbox=dict(type="SmoothL1Loss", beta=0.11,
                                      loss_weight=1.0)))
    test_cfg = dict(nms_pre=100, score_thr=0.05, nms=dict(iou_thr=0.5),
                    max_per_img=10)
    return build_detector(cfg, dict(), test_cfg)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_spatial_shard_matches_unsharded():
    det = small_detector()
    B, canvas = 2, (128, 128)
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.normal(0, 1, (B,) + canvas + (3,)), jnp.float32)
    img_shape = jnp.tile(jnp.asarray([[120, 124]], jnp.int32), (B, 1))
    pad_shape = jnp.tile(jnp.asarray([list(canvas)], jnp.int32), (B, 1))
    scale = jnp.ones((B,), jnp.float32)

    params = det.init(jax.random.PRNGKey(0), img)["params"]

    ref_dets, ref_labels = jax.jit(
        lambda p, im: det.apply({"params": p}, im, img_shape, scale,
                                pad_shape, method=det.simple_test))(params, img)

    mesh = make_spatial_mesh(n_spatial=4, n_data=2)
    assert mesh.devices.shape == (2, 4)
    predict = spatial_predict_fn(det, mesh)
    sp_dets, sp_labels = predict(params, img, img_shape, scale, pad_shape)

    # the sharded program is the same math; halo exchange must be exact up
    # to float reassociation in conv reductions
    np.testing.assert_allclose(np.asarray(sp_dets), np.asarray(ref_dets),
                               rtol=1e-4, atol=1e-4)
    # labels can only differ where scores were thresholded to padding
    ref_l, sp_l = np.asarray(ref_labels), np.asarray(sp_labels)
    valid = np.asarray(ref_dets)[..., 4] > 0
    np.testing.assert_array_equal(sp_l[valid], ref_l[valid])


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_spatial_mesh_shapes():
    with pytest.raises(ValueError):
        make_spatial_mesh(n_spatial=16)
    m = make_spatial_mesh(n_spatial=8, n_data=1)
    assert m.axis_names == ("data", "spatial")
