"""Deformable RoI pooling: kernel semantics + pack modules + extractor
integration (ref: mmdet/ops/dcn/deform_pool.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from ioudet.ops.deform_pool import (DeformRoIPoolingPack,
                                    ModulatedDeformRoIPoolingPack,
                                    deform_roi_pool)
from ioudet.ops.roi_align import roi_align


def _feats(rng, B=1, H=16, W=16, C=4):
    return jnp.asarray(rng.normal(0, 1, (B, H, W, C)), jnp.float32)


def test_zero_offsets_match_roi_align():
    rng = np.random.default_rng(0)
    feats = _feats(rng)
    rois = jnp.asarray([[0, 8.0, 8.0, 120.0, 104.0]])
    a = roi_align(feats, rois, pooled_size=7, spatial_scale=1 / 16.0,
                  sample_num=2)
    d = deform_roi_pool(feats, rois, None, pooled_size=7,
                        spatial_scale=1 / 16.0, sample_num=2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(d), rtol=1e-6)


def test_offset_shifts_sampling():
    """On a horizontal-ramp feature map, a +dx offset increases every bin's
    pooled value by exactly dx (bilinear of a linear ramp is linear)."""
    H = W = 32
    ramp = jnp.broadcast_to(jnp.arange(W, dtype=jnp.float32)[None, :, None],
                            (H, W, 1))[None]
    rois = jnp.asarray([[0, 64.0, 64.0, 384.0, 384.0]])  # maps to [4,24]
    base = deform_roi_pool(ramp, rois, None, pooled_size=4,
                           spatial_scale=1 / 16.0, sample_num=2)
    # dx normalized by roi width (20 px on the map? no: trans_std*roi_w px)
    off = jnp.zeros((1, 4, 4, 2)).at[..., 1].set(0.5)
    shifted = deform_roi_pool(ramp, rois, off, pooled_size=4,
                              spatial_scale=1 / 16.0, sample_num=2,
                              trans_std=0.1)
    roi_w = (384 - 64) / 16.0
    np.testing.assert_allclose(np.asarray(shifted - base),
                               0.5 * 0.1 * roi_w, rtol=1e-5)


def test_offsets_are_differentiable():
    rng = np.random.default_rng(1)
    feats = _feats(rng)
    rois = jnp.asarray([[0, 16.0, 16.0, 200.0, 200.0]])

    def f(off):
        return deform_roi_pool(feats, rois, off, pooled_size=3,
                               sample_num=2).sum()

    g = jax.grad(f)(jnp.zeros((1, 3, 3, 2)))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_pack_modules_init_as_roi_align():
    """Zero-init offset FC means the packs start exactly as plain pooling
    (modulated additionally halves via sigmoid(0)=0.5)."""
    rng = np.random.default_rng(2)
    feats = _feats(rng)
    rois = jnp.asarray([[0, 8.0, 8.0, 120.0, 104.0]])
    plain = deform_roi_pool(feats, rois, None, pooled_size=7, sample_num=2)
    pack = DeformRoIPoolingPack(out_size=7, sample_num=2)
    params = pack.init(jax.random.PRNGKey(0), feats, rois)
    out = pack.apply(params, feats, rois)
    np.testing.assert_allclose(np.asarray(out), np.asarray(plain), rtol=1e-6)
    mpack = ModulatedDeformRoIPoolingPack(out_size=7, sample_num=2)
    mparams = mpack.init(jax.random.PRNGKey(0), feats, rois)
    mout = mpack.apply(mparams, feats, rois)
    np.testing.assert_allclose(np.asarray(mout), 0.5 * np.asarray(plain),
                               rtol=1e-5)


def test_extractor_with_deform_pool():
    from ioudet.models.roi_extractors import SingleRoIExtractor
    rng = np.random.default_rng(3)
    feats = [jnp.asarray(rng.normal(0, 1, (1, 32 // s, 32 // s, 8)),
                         jnp.float32) for s in (1, 2, 4, 8)]
    ext = SingleRoIExtractor(
        out_channels=8, featmap_strides=(4, 8, 16, 32),
        roi_layer=dict(type="ModulatedDeformRoIPoolingPack", out_size=7,
                       sample_num=2, trans_std=0.1))
    rois = jnp.asarray([[0, 8.0, 8.0, 100.0, 90.0]])
    params = ext.init(jax.random.PRNGKey(0), feats, rois)
    out = ext.apply(params, feats, rois)
    assert out.shape == (1, 7, 7, 8)
    assert np.isfinite(np.asarray(out)).all()
