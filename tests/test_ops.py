"""Ops: RoIAlign vs torchvision-style manual oracle, masked/deform conv
properties, fused preprocess vs host pipeline."""

import numpy as np
import jax
import jax.numpy as jnp

from ioudet.ops import (roi_align, roi_pool, masked_conv2d, deform_conv2d,
                        preprocess)


class TestRoIAlign:
    def test_unit_roi_identity(self):
        """A 2x2 RoI aligned on a linear ramp reproduces interpolated values."""
        feat = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
        rois = jnp.asarray([[0, 0, 0, 3, 3]], jnp.float32)  # whole map
        out = roi_align(feat, rois, pooled_size=4, spatial_scale=1.0,
                        sample_num=2)
        assert out.shape == (1, 4, 4, 1)
        # output must be monotone along both axes like the input ramp
        o = np.asarray(out)[0, :, :, 0]
        assert (np.diff(o, axis=1) > 0).all()
        assert (np.diff(o, axis=0) > 0).all()

    def test_constant_map(self):
        feat = jnp.full((1, 8, 8, 3), 5.0)
        rois = jnp.asarray([[0, 2, 2, 6, 6]], jnp.float32)
        out = roi_align(feat, rois, pooled_size=2, spatial_scale=1.0)
        np.testing.assert_allclose(np.asarray(out), 5.0, rtol=1e-6)

    def test_invalid_roi_zeros(self):
        feat = jnp.ones((1, 8, 8, 3))
        rois = jnp.asarray([[-1, 0, 0, 4, 4]], jnp.float32)
        out = roi_align(feat, rois, pooled_size=2, spatial_scale=1.0)
        np.testing.assert_allclose(np.asarray(out), 0.0)

    def test_differentiable(self):
        feat = jnp.ones((1, 8, 8, 2))
        rois = jnp.asarray([[0, 1, 1, 5, 5]], jnp.float32)
        g = jax.grad(lambda f: roi_align(f, rois, pooled_size=2,
                                         spatial_scale=1.0).sum())(feat)
        assert float(jnp.abs(g).sum()) > 0

    def test_roi_pool_max(self):
        feat = jnp.zeros((1, 8, 8, 1)).at[0, 3, 3, 0].set(9.0)
        rois = jnp.asarray([[0, 0, 0, 7, 7]], jnp.float32)
        out = roi_pool(feat, rois, pooled_size=2, spatial_scale=1.0,
                       sample_num=8)
        # sampled max underestimates a 1-px peak by the bilinear weight of
        # the nearest sample; it must still dominate the zero background
        assert float(np.asarray(out).max()) > 3.5
        assert float(np.asarray(out).min()) == 0.0


class TestMaskedConv:
    def test_matches_dense_then_mask(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 4)), jnp.float32)
        k = jnp.asarray(rng.normal(0, 1, (3, 3, 4, 6)), jnp.float32)
        mask = jnp.asarray(rng.uniform(size=(1, 8, 8)) > 0.5)
        out = masked_conv2d(x, k, mask)
        m = np.asarray(mask)[0]
        o = np.asarray(out)[0]
        assert (o[~m] == 0).all()
        assert np.abs(o[m]).sum() > 0


class TestDeformConv:
    def test_zero_offsets_equal_conv(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 4)), jnp.float32)
        k = jnp.asarray(rng.normal(0, 1, (3, 3, 4, 5)), jnp.float32)
        offs = jnp.zeros((1, 8, 8, 18), jnp.float32)
        out = deform_conv2d(x, offs, k)
        ref = jax.lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_modulated_zero_mask_zero_output(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(0, 1, (1, 6, 6, 2)), jnp.float32)
        k = jnp.asarray(rng.normal(0, 1, (3, 3, 2, 3)), jnp.float32)
        offs = jnp.zeros((1, 6, 6, 18), jnp.float32)
        mask = jnp.zeros((1, 6, 6, 9), jnp.float32)
        out = deform_conv2d(x, offs, k, mask=mask)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)

    def test_integer_shift_offset(self):
        """Offset (0, +1) everywhere shifts sampling one pixel right."""
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 1)), jnp.float32)
        k = jnp.zeros((3, 3, 1, 1), jnp.float32).at[1, 1, 0, 0].set(1.0)
        offs = jnp.zeros((1, 8, 8, 18), jnp.float32)
        offs = offs.at[..., 2 * 4 + 1].set(1.0)  # center tap, dx=+1
        out = np.asarray(deform_conv2d(x, offs, k))[0, :, :-1, 0]
        ref = np.asarray(x)[0, :, 1:, 0]
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


class TestPreprocess:
    def test_shapes_and_factor(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.integers(0, 255, (480, 640, 3)), jnp.uint8)
        out, shape, factor = preprocess(img, jnp.asarray([480, 640]),
                                        canvas=(832, 1344),
                                        max_scale=(1333, 800))
        assert out.shape == (832, 1344, 3)
        np.testing.assert_allclose(float(factor), 800 / 480, rtol=1e-6)
        assert shape.tolist() == [800, 1067]
        # content region normalized, pad region exactly zero
        o = np.asarray(out)
        assert np.abs(o[:800, :1067]).mean() > 0.1
        np.testing.assert_allclose(o[800:], 0.0)
        np.testing.assert_allclose(o[:, 1067:], 0.0)

    def test_matches_host_pipeline_stats(self):
        """Device preprocess ~= host Resize+Normalize+Pad (bilinear details
        differ at edges; compare content-region statistics)."""
        from ioudet.data.pipelines.transforms import (Resize, Normalize, Pad)
        rng = np.random.default_rng(1)
        arr = rng.integers(0, 255, (240, 320, 3)).astype(np.uint8)
        host = Pad(size=(416, 672), size_divisor=32)(Normalize(
            mean=(123.675, 116.28, 103.53), std=(58.395, 57.12, 57.375),
            to_rgb=False)(Resize(img_scale=(666, 400))(dict(
                img=arr, img_shape=(240, 320), channel_order="rgb"))))
        dev, shape, factor = preprocess(
            jnp.asarray(arr), jnp.asarray([240, 320]), canvas=(416, 672),
            max_scale=(666, 400))
        h, w = host["img_shape"]
        d = np.asarray(dev)[:h, :w]
        hst = host["img"][:h, :w]
        assert abs(d.mean() - hst.mean()) < 0.05
        assert abs(d.std() - hst.std()) < 0.1
