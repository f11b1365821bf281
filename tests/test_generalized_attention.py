"""Faithful GeneralizedAttention (VERDICT r2 missing #6): the four-term
energy, per-term structural properties, and backbone injection.

Ref: mmdet/models/plugins/generalized_attention.py (GeneralizedAttention),
configs/empirical_attention/."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ioudet.models.plugins import GeneralizedAttention


def _run(at, x, seed=0, **kw):
    m = GeneralizedAttention(num_heads=2, attention_type=at, kv_stride=2,
                             **kw)
    v = m.init(jax.random.PRNGKey(seed), x)
    return m, v, m.apply(v, x)


class TestTerms:
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 12, 16))

    @pytest.mark.parametrize("at", ["1000", "0100", "0010", "0001", "1111",
                                    "1010"])
    def test_builds_and_preserves_shape(self, at):
        _, _, y = _run(at, self.x)
        assert y.shape == self.x.shape
        assert np.isfinite(np.asarray(y)).all()

    @pytest.mark.parametrize("at", ["1000", "0100", "0010", "0001", "1111"])
    def test_residual_at_init(self, at):
        """proj_conv is zero-init: the block starts as identity."""
        _, _, y = _run(at, self.x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(self.x),
                                   atol=1e-6)

    def test_param_terms_present(self):
        _, v, _ = _run("1111", self.x)
        p = v["params"]
        assert {"query_conv", "key_conv", "value_conv", "proj_conv",
                "appr_bias", "geom_bias", "appr_geom_fc_x",
                "appr_geom_fc_y"} <= set(p)
        # content-content only: no position/bias machinery
        _, v2, _ = _run("1000", self.x)
        assert "appr_geom_fc_x" not in v2["params"]
        assert "appr_bias" not in v2["params"]
        # key-content-only: no query conv
        _, v3, _ = _run("0010", self.x)
        assert "query_conv" not in v3["params"]

    def _attn_of(self, m, v, x):
        """Recompute the block's attention output pre-projection by
        applying with a probe: use unit proj to expose the attended value.
        Simpler: read the softmax via intercept — here we instead compare
        outputs after replacing proj_conv kernel with identity-ish."""
        p = jax.tree_util.tree_map(lambda a: a, v["params"])
        k = np.zeros(p["proj_conv"]["kernel"].shape, np.float32)
        c = k.shape[-1]
        for i in range(min(k.shape[-2], c)):
            k[0, 0, i, i] = 1.0
        p = dict(p)
        p["proj_conv"] = dict(p["proj_conv"], kernel=jnp.asarray(k))
        return m.apply({"params": p}, x) - x

    def test_key_only_term_is_query_independent(self):
        """attention_type '0010' scores keys by content alone — every query
        position receives the SAME attended value."""
        m, v, _ = _run("0010", self.x)
        out = np.asarray(self._attn_of(m, v, self.x))
        # all spatial positions identical per (batch, channel)
        flat = out.reshape(out.shape[0], -1, out.shape[-1])
        np.testing.assert_allclose(
            flat, np.broadcast_to(flat[:, :1], flat.shape), atol=1e-5)

    def test_position_only_term_is_content_equivariant(self):
        """attention_type '0001' attends purely by relative position: the
        attention map is input-independent, so attended output of a
        shifted-impulse input equals the shift of the original's output
        pattern (up to kv-grid alignment).  Weaker, robust check: two
        different random inputs produce the same attention weights —
        attended outputs differ only through the value projection, so a
        CONSTANT input must give a constant output regardless of content
        elsewhere... use: doubling the input doubles the attended output
        exactly (linearity in values with fixed attention)."""
        m, v, _ = _run("0001", self.x)
        a1 = self._attn_of(m, v, self.x)
        a2 = self._attn_of(m, v, 2.0 * self.x)
        np.testing.assert_allclose(np.asarray(a2), 2 * np.asarray(a1),
                                   rtol=1e-4, atol=1e-5)

    def test_content_content_not_linear_in_values(self):
        """Contrast with '1000': scaling the input changes the attention
        logits too, so the output is NOT exactly linear."""
        m, v, _ = _run("1000", self.x)
        a1 = self._attn_of(m, v, self.x)
        a2 = self._attn_of(m, v, 2.0 * self.x)
        assert float(jnp.max(jnp.abs(a2 - 2 * a1))) > 1e-4


class TestBackboneInjection:
    def test_resnet_stage_block_injection(self):
        from ioudet.models import build_detector
        det = build_detector(dict(
            type="RetinaNet",
            backbone=dict(type="ResNet", depth=50, frozen_stages=-1,
                          norm_cfg=dict(type="FrozenBN"),
                          gen_attention=dict(spatial_range=-1, num_heads=8,
                                             attention_type="1111",
                                             kv_stride=2),
                          stage_with_gen_attention=[(), (), (0, 2), (0,)]),
            neck=dict(type="FPN", in_channels=[256, 512, 1024, 2048],
                      out_channels=32, start_level=1, add_extra_convs=True,
                      num_outs=5),
            bbox_head=dict(type="RetinaHead", num_classes=5, in_channels=32,
                           feat_channels=32, stacked_convs=1,
                           anchor_strides=(8, 16, 32, 64, 128))),
            None, None)
        img = jnp.zeros((1, 64, 96, 3))
        variables = det.init(jax.random.PRNGKey(0), img)
        bb = variables["params"]["backbone"]
        assert "gen_attention_block" in bb["layer3_0"]
        assert "gen_attention_block" in bb["layer3_2"]
        assert "gen_attention_block" not in bb["layer3_1"]
        assert "gen_attention_block" in bb["layer4_0"]
        assert "gen_attention_block" not in bb["layer1_0"]
        outs = det.apply(variables, img)
        assert len(outs[0]) == 5
