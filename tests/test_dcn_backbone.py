"""DCN/GCB stage injection into ResNet (the configs/dcn + configs/gcb
families)."""

import numpy as np
import jax
import jax.numpy as jnp

from ioudet.models import build_backbone


class TestDCNInjection:
    def test_dcn_stages_have_offset_params(self):
        bb = build_backbone(dict(type="ResNet", depth=50, frozen_stages=-1,
                                 norm_cfg=dict(type="FrozenBN"),
                                 stage_with_dcn=(False, False, True, True)))
        x = jnp.zeros((1, 64, 96, 3), jnp.float32)
        params = bb.init(jax.random.PRNGKey(0), x)["params"]
        assert "conv2_offset" in params["layer3_0"]
        assert "conv2_kernel" in params["layer3_0"]
        assert "conv2_offset" not in params["layer1_0"]
        assert "conv2" in params["layer1_0"]

    def test_zero_offset_init_matches_plain_conv_shape_and_flow(self):
        """At init offsets are zero -> DCN v1 == plain 3x3 conv with the
        same kernel; verify by substituting the kernel."""
        from ioudet.ops.deform_conv import deform_conv2d

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 4)), jnp.float32)
        k = jnp.asarray(rng.normal(0, 1, (3, 3, 4, 4)), jnp.float32)
        offs = jnp.zeros((1, 4, 4, 18), jnp.float32)  # stride-2 output grid
        out = deform_conv2d(x, offs, k, stride=2)
        ref = jax.lax.conv_general_dilated(
            x, k, (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_gcb_stage(self):
        bb = build_backbone(dict(type="ResNet", depth=50, frozen_stages=-1,
                                 norm_cfg=dict(type="FrozenBN"),
                                 stage_with_gcb=(False, False, False, True)))
        x = jnp.zeros((1, 64, 96, 3), jnp.float32)
        params = bb.init(jax.random.PRNGKey(0), x)["params"]
        assert "context_block" in params["layer4_0"]
        assert "context_block" not in params["layer3_0"]
