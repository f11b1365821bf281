"""Anchor generator parity tests: exact base-anchor values for the RetinaNet
configuration, grid ordering, and valid-flag masking."""

import numpy as np

from ioudet.core import AnchorGenerator


def retina_scales():
    return 4 * 2.0 ** (np.arange(3) / 3.0)


class TestBaseAnchors:
    def test_known_values_stride8(self):
        """Independent recomputation of the v1 formula (centered at
        (s-1)/2, w_ratios = 1/sqrt(r), rounded)."""
        gen = AnchorGenerator(8, retina_scales(), [0.5, 1.0, 2.0])
        base = gen.base_anchors
        assert base.shape == (9, 4)
        ctr = 0.5 * (8 - 1)
        for ri, r in enumerate([0.5, 1.0, 2.0]):
            for si, s in enumerate(retina_scales()):
                w = 8 * (1 / np.sqrt(r)) * s
                h = 8 * np.sqrt(r) * s
                exp = np.round([ctr - 0.5 * (w - 1), ctr - 0.5 * (h - 1),
                                ctr + 0.5 * (w - 1), ctr + 0.5 * (h - 1)])
                np.testing.assert_allclose(base[ri * 3 + si], exp)

    def test_square_anchor_simple(self):
        gen = AnchorGenerator(16, [1.0], [1.0])
        np.testing.assert_allclose(gen.base_anchors[0], [0, 0, 15, 15])

    def test_anchor_areas_scale(self):
        gen = AnchorGenerator(8, retina_scales(), [0.5, 1.0, 2.0])
        b = gen.base_anchors
        areas = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
        # scale 4 at stride 8 -> ~32^2 area (ratio-preserving up to rounding)
        assert abs(areas[3] - 32 * 32) / (32 * 32) < 0.1  # ratio=1, scale=4


class TestGridAnchors:
    def test_ordering_location_major(self):
        gen = AnchorGenerator(16, [1.0], [1.0])
        anchors = np.asarray(gen.grid_anchors((2, 3), 16))
        assert anchors.shape == (6, 4)
        # first anchor at (0,0); second at x=16 (x varies fastest)
        np.testing.assert_allclose(anchors[0], [0, 0, 15, 15])
        np.testing.assert_allclose(anchors[1], [16, 0, 31, 15])
        np.testing.assert_allclose(anchors[3], [0, 16, 15, 31])

    def test_multi_anchor_fastest(self):
        gen = AnchorGenerator(8, retina_scales(), [0.5, 1.0, 2.0])
        anchors = np.asarray(gen.grid_anchors((2, 2), 8))
        assert anchors.shape == (2 * 2 * 9, 4)
        # anchors 0..8 are at cell (0,0): all share base offsets
        np.testing.assert_allclose(anchors[:9], gen.base_anchors)
        np.testing.assert_allclose(anchors[9:18, 0],
                                   gen.base_anchors[:, 0] + 8)

    def test_valid_flags(self):
        gen = AnchorGenerator(8, retina_scales(), [0.5, 1.0, 2.0])
        flags = np.asarray(gen.valid_flags((4, 4), (2, 3)))
        assert flags.shape == (4 * 4 * 9,)
        grid = flags.reshape(4, 4, 9)
        assert grid[:2, :3].all()
        assert not grid[2:, :].any()
        assert not grid[:, 3:].any()

    def test_valid_flags_traced(self):
        import jax
        gen = AnchorGenerator(8, [4.0], [1.0])
        f = jax.jit(lambda vh, vw: gen.valid_flags((4, 4), (vh, vw)))
        flags = np.asarray(f(2, 3)).reshape(4, 4)
        assert flags[:2, :3].all() and flags.sum() == 6
