"""Dice / HD95 vs hand-computable cases and the reference's edge rules."""

import numpy as np

from cswin_unet_tpu.metrics import dice_binary, hd95, metric_per_case, volume_metrics


def test_dice_simple():
    a = np.zeros((10, 10), bool)
    b = np.zeros((10, 10), bool)
    a[2:6, 2:6] = True   # 16 px
    b[4:8, 4:8] = True   # 16 px, overlap 2x2=4
    assert abs(dice_binary(a, b) - 2 * 4 / 32) < 1e-12


def test_hd95_identical_is_zero():
    a = np.zeros((12, 12), bool)
    a[3:8, 3:8] = True
    assert hd95(a, a) == 0.0


def test_hd95_shifted_square():
    a = np.zeros((30, 30), bool)
    b = np.zeros((30, 30), bool)
    a[5:10, 5:10] = True
    b[5:10, 8:13] = True  # shift by 3 in x
    d = hd95(a, b)
    assert 2.0 <= d <= 3.0  # 95th pct of boundary distances for a 3-px shift


def test_edge_conventions():
    empty = np.zeros((5, 5), bool)
    full = np.ones((5, 5), bool)
    # pred>0, gt==0 -> (1, 0)   (reference utils.py:55-56)
    assert metric_per_case(full.copy(), empty.copy()) == (1.0, 0.0)
    # pred empty -> (0, 0)
    assert metric_per_case(empty.copy(), full.copy()) == (0.0, 0.0)
    assert metric_per_case(empty.copy(), empty.copy()) == (0.0, 0.0)


def test_volume_metrics_excludes_background():
    pred = np.zeros((2, 8, 8), int)
    gt = np.zeros((2, 8, 8), int)
    pred[:, 2:4, 2:4] = 1
    gt[:, 2:4, 2:4] = 1
    pred[:, 5:7, 5:7] = 2
    gt[:, 5:7, 5:7] = 2
    m = volume_metrics(pred, gt, num_classes=3)
    assert len(m) == 2  # classes 1, 2 only
    assert m[0][0] == 1.0 and m[1][0] == 1.0


def test_hd95_matches_bruteforce():
    rng = np.random.default_rng(0)
    a = np.zeros((20, 20), bool)
    b = np.zeros((20, 20), bool)
    a[4:11, 5:12] = True
    b[7:15, 3:9] = True

    def border(m):
        from scipy import ndimage
        conn = ndimage.generate_binary_structure(2, 1)
        return np.argwhere(m ^ ndimage.binary_erosion(m, conn))

    pa, pb = border(a), border(b)
    d_ab = np.sqrt(((pa[:, None] - pb[None]) ** 2).sum(-1)).min(1)
    d_ba = np.sqrt(((pb[:, None] - pa[None]) ** 2).sum(-1)).min(1)
    want = np.percentile(np.hstack([d_ab, d_ba]), 95)
    assert abs(hd95(a, b) - want) < 1e-9
