"""Native C++ EDT/HD95 vs the scipy implementation."""

import numpy as np
import pytest
from scipy import ndimage

from cswin_unet_tpu.metrics import _surface_distances, hd95
from cswin_unet_tpu.utils import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="g++ / native lib unavailable"
)


def test_edt_matches_scipy_3d(rng):
    mask = rng.random((6, 20, 18)) > 0.97
    mask[0, 0, 0] = True  # ensure nonempty
    want = ndimage.distance_transform_edt(~mask)
    got = native.edt_native(mask)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-9)


def test_edt_matches_scipy_2d(rng):
    mask = rng.random((25, 31)) > 0.95
    mask[3, 4] = True
    want = ndimage.distance_transform_edt(~mask)
    got = native.edt_native(mask)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-9)


def _scipy_hd95(a, b):
    d1 = _surface_distances(a, b)
    d2 = _surface_distances(b, a)
    return float(np.percentile(np.hstack((d1, d2)), 95))


def test_hd95_matches_scipy_3d(rng):
    a = np.zeros((5, 24, 24), bool)
    b = np.zeros((5, 24, 24), bool)
    a[1:4, 4:12, 5:14] = True
    b[2:5, 7:16, 3:11] = True
    got = native.hd95_native(a, b)
    want = _scipy_hd95(a, b)
    assert abs(got - want) < 1e-9


def test_hd95_matches_scipy_2d_random_blobs(rng):
    for seed in range(3):
        r = np.random.default_rng(seed)
        a = ndimage.binary_dilation(r.random((30, 30)) > 0.98, iterations=2)
        b = ndimage.binary_dilation(r.random((30, 30)) > 0.98, iterations=3)
        if not a.any() or not b.any():
            continue
        got = native.hd95_native(a, b)
        want = _scipy_hd95(a, b)
        assert abs(got - want) < 1e-9, seed


def test_metrics_entrypoint_uses_native(rng):
    a = np.zeros((20, 20), bool)
    b = np.zeros((20, 20), bool)
    a[4:10, 4:10] = True
    b[6:14, 6:14] = True
    assert abs(hd95(a, b, use_native=True) - hd95(a, b, use_native=False)) < 1e-9
