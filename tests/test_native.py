"""Native (C++) host-kernel parity vs numpy implementations."""

import numpy as np
import pytest

from pdfnet_tpu import native
from pdfnet_tpu.data.cloud import sample_hand_cloud
from pdfnet_tpu.data.prefetch import prefetch
from pdfnet_tpu.data.targets import draw_gaussian, gaussian2d

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native toolchain unavailable")


@needs_native
def test_native_cloud_matches_numpy_semantics():
    rng = np.random.RandomState(0)
    H = W = 128
    depth = np.zeros((H, W), np.float32)
    depth[40:90, 30:80] = 0.5 + rng.rand(50, 50).astype(np.float32) * 0.02
    K = np.array([[120.0, 0, 64], [0, 120.0, 64], [0, 0, 1]], np.float32)

    c_nat, p_nat, ok_nat = sample_hand_cloud(depth, K, 256,
                                             np.random.RandomState(1),
                                             use_native=True)
    c_np, p_np, ok_np = sample_hand_cloud(depth, K, 256,
                                          np.random.RandomState(1),
                                          use_native=False)
    assert ok_nat and ok_np
    # both draw from the same banded pixel set (random subsets differ)
    valid = set(np.flatnonzero(depth > 0))
    assert set(c_nat.tolist()) <= valid
    assert set(c_np.tolist()) <= valid
    # backprojection identical for identical indices
    from pdfnet_tpu.data.cloud import backproject_np
    xyz = backproject_np(depth, K).reshape(-1, 3)
    np.testing.assert_allclose(p_nat, xyz[c_nat], atol=1e-5)
    # depth band respected
    assert np.all((p_nat[:, 2] > 0.4) & (p_nat[:, 2] < 0.6))


@needs_native
def test_native_cloud_invalid_hand():
    depth = np.zeros((64, 64), np.float32)
    K = np.eye(3, dtype=np.float32)
    c, p, ok = sample_hand_cloud(depth, K, 128, np.random.RandomState(0))
    assert not ok and c.sum() == 0 and p.sum() == 0


@needs_native
def test_native_gaussian_matches_numpy():
    hm_nat = np.zeros((64, 64), np.float32)
    draw_gaussian(hm_nat, (20, 30), 5)          # native path
    # numpy reference
    hm_np = np.zeros((64, 64), np.float64)
    d = 11
    g = gaussian2d((d, d), sigma=d / 6.0)
    hm_np[30 - 5:30 + 6, 20 - 5:20 + 6] = g
    np.testing.assert_allclose(hm_nat, hm_np, atol=1e-6)
    assert hm_nat.max() == pytest.approx(1.0)


def test_prefetch_preserves_order_and_errors():
    out = list(prefetch(range(10), depth=3, transform=lambda x: x * 2))
    assert out == [x * 2 for x in range(10)]

    def bad():
        yield 1
        raise ValueError("boom")

    it = prefetch(bad())
    assert next(it) == 1
    with pytest.raises(ValueError):
        list(it)
