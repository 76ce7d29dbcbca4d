"""SSIM against a float64 direct-convolution oracle, plus invariants."""

import numpy as np

from nerf_simple_tpu.train.metrics import img_psnr, img_ssim


def _ssim_oracle(gt, pred, peak=1.0, win=11, sigma=1.5):
    """Wang et al. 2004 SSIM, float64, direct (non-separable) 2-D
    Gaussian windowing, VALID padding, channels averaged."""
    gt = np.asarray(gt, np.float64)
    pred = np.asarray(pred, np.float64)
    if gt.ndim == 2:
        gt, pred = gt[..., None], pred[..., None]
    r = np.arange(win) - (win - 1) / 2.0
    w1 = np.exp(-(r**2) / (2 * sigma**2))
    w2 = np.outer(w1, w1)
    w2 /= w2.sum()
    c1, c2 = (0.01 * peak) ** 2, (0.03 * peak) ** 2

    def filt(img):
        H, W = img.shape
        out = np.empty((H - win + 1, W - win + 1))
        for i in range(out.shape[0]):
            for j in range(out.shape[1]):
                out[i, j] = np.sum(img[i : i + win, j : j + win] * w2)
        return out

    vals = []
    for ch in range(gt.shape[-1]):
        x, y = gt[..., ch], pred[..., ch]
        mx, my = filt(x), filt(y)
        vx = filt(x * x) - mx**2
        vy = filt(y * y) - my**2
        cov = filt(x * y) - mx * my
        vals.append(
            ((2 * mx * my + c1) * (2 * cov + c2))
            / ((mx**2 + my**2 + c1) * (vx + vy + c2))
        )
    return float(np.mean(vals))


def test_ssim_matches_float64_oracle():
    rng = np.random.default_rng(0)
    gt = rng.uniform(0, 1, (20, 24, 3)).astype(np.float32)
    pred = np.clip(gt + rng.normal(0, 0.08, gt.shape), 0, 1).astype(
        np.float32
    )
    got = float(img_ssim(gt, pred))
    want = _ssim_oracle(gt, pred)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_ssim_identity_and_ordering():
    rng = np.random.default_rng(1)
    gt = rng.uniform(0, 1, (24, 24, 3)).astype(np.float32)
    np.testing.assert_allclose(float(img_ssim(gt, gt)), 1.0, atol=1e-6)
    small = np.clip(gt + rng.normal(0, 0.02, gt.shape), 0, 1)
    big = np.clip(gt + rng.normal(0, 0.3, gt.shape), 0, 1)
    assert float(img_ssim(gt, small)) > float(img_ssim(gt, big))


def test_ssim_batched_equals_mean_of_singles():
    rng = np.random.default_rng(2)
    gt = rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)
    pred = np.clip(gt + rng.normal(0, 0.1, gt.shape), 0, 1).astype(
        np.float32
    )
    batched = float(img_ssim(gt, pred))
    singles = np.mean(
        [float(img_ssim(gt[i], pred[i])) for i in range(2)]
    )
    np.testing.assert_allclose(batched, singles, atol=1e-6)


def test_psnr_standard_peak_option():
    gt = np.full((8, 8, 3), 0.5, np.float32)
    pred = gt + 0.1
    # reference quirk: peak = max(gt) = 0.5; standard: peak = 1.0
    assert float(img_psnr(gt, pred, peak=1.0)) > float(img_psnr(gt, pred))
