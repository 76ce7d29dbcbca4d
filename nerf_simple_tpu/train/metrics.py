"""Image metrics, matching reference train.py:16-26 semantics.

Reference quirk preserved: PSNR's peak signal is ``max(gt)``, not 1.0
(train.py:25) — on dark validation images this inflates nothing; it
slightly *lowers* PSNR vs the standard peak=1 definition whenever
max(gt) < 1. ``img_psnr(..., peak=1.0)`` gives the standard metric.
"""

from __future__ import annotations

import jax.numpy as jnp


def img_mse(gt: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - gt) ** 2)


def img_psnr(
    gt: jnp.ndarray, pred: jnp.ndarray, peak: float | None = None
) -> jnp.ndarray:
    """PSNR with the reference's peak = max(gt) default (train.py:25)."""
    p = jnp.max(gt) if peak is None else jnp.asarray(peak)
    mse = img_mse(gt, pred)
    return 20.0 * jnp.log10(p) - 10.0 * jnp.log10(mse)


def _gauss_filter(x: jnp.ndarray, win: int, sigma: float) -> jnp.ndarray:
    """Separable Gaussian filter over the trailing two spatial dims of a
    (B, H, W) stack, VALID padding — two tiny 1-D convolutions instead
    of one 2-D one (the standard separable trick; XLA fuses the pair)."""
    from jax import lax

    r = jnp.arange(win, dtype=x.dtype) - (win - 1) / 2.0
    w = jnp.exp(-(r**2) / (2.0 * sigma**2))
    w = w / jnp.sum(w)
    x = x[:, None]  # (B, 1, H, W)
    dn = ("NCHW", "OIHW", "NCHW")
    x = lax.conv_general_dilated(
        x, w.reshape(1, 1, win, 1), (1, 1), "VALID", dimension_numbers=dn
    )
    x = lax.conv_general_dilated(
        x, w.reshape(1, 1, 1, win), (1, 1), "VALID", dimension_numbers=dn
    )
    return x[:, 0]


def img_ssim(
    gt: jnp.ndarray,
    pred: jnp.ndarray,
    peak: float = 1.0,
    win: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """SSIM (Wang et al. 2004), the standard NeRF eval companion metric
    (no reference analogue — train.py:16-26 stops at MSE/PSNR).

    Gaussian 11x11 / sigma 1.5 window, K1=0.01, K2=0.03, VALID padding,
    channels averaged — the original paper's configuration. Accepts
    (H, W), (H, W, C) or (N, H, W, C); returns the scalar mean SSIM.
    Tested against a float64 direct-convolution oracle.
    """
    gt = jnp.asarray(gt, jnp.float32)
    pred = jnp.asarray(pred, jnp.float32)
    if gt.ndim == 2:
        gt, pred = gt[..., None], pred[..., None]
    if gt.ndim == 3:
        gt, pred = gt[None], pred[None]
    n, h, wdt, c = gt.shape
    x = jnp.moveaxis(gt, -1, 1).reshape(n * c, h, wdt)
    y = jnp.moveaxis(pred, -1, 1).reshape(n * c, h, wdt)

    c1 = (0.01 * peak) ** 2
    c2 = (0.03 * peak) ** 2
    mu_x = _gauss_filter(x, win, sigma)
    mu_y = _gauss_filter(y, win, sigma)
    var_x = _gauss_filter(x * x, win, sigma) - mu_x**2
    var_y = _gauss_filter(y * y, win, sigma) - mu_y**2
    cov = _gauss_filter(x * y, win, sigma) - mu_x * mu_y
    num = (2.0 * mu_x * mu_y + c1) * (2.0 * cov + c2)
    den = (mu_x**2 + mu_y**2 + c1) * (var_x + var_y + c2)
    return jnp.mean(num / den)
