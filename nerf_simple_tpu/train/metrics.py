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
