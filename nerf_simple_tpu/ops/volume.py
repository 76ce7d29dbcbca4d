"""Emission-absorption volume compositing (NeRF eqn. 3/5).

Behavior-equivalent to reference utils/rendering.py:47-85, with the
reference's load-bearing quirks preserved exactly:

- density activation is **softplus**, not ReLU (utils/rendering.py:67);
- colors are composited **raw** — no sigmoid; clipping to [0,1] happens
  only at image-render time (utils/rendering.py:74, 103);
- the final delta is 1e10 (utils/rendering.py:61) and deltas are scaled by
  ||dir|| (a no-op since dirs are unit by then, utils/rendering.py:62);
- transmittance is the exclusive cumprod of (1 - alpha + 1e-10)
  (utils/rendering.py:68);
- the second return is **disparity**, not depth:
  ``disp = 1 / max(1e-10, depth/acc)`` (utils/rendering.py:82-84).

The exclusive cumprod is expressed in log space as an exclusive cumsum —
an associative scan XLA parallelizes well, and the same decomposition the
Pallas kernel uses as a running-transmittance carry across sample blocks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class CompositeOut(NamedTuple):
    """Per-ray composited quantities (mirrors the reference 5-tuple return
    order at utils/rendering.py:85: rgb, disparity, alpha, acc, weights)."""

    rgb: jnp.ndarray  # (B, 3) raw (unclipped) color
    disp: jnp.ndarray  # (B,) disparity
    alpha: jnp.ndarray  # (B, N)
    acc: jnp.ndarray  # (B,) accumulated weight
    weights: jnp.ndarray  # (B, N)
    depth: jnp.ndarray  # (B,) weighted mean sample distance (extra output)


def composite_T(
    rgb_sigma_T: jnp.ndarray, ts: jnp.ndarray, unit_dirs: jnp.ndarray
) -> CompositeOut:
    """``composite`` on channel-major inputs: (4, B, N) ``[r, g, b, sigma]``.

    Used by the Pallas render path, whose fused kernel is feature-major —
    this avoids materializing a (B*N, 4) minor-dim-4 transpose of the
    kernel output. Math identical to ``composite`` (same tests cover both).
    """
    sigma = rgb_sigma_T[3]  # (B, N)
    deltas = ts[:, 1:] - ts[:, :-1]
    deltas = jnp.concatenate(
        [deltas, jnp.full_like(deltas[:, :1], 1e10)], axis=-1
    )
    deltas = deltas * jnp.linalg.norm(unit_dirs, axis=-1, keepdims=True)
    alpha = 1.0 - jnp.exp(-jax.nn.softplus(sigma) * deltas)
    log_trans = jnp.log(jnp.maximum(1.0 - alpha, 1e-10))
    excl = jnp.cumsum(log_trans, axis=-1) - log_trans
    weights = alpha * jnp.exp(excl)

    rgb = jnp.einsum("bn,cbn->bc", weights, rgb_sigma_T[:3])
    depth = jnp.sum(weights * ts, axis=-1)
    acc = jnp.sum(weights, axis=-1)
    disp = 1.0 / jnp.maximum(1e-10, depth / acc)
    return CompositeOut(rgb, disp, alpha, acc, weights, depth)


def composite(
    rgb_sigma: jnp.ndarray, ts: jnp.ndarray, unit_dirs: jnp.ndarray
) -> CompositeOut:
    """Composite per-sample radiance into per-ray color/depth/weights.

    Args:
      rgb_sigma: (B, N, 4) raw network outputs ``[r, g, b, sigma]``.
      ts: (B, N) sample distances (ascending).
      unit_dirs: (B, 3) unit view directions (used only for delta scaling,
        kept for exact parity with utils/rendering.py:62).
    """
    deltas = ts[:, 1:] - ts[:, :-1]
    deltas = jnp.concatenate(
        [deltas, jnp.full_like(deltas[:, :1], 1e10)], axis=-1
    )
    deltas = deltas * jnp.linalg.norm(unit_dirs, axis=-1, keepdims=True)

    sigma = rgb_sigma[..., 3]
    alpha = 1.0 - jnp.exp(-jax.nn.softplus(sigma) * deltas)

    # Exclusive cumprod of (1 - alpha + eps) via exclusive log-cumsum.
    # The reference's literal ``1 - alpha + 1e-10`` is NOT safe under XLA:
    # the compiler may reassociate to ``(1 + 1e-10) - alpha`` and constant-
    # fold ``1 + 1e-10 -> 1.0`` (1e-10 is below f32 ulp at 1.0), making the
    # argument exactly 0 for opaque samples -> log = -inf -> NaN in the
    # exclusive cumsum. ``max(1 - alpha, 1e-10)`` is bitwise-equivalent for
    # every f32 alpha (the +1e-10 only ever mattered when 1-alpha rounded
    # to 0) and is fusion-proof.
    log_trans = jnp.log(jnp.maximum(1.0 - alpha, 1e-10))
    excl = jnp.cumsum(log_trans, axis=-1) - log_trans
    transmittance = jnp.exp(excl)
    weights = alpha * transmittance

    rgb = jnp.sum(weights[..., None] * rgb_sigma[..., :3], axis=1)
    depth = jnp.sum(weights * ts, axis=-1)
    acc = jnp.sum(weights, axis=-1)
    disp = 1.0 / jnp.maximum(1e-10, depth / acc)

    return CompositeOut(rgb, disp, alpha, acc, weights, depth)


def composite_intervals(
    rgb_sigma: jnp.ndarray,
    t_edges: jnp.ndarray,
    t_mids: jnp.ndarray,
    unit_dirs: jnp.ndarray,
    opaque_tail: bool = False,
) -> CompositeOut:
    """``composite`` for interval samples (the mip path): each of the N
    rgb/sigma rows describes the frustum BETWEEN consecutive edges, so
    deltas are the true finite interval widths — no 1e10 tail hack (a
    frustum has a far face; leftover transmittance simply stays
    unabsorbed, acc < 1 over empty space, exactly mip-NeRF's convention).
    Same softplus / log-space exclusive-cumprod machinery as
    ``composite``; depth/disparity use the frustum centers ``t_mids``.

    ``opaque_tail`` (mip-NeRF 360's ``opaque_background``) extends the
    LAST frustum to infinity — exactly the point path's 1e10 tail
    absorber. Unbounded scenes need it: without a boundary absorber the
    field has nowhere to charge background misses and learns per-view
    near-plane canvases instead of world geometry (measured: the
    anti-aliased 360 recipe collapses 40 dB train / 13 dB test without
    it — docs/PERFORMANCE.md "Mip × proposal" notes). Depth/disparity
    keep the finite ``t_mids`` (the absorber is a boundary condition,
    not scene geometry at t0 + 1e10).

    Args: rgb_sigma (B, N, 4); t_edges (B, N+1) ascending;
    t_mids (B, N); unit_dirs (B, 3).
    """
    deltas = t_edges[:, 1:] - t_edges[:, :-1]
    if opaque_tail:
        deltas = deltas.at[:, -1].set(1e10)
    deltas = deltas * jnp.linalg.norm(unit_dirs, axis=-1, keepdims=True)
    sigma = rgb_sigma[..., 3]
    alpha = 1.0 - jnp.exp(-jax.nn.softplus(sigma) * deltas)
    log_trans = jnp.log(jnp.maximum(1.0 - alpha, 1e-10))
    excl = jnp.cumsum(log_trans, axis=-1) - log_trans
    weights = alpha * jnp.exp(excl)

    rgb = jnp.sum(weights[..., None] * rgb_sigma[..., :3], axis=1)
    depth = jnp.sum(weights * t_mids, axis=-1)
    acc = jnp.sum(weights, axis=-1)
    disp = 1.0 / jnp.maximum(1e-10, depth / jnp.maximum(acc, 1e-10))
    return CompositeOut(rgb, disp, alpha, acc, weights, depth)


def weights_from_sigma(
    sigma: jnp.ndarray, ts: jnp.ndarray, unit_dirs: jnp.ndarray
) -> jnp.ndarray:
    """Compositing weights alone from raw density — the color-free slice
    of ``composite`` (identical math: softplus activation, 1e10 tail
    delta, ||dir|| scaling, fusion-proof log-space exclusive cumprod).
    Used by the proposal pass (models/proposal.py), which needs sample
    weights but renders nothing.

    Args: sigma (B, N) raw (pre-softplus) density; ts (B, N) ascending;
    unit_dirs (B, 3). Returns (B, N) weights.
    """
    deltas = ts[:, 1:] - ts[:, :-1]
    deltas = jnp.concatenate(
        [deltas, jnp.full_like(deltas[:, :1], 1e10)], axis=-1
    )
    deltas = deltas * jnp.linalg.norm(unit_dirs, axis=-1, keepdims=True)
    alpha = 1.0 - jnp.exp(-jax.nn.softplus(sigma) * deltas)
    log_trans = jnp.log(jnp.maximum(1.0 - alpha, 1e-10))
    excl = jnp.cumsum(log_trans, axis=-1) - log_trans
    return alpha * jnp.exp(excl)


def weights_from_sigma_intervals(
    sigma: jnp.ndarray,
    edges: jnp.ndarray,
    unit_dirs: jnp.ndarray,
    opaque_tail: bool = False,
) -> jnp.ndarray:
    """Interval-sample compositing weights from raw density — the
    color-free slice of ``composite_intervals`` (identical math: softplus
    activation, true finite frustum widths, no 1e10 tail, log-space
    exclusive cumprod). Used by the proposal pass under cone casting
    (mip x proposal — the mip-NeRF 360 composition), which needs the
    proposal's interval histogram but renders nothing.

    ``opaque_tail`` mirrors ``composite_intervals``: the last probe
    interval absorbs all leftover transmittance, so the placement
    histogram can park background mass at the far boundary (the point
    path's ``weights_from_sigma`` has this absorber built in via its
    1e10 delta — symmetry matters, the interlevel bound compares the
    two levels' histograms).

    Args: sigma (B, N) raw (pre-softplus) density, one per interval;
    edges (B, N+1) ascending; unit_dirs (B, 3). Returns (B, N) weights.
    """
    deltas = edges[:, 1:] - edges[:, :-1]
    if opaque_tail:
        deltas = deltas.at[:, -1].set(1e10)
    deltas = deltas * jnp.linalg.norm(unit_dirs, axis=-1, keepdims=True)
    alpha = 1.0 - jnp.exp(-jax.nn.softplus(sigma) * deltas)
    log_trans = jnp.log(jnp.maximum(1.0 - alpha, 1e-10))
    excl = jnp.cumsum(log_trans, axis=-1) - log_trans
    return alpha * jnp.exp(excl)


def _interlevel_core(
    wi: jnp.ndarray,
    ti: jnp.ndarray,
    w_prop: jnp.ndarray,
    interior_edges: jnp.ndarray,
) -> jnp.ndarray:
    """Shared interlevel bound: main-field mass ``wi`` at positions
    ``ti`` binned against the proposal histogram whose Np bins are
    separated by ``interior_edges`` (B, Np-1); only under-coverage is
    penalized (see interlevel_loss for the full rationale)."""
    Np = w_prop.shape[-1]
    # bin of t = #(edges <= t), clipped into [0, Np-1]
    idx = jnp.sum(
        (interior_edges[:, None, :] <= ti[:, :, None]).astype(jnp.int32),
        axis=-1,
    )
    onehot = (idx[:, :, None] == jnp.arange(Np, dtype=jnp.int32)).astype(
        wi.dtype
    )
    bound = jnp.einsum(
        "bn,bnp->bp", wi, onehot, precision=jax.lax.Precision.HIGHEST
    )
    excess = jax.nn.relu(bound - w_prop)
    return jnp.mean(jnp.sum(excess**2 / (w_prop + 1e-4), axis=-1))


def interlevel_loss_intervals(
    w: jnp.ndarray,
    t_mids: jnp.ndarray,
    w_prop: jnp.ndarray,
    edges_prop: jnp.ndarray,
    opaque_tail: bool = False,
) -> jnp.ndarray:
    """Interval-histogram form of the interlevel bound (the mip-NeRF 360
    eqn. 13 geometry proper): the fine level's interval weights, located
    at their interval midpoints, must be covered by the proposal's
    weight in the probe interval containing them. Unlike the point form
    there is NO tail exclusion — interval weights carry genuinely
    absorbed mass (``composite_intervals`` has no artificial 1e10
    absorber; leftover transmittance is simply unabsorbed).

    Under ``opaque_tail`` the fine level's LAST interval is the
    artificial boundary absorber (``composite_intervals`` opaque_tail),
    so its weight is leftover transmittance, not scene mass — excluded
    from the bound exactly like the point form's tail sample
    (``interlevel_loss``).

    Args: w (B, N) fine interval weights (caller stop-gradients them);
    t_mids (B, N) fine interval centers; w_prop (B, Np) proposal
    interval weights over edges_prop (B, Np+1) ascending.
    """
    if opaque_tail:
        w, t_mids = w[:, :-1], t_mids[:, :-1]
    return _interlevel_core(w, t_mids, w_prop, edges_prop[:, 1:-1])


def interlevel_loss(
    w: jnp.ndarray,
    ts: jnp.ndarray,
    w_prop: jnp.ndarray,
    ts_prop: jnp.ndarray,
) -> jnp.ndarray:
    """Proposal supervision (mip-NeRF 360 eqn. 13, point-sample form).

    Bins are the proposal samples' midpoint cells (the same piecewise
    geometry ``importance_ts`` builds its PDF over). For each bin j the
    main field's weight mass landing in it,

        bound_j = sum_i w_i * 1[t_i in bin j],

    must be covered by the proposal's own weight there; only
    under-coverage is penalized, normalized so dividing mass among many
    bins can't cheat the bound:

        L = mean_rays sum_j relu(bound_j - wp_j)^2 / (wp_j + eps).

    The caller stop-gradients ``w`` (the proposal distills FROM the main
    field; the main field never chases the proposal). The main field's
    TAIL sample is excluded from the bound — its weight is leftover
    transmittance absorbed by the artificial 1e10 delta, not scene mass.

    TPU shape: bin lookup is one broadcast-compare reduce (VPU) and the
    per-bin accumulation one one-hot matmul (MXU) — no searchsorted, no
    scatter (cf. ops/sampling.py::importance_ts rationale).

    Args: w (B, N) main-field weights at ts (B, N); w_prop (B, Np)
    proposal weights at ts_prop (B, Np), both ascending per ray.
    """
    mids = 0.5 * (ts_prop[:, 1:] + ts_prop[:, :-1])  # (B, Np-1) interior edges
    return _interlevel_core(w[:, :-1], ts[:, :-1], w_prop, mids)


def distortion_loss(weights: jnp.ndarray, ts: jnp.ndarray) -> jnp.ndarray:
    """Mip-NeRF 360 distortion regularizer (eqn. 15), O(N) cumsum form.

    L = sum_ij w_i w_j |t_i - t_j|  +  (1/3) sum_i w_i^2 delta_i,

    per ray, averaged over the batch. Penalizes weight mass that is
    spread along the ray ("fog"/floaters) while leaving a single
    concentrated surface almost free — the standard fix for the hazy
    density fields vanilla NeRF learns (no reference analogue; opt-in
    via TrainConfig.distortion_loss_weight).

    TPU shape: the naive double sum is O(N^2) per ray; since ``ts`` is
    sorted, sum_{i<j} w_i w_j (t_j - t_i) telescopes into two cumsums.
    The TAIL sample is excluded — its artificial 1e10 delta (composite's
    boundary absorber) would otherwise dominate the self term, and its
    weight is the leftover transmittance, not real density mass.

    Args: weights (B, N) from ``composite``; ts (B, N) sorted sample
    distances (the same tensor the render consumed).
    """
    w = weights[:, :-1]
    m = ts[:, :-1]
    delta = ts[:, 1:] - ts[:, :-1]  # gap to the next sample, (B, N-1)
    return _distortion_core(w, m, delta)


def _distortion_core(
    w: jnp.ndarray, m: jnp.ndarray, delta: jnp.ndarray
) -> jnp.ndarray:
    """Shared O(N) cumsum distortion: weights ``w`` at sorted positions
    ``m`` with per-bin widths ``delta`` (see distortion_loss)."""
    acc = jnp.cumsum(w, axis=-1)
    acc_m = jnp.cumsum(w * m, axis=-1)
    # 2 * sum_j w_j * (t_j * A_{j-1} - B_{j-1}), prefix sums exclusive
    cross = 2.0 * jnp.sum(
        w * (m * (acc - w) - (acc_m - w * m)), axis=-1
    )
    self_term = jnp.sum(w * w * delta, axis=-1) / 3.0
    return jnp.mean(cross + self_term)


def distortion_loss_intervals(
    weights: jnp.ndarray, edges: jnp.ndarray, opaque_tail: bool = False
) -> jnp.ndarray:
    """Distortion regularizer in its exact interval-histogram form
    (mip-NeRF 360 eqn. 15 as published): weights are per-INTERVAL
    (``composite_intervals``), positions are the interval midpoints, the
    self term uses the true interval widths, and no tail is dropped —
    interval compositing has no artificial 1e10 absorber, every bin's
    weight is real density mass.

    Under ``opaque_tail`` the last interval IS an artificial absorber
    (``composite_intervals`` opaque_tail) and is dropped exactly like
    the point form's tail sample (``distortion_loss``): its weight is
    leftover transmittance, and penalizing the background absorber's
    spread would fight the boundary condition.

    Args: weights (B, N) interval weights; edges (B, N+1) ascending
    interval edges IN THE SAMPLING PARAMETRIZATION (pass s-space edges —
    the train step normalizes via its ``_s_norm`` before calling, same
    convention as ``distortion_loss``).
    """
    m = 0.5 * (edges[:, 1:] + edges[:, :-1])
    delta = edges[:, 1:] - edges[:, :-1]
    if opaque_tail:
        weights, m, delta = weights[:, :-1], m[:, :-1], delta[:, :-1]
    return _distortion_core(weights, m, delta)
