"""Ray-march sample placement: stratified and hierarchical (inverse-CDF).

Stratified sampling is behavior-equivalent to reference
utils/rendering.py:24-29: N equal bins on [tn, tf], one uniform sample per
bin. Hierarchical importance sampling is a *roadmap* feature of the
reference (empty CoarseNet/FineNet stubs at utils/nets.py:45-48,
README.md:53) designed here from the NeRF paper's inverse-CDF scheme.

Both are pure functions of an explicit PRNG key — deterministic, reproducible,
and safe to call inside a jitted/scanned train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stratified_ts(
    key: jax.Array,
    n_rays: int,
    N: int,
    tn: float,
    tf: float,
    dtype=jnp.float32,
    det: bool = False,
) -> jnp.ndarray:
    """One uniform sample in each of N equal bins of [tn, tf], per ray.

    Matches reference utils/rendering.py:25-29:
    ``ts = bin_width * U(0,1) + bin_left_edges``.

    ``det=True`` places each sample at its bin midpoint (u = 0.5)
    instead of jittering — deterministic eval rendering (the proposal
    path uses it for its probes so ``det_fine`` renders are fully
    reproducible).

    Returns: (n_rays, N) sorted-by-construction sample distances.
    """
    edges = jnp.linspace(tn, tf, N + 1, dtype=dtype)
    width = (tf - tn) / N
    if det:
        u = jnp.full((n_rays, N), 0.5, dtype)
    else:
        u = jax.random.uniform(key, (n_rays, N), dtype=dtype)
    return width * u + edges[:-1]


def stratified_ts_spaced(
    key: jax.Array,
    n_rays: int,
    N: int,
    tn: float,
    tf: float,
    dtype=jnp.float32,
    space: str = "linear",
    det: bool = False,
) -> jnp.ndarray:
    """``stratified_ts`` with a choice of bin spacing.

    ``space="linear"`` is the reference sampler. ``space="disparity"``
    places the N bins uniformly in 1/t (mip-NeRF 360's unbounded
    parametrization): near content gets dense samples, the far field
    thins as 1/t^2 — the right prior when ``tf`` spans an unbounded
    background under scene contraction.

    ``det=True``: bin midpoints instead of jitter (see stratified_ts).

    Returns: (n_rays, N) ascending sample distances in [tn, tf].
    """
    if space == "linear":
        return stratified_ts(key, n_rays, N, tn, tf, dtype, det=det)
    assert space == "disparity", space
    if det:
        u = (jnp.arange(N, dtype=dtype) + 0.5)[None, :].repeat(n_rays, 0) / N
    else:
        u = (
            jnp.arange(N, dtype=dtype)
            + jax.random.uniform(key, (n_rays, N), dtype=dtype)
        ) / N
    inv = (1.0 / tn) + u * (1.0 / tf - 1.0 / tn)  # descending in t
    return 1.0 / inv


def importance_ts(
    key: jax.Array,
    ts_coarse: jnp.ndarray,
    weights: jnp.ndarray,
    N_fine: int,
    det: bool = False,
) -> jnp.ndarray:
    """Inverse-transform sample N_fine new ts from the coarse weight PDF.

    The NeRF hierarchical sampler (paper sec. 5.2). The piecewise-constant
    PDF is defined over the midpoints of the coarse samples; returned
    samples are sorted. No reference implementation exists (stubs only);
    this is the standard formulation, fully vectorized and jit-safe.

    Args:
      key: PRNG key.
      ts_coarse: (B, Nc) coarse sample distances (ascending per ray).
      weights: (B, Nc) compositing weights from the coarse pass.
      N_fine: number of importance samples to draw.
      det: if True, use evenly spaced quantiles instead of random draws
        (deterministic eval rendering).

    Returns:
      (B, N_fine) sorted sample distances within [ts_coarse min, max].
    """
    B, Nc = ts_coarse.shape
    mids = 0.5 * (ts_coarse[:, 1:] + ts_coarse[:, :-1])  # (B, Nc-1)
    w = weights[:, 1:-1] + 1e-5  # avoid nans; interior bins only
    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # (B, Nc-1)

    if det:
        u = jnp.linspace(0.0, 1.0, N_fine, dtype=ts_coarse.dtype)
        u = jnp.broadcast_to(u, (B, N_fine))
    else:
        # Draw u ALREADY SORTED via the exponential-spacing construction:
        # normalized partial sums of N+1 iid Exp(1) variables are exactly
        # the order statistics of N iid U(0,1) draws. The inverse-CDF map
        # below is monotone, so sorted u -> sorted samples — this deletes
        # a (B, N_fine) jnp.sort from the hierarchical hot path (TPU sorts
        # are multi-pass; the cumsum is one lane pass).
        e = jax.random.exponential(
            key, (B, N_fine + 1), dtype=ts_coarse.dtype
        )
        s = jnp.cumsum(e, axis=-1)
        u = s[:, :N_fine] / s[:, N_fine:]

    # u is sorted by construction (order statistics / quantiles) and the
    # inverse-CDF map is monotone, so samples come out sorted.
    return _inv_cdf_interp(cdf, mids, u)


def _inv_cdf_interp(
    cdf: jnp.ndarray, values: jnp.ndarray, u: jnp.ndarray
) -> jnp.ndarray:
    """Piecewise-linear inverse CDF: map ``u`` through (cdf, values).

    Bin lookup WITHOUT searchsorted: a vmapped binary search lowers to
    per-row scalar loops on TPU (~36 ms/iter at the reference shape).
    The CDF is tiny, so a dense broadcast-compare-reduce (VPU) + one-hot
    einsum gathers (MXU) are orders of magnitude faster. Shared by
    ``importance_ts`` (midpoint convention) and ``resample_edges``
    (edge convention).

    Args: cdf (B, M) ascending from 0; values (B, M) the support;
    u (B, K) in [0, 1). Returns (B, K), monotone in u per row.
    """
    M = cdf.shape[-1]
    # searchsorted(cdf, u, side="right") == #(cdf[k] <= u)
    idx = jnp.sum(
        (cdf[:, None, :] <= u[:, :, None]).astype(jnp.int32), axis=-1
    )
    below = jnp.clip(idx - 1, 0, M - 1)
    above = jnp.clip(idx, 0, M - 1)

    table = jnp.stack([cdf, values], axis=-1)  # (B, M, 2)
    grid = jnp.arange(M, dtype=jnp.int32)

    def lookup(sel):  # (B, K) indices -> (cdf_vals, value_vals)
        onehot = (sel[:, :, None] == grid).astype(values.dtype)
        vals = jnp.einsum(
            "bfm,bmk->bfk", onehot, table,
            precision=jax.lax.Precision.HIGHEST,
        )
        return vals[..., 0], vals[..., 1]

    cdf_below, v_below = lookup(below)
    cdf_above, v_above = lookup(above)

    denom = jnp.where(cdf_above - cdf_below < 1e-8, 1.0, cdf_above - cdf_below)
    frac = (u - cdf_below) / denom
    return v_below + frac * (v_above - v_below)


def anneal_weights(w: jnp.ndarray, a) -> jnp.ndarray:
    """Histogram sharpening ramp for placement annealing (mip-NeRF 360 /
    MultiNeRF ``anneal_slope`` analogue): returns ``w ** a`` with a
    zero-safe floor, so a traced exponent ``a`` ramping 0 -> 1 over
    early training moves sample PLACEMENT from uniform to the true
    histogram. Supervision losses keep the un-annealed weights — only
    where samples land is annealed. ``a=None`` is the identity (off).

    Why it exists: placement distills from the field being trained, a
    positive-feedback loop that can lock early random weights into a
    degenerate attractor. The measured case (TrainConfig.
    prop_anneal_frac): mip x proposal x disparity spacing collapses all
    density into a per-view canvas at t=tn because tiny near intervals
    carry undamped IPE sharpness (docs/PERFORMANCE.md anti-aliased-360
    section)."""
    if a is None:
        return w
    return jnp.power(jnp.maximum(w, 1e-8), a)


def resample_edges(
    key: jax.Array,
    edges: jnp.ndarray,
    weights: jnp.ndarray,
    N_new: int,
    blur: float = 0.01,
    det: bool = False,
) -> jnp.ndarray:
    """Mip-NeRF fine-level resampling: draw ``N_new + 1`` sorted samples
    from the coarse piecewise-constant interval histogram, forming the
    fine level's interval EDGES (Barron et al. 2021 sec. 3.2).

    The histogram weights are first dilated with the paper's 2-tap
    max-filter + uniform padding,

        w'_k = 0.5 * (max(w_{k-1}, w_k) + max(w_k, w_{k+1})) + blur,

    which stops the fine level from collapsing onto coarse spikes and
    keeps a floor of exploration everywhere. Samples are drawn already
    sorted via the same exponential order-statistic construction as
    ``importance_ts``, and the inverse CDF is piecewise-linear against
    the coarse EDGES (the histogram's true support — unlike
    ``importance_ts``'s midpoint convention for point samples).

    Args:
      key: PRNG key.
      edges: (B, N+1) ascending coarse interval edges.
      weights: (B, N) coarse compositing weights (one per interval).
      N_new: fine interval count; returns ``N_new + 1`` edges.
      blur: uniform padding mass added per interval after dilation.
      det: if True, place the edges at evenly spaced CDF quantiles
        instead of random draws (deterministic eval rendering — the
        interval analogue of ``importance_ts(det=True)``).

    Returns: (B, N_new + 1) ascending fine edges within [edges min, max].
    """
    B, N = weights.shape
    wpad = jnp.concatenate(
        [weights[:, :1], weights, weights[:, -1:]], axis=-1
    )
    wmax = jnp.maximum(wpad[:, :-1], wpad[:, 1:])  # (B, N+1)
    w = 0.5 * (wmax[:, :-1] + wmax[:, 1:]) + blur  # (B, N)
    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    cdf = jnp.concatenate(
        [jnp.zeros_like(pdf[:, :1]), jnp.cumsum(pdf, axis=-1)], axis=-1
    )  # (B, N+1), aligned with edges

    n_draw = N_new + 1
    if det:
        u = jnp.broadcast_to(
            jnp.linspace(0.0, 1.0, n_draw, dtype=edges.dtype), (B, n_draw)
        )
    else:
        e = jax.random.exponential(key, (B, n_draw + 1), dtype=edges.dtype)
        s = jnp.cumsum(e, axis=-1)
        u = s[:, :n_draw] / s[:, n_draw:]  # sorted U(0,1) order statistics
    return _inv_cdf_interp(cdf, edges, u)


def merge_sorted(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Merge two per-row ASCENDING arrays into one sorted row, without a
    sort: each element's output position is its rank in the union
    (own index + count of smaller elements in the other array), computed
    by broadcast-compare (VPU) and scattered via a one-hot matmul (MXU).

    TPU rationale: ``jnp.sort`` of the (B, Nc+Nf) hierarchical union is a
    multi-pass lane sort; this is one compare pass + two tiny matmuls.
    Ties are broken a-first (strict/non-strict compare pair), so the
    result is a permutation of ``concat(a, b)`` even with duplicates.

    Args:
      a: (B, Na) ascending per row.
      b: (B, Nb) ascending per row.

    Returns: (B, Na+Nb) ascending union.
    """
    Na, Nb = a.shape[-1], b.shape[-1]
    Nt = Na + Nb
    dtype = a.dtype
    # ranks in the union
    pos_a = jnp.arange(Na, dtype=jnp.int32) + jnp.sum(
        (b[:, None, :] < a[:, :, None]).astype(jnp.int32), axis=-1
    )
    pos_b = jnp.arange(Nb, dtype=jnp.int32) + jnp.sum(
        (a[:, None, :] <= b[:, :, None]).astype(jnp.int32), axis=-1
    )
    grid = jnp.arange(Nt, dtype=jnp.int32)
    oh_a = (pos_a[:, :, None] == grid).astype(dtype)  # (B, Na, Nt)
    oh_b = (pos_b[:, :, None] == grid).astype(dtype)
    hp = jax.lax.Precision.HIGHEST  # exact f32 scatter, not bf16 MXU
    return jnp.einsum("bi,bit->bt", a, oh_a, precision=hp) + jnp.einsum(
        "bi,bit->bt", b, oh_b, precision=hp
    )


def sample_points(
    rays: jnp.ndarray, ts: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sample locations + unit view dirs for packed rays.

    Replicates two load-bearing reference quirks (utils/rendering.py:31-40):
    sample locations are computed with the UNNORMALIZED ray direction
    (``loc = o + d_raw * t``), while the direction fed to the network (and
    used for delta scaling) is normalized AFTER.

    Args:
      rays: (B, 6) packed ``[origin | direction]``.
      ts: (B, N) sample distances.

    Returns:
      locs: (B, N, 3) sample positions.
      unit_dirs: (B, 3) normalized view directions.
    """
    origins = rays[:, :3]
    dirs = rays[:, 3:]
    locs = origins[:, None, :] + dirs[:, None, :] * ts[..., None]
    unit_dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return locs, unit_dirs


def frustum_moments(
    t0: jnp.ndarray, t1: jnp.ndarray, base_radius: float
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-interval conical-frustum Gaussian moments along the ray
    (mip-NeRF eqn. 7, the stable form), shared by ``conical_gaussian``
    and the fused kernel's feature-major x16 builder
    (train/step.py::_build_x16_mip).

    Args: t0/t1 (..., N) interval edges; base_radius cone growth per
    unit t — a scalar or any array broadcastable against t0 (e.g.
    (B, 1) per-ray radii for multiscale training). Returns
    (mu_t, sig_t2, sig_r2), all (..., N): along-ray mean/variance and
    perpendicular variance.
    """
    t_mu = 0.5 * (t0 + t1)
    t_d = 0.5 * (t1 - t0)
    denom = 3.0 * t_mu**2 + t_d**2
    mu_t = t_mu + 2.0 * t_mu * t_d**2 / denom
    sig_t2 = t_d**2 / 3.0 - (4.0 * t_d**4 * (12.0 * t_mu**2 - t_d**2)) / (
        15.0 * denom**2
    )
    sig_r2 = base_radius**2 * (
        t_mu**2 / 4.0 + 5.0 * t_d**2 / 12.0 - 4.0 * t_d**4 / (15.0 * denom)
    )
    return mu_t, sig_t2, sig_r2


def cylinder_moments(
    t0: jnp.ndarray, t1: jnp.ndarray, radius
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-interval CYLINDER Gaussian moments (mip-NeRF
    cylinder_to_gaussian): the ray shape for NDC-warped LLFF rays, whose
    cross-section does not grow with t (the NDC warp absorbs
    perspective). radius is constant along the ray — a scalar or (B, 1)
    per-ray array (neighbor-pixel spacing, ops/rays.py::mip_ray_radii).

    Returns (mu_t, sig_t2, sig_r2), all broadcast to t0's shape.
    """
    mu_t = 0.5 * (t0 + t1)
    sig_t2 = (t1 - t0) ** 2 / 12.0
    sig_r2 = (radius**2 / 4.0) * jnp.ones_like(t0)
    return mu_t, sig_t2, sig_r2


def interval_moments(
    t0: jnp.ndarray, t1: jnp.ndarray, radius, shape: str = "cone"
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dispatch: ``shape`` is "cone" (pinhole cameras — frustum radius
    grows with t) or "cylinder" (NDC-warped rays)."""
    if shape == "cylinder":
        return cylinder_moments(t0, t1, radius)
    assert shape == "cone", shape
    return frustum_moments(t0, t1, radius)


def frustum_gaussians_T(
    rays: jnp.ndarray,
    edges: jnp.ndarray,
    radius,
    shape: str = "cone",
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Feature-major frustum Gaussian build shared by the fused train
    x16 builder (train/step.py::_build_x16_mip) and the fused eval path
    (render/renderer.py::_fused_mlp_bn_mip) — the two must stay
    bit-identical for train/eval parity, so the projection lives once.

    Args: rays (B, >=6); edges (B, N+1); radius scalar or (B, 1);
    shape "cone"/"cylinder".

    Returns: meanT (3, B, N) Gaussian centers, unitT (3, B) unit view
    dirs, varT (3, B, N) diagonal covariances, mu_t (B, N) along-ray
    centers.
    """
    oT = rays[:, :3].T  # (3, B)
    dT = rays[:, 3:6].T
    n2 = jnp.sum(dT * dT, axis=0, keepdims=True)  # (1, B)
    unitT = dT / jnp.sqrt(n2)
    mu_t, sig_t2, sig_r2 = interval_moments(
        edges[:, :-1], edges[:, 1:], radius, shape
    )
    meanT = oT[:, :, None] + dT[:, :, None] * mu_t[None]  # (3, B, N)
    d2T = dT * dT  # (3, B)
    varT = (
        sig_t2[None] * d2T[:, :, None]
        + sig_r2[None] * (1.0 - d2T / n2)[:, :, None]
    )
    return meanT, unitT, varT, mu_t


def conical_gaussian(
    rays: jnp.ndarray,
    t_edges: jnp.ndarray,
    base_radius: float,
    shape: str = "cone",
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Gaussian approximation of the conical frustums between sample
    edges (mip-NeRF, Barron et al. 2021, eqn. 7 — the numerically stable
    reparameterization). ``shape="cylinder"`` switches to the NDC
    cylinder moments (see ``cylinder_moments``).

    Each pixel's ray is widened into a cone of radius ``base_radius * t``
    (for the framework's unnormalized-direction convention the per-frame
    ``base_radius`` is ``2/sqrt(12) / focal`` — the pixel's world-space
    half-width at unit distance along the image plane, matching the
    reference dir grid spacing 1/f at ops/rays.py). The frustum between
    consecutive edges is summarized by a Gaussian with along-ray moments
    (mu_t, sigma_t^2) and perpendicular variance sigma_r^2; projected to
    world axes the diagonal covariance is

        var = sigma_t^2 * d^2 + sigma_r^2 * (1 - d^2 / ||d||^2).

    Pure broadcast arithmetic — no gathers, no control flow; XLA fuses
    the whole thing into the encoder's operand producer.

    Args:
      rays: (B, >=6) packed ``[origin | direction | ...]`` (direction
        unnormalized — the cone lives in the same t-units as sampling;
        columns past 6 are ignored here).
      t_edges: (B, N+1) ascending interval edges.
      base_radius: cone radius growth per unit t (scalar or (B, 1)).

    Returns:
      means (B, N, 3), vars (B, N, 3), t_mids (B, N) — the frustum
      Gaussian centers' distances along the ray (mu_t).
    """
    origins, d = rays[:, :3], rays[:, 3:6]
    t0, t1 = t_edges[:, :-1], t_edges[:, 1:]
    mu_t, sig_t2, sig_r2 = interval_moments(t0, t1, base_radius, shape)
    means = origins[:, None, :] + d[:, None, :] * mu_t[..., None]
    d2 = d**2
    n2 = jnp.sum(d2, axis=-1, keepdims=True)
    vars_ = sig_t2[..., None] * d2[:, None, :] + sig_r2[..., None] * (
        1.0 - d2[:, None, :] / n2[:, None, :]
    )
    return means, vars_, mu_t
