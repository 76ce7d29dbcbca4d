"""Ray -> radiance rendering paths.

``render_rays`` is the behavioral equivalent of reference
utils/rendering.py:13-45 (stratified sample -> MLP -> composite) as one
pure jnp function: under jit the whole stack — sampling, encoding, nine
matmuls, compositing — compiles to a single fused XLA program (the
reference's three-hot-spot pipeline collapsed into one device launch).

``render_rays_hierarchical`` adds the coarse+fine inverse-CDF scheme the
reference left as a roadmap item (utils/nets.py:45-48 stubs).

``render_image`` / ``render_orbit_video`` are the equivalents of
utils/rendering.py:88-160: tiled full-image rendering. Unlike the
reference (which silently drops H*W % batch_size remainder rays,
utils/rendering.py:100), rays are padded to a whole number of fixed-size
chunks and the pad is stripped after — every pixel is rendered and every
chunk has the same static shape, so XLA compiles exactly one chunk program.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from nerf_simple_tpu.models import apply_model
from nerf_simple_tpu.models.nerf import NerfMLP, Params
from nerf_simple_tpu.ops.rays import rays_for_poses
from nerf_simple_tpu.ops.sampling import (
    importance_ts,
    merge_sorted,
    sample_points,
    stratified_ts,
    stratified_ts_spaced,
)
from nerf_simple_tpu.ops.volume import CompositeOut, composite, composite_T


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Static render configuration (hashable: safe as a jit static arg).

    Defaults mirror the reference call sites: N=128 hardcoded at
    utils/rendering.py:102/145, tn=2 / tf=6 defaults at utils/rendering.py:13.
    """

    N: int = 128  # samples per ray (fine count when hierarchical)
    N_coarse: int = 0  # >0 enables hierarchical coarse+fine
    # >0 enables proposal-guided sampling (models/proposal.py): N_prop
    # cheap density probes place the N main samples. Mutually exclusive
    # with N_coarse; the chunked render entry points also need the
    # ProposalMLP arch (``prop_model``) and {"prop", "fine"} params.
    N_prop: int = 0
    tn: float = 2.0
    tf: float = 6.0
    # Mip-NeRF cone casting (ops/sampling.py::conical_gaussian +
    # integrated PE): samples become conical-frustum Gaussians and the
    # position encoding damps frequencies below the pixel footprint —
    # anti-aliased rendering at any scale. ``base_radius`` is the cone
    # radius growth per unit t, 2/sqrt(12)/focal for a pinhole frame
    # (the drivers compute it). NerfMLP-family; backend="pallas" runs
    # the fused kernel with its in-kernel IPE encoder.
    mip: bool = False
    base_radius: float = 0.0
    # 2 = full mip-NeRF: shared-MLP coarse render -> resampled fine
    # edges (ops/sampling.py::resample_edges) -> fine render
    mip_levels: int = 1
    # "cone" (pinhole frames) or "cylinder" (NDC-warped LLFF rays, whose
    # cross-section doesn't grow with t; pairs with per-ray radii in ray
    # column 6 — ops/rays.py::mip_ray_radii)
    mip_shape: str = "cone"
    # Uniform exploration floor added per bin when interval edges are
    # resampled from a weight histogram (ops/sampling.py::resample_edges
    # ``blur``; mip-NeRF's alpha=0.01, Barron 2021 sec. 3.2). Note the
    # scale: 0.01 per bin across Np=64 bins scatters a double-digit
    # percentage of the fine edges uniformly along every ray — far more
    # exploration than the point sampler's 1e-5 floor (importance_ts).
    resample_blur: float = 0.01
    # mip-NeRF 360's opaque_background: extend the LAST frustum to
    # infinity so interval compositing gets the same boundary absorber
    # the point path's 1e10 tail provides. Required for unbounded
    # (contract) scenes under mip — without it the field has nowhere to
    # charge background misses (see ops/volume.py::composite_intervals).
    opaque_background: bool = False
    # stratified bin spacing: "linear" (reference) or "disparity"
    # (uniform in 1/t — the mip-NeRF 360 unbounded parametrization;
    # pair with model.contract for 360 scenes)
    sampling_space: str = "linear"
    compute_dtype: Any = jnp.float32
    # Max sample rows per MLP call; larger batches are lax.map'd in equal
    # chunks. Identical math — purely a program-structure knob: a single
    # 524288-row fwd+bwd MLP program trips a libtpu regalloc RET_CHECK
    # (live_range_finder.cc:29) on v5e, while <=262144-row programs
    # compile fine, and chunking also caps activation HBM footprint.
    max_mlp_rows: int = 262144
    # "xla": layer-by-layer jnp MLP (the correctness oracle).
    # "pallas": fully-fused VMEM-resident MLP kernel (kernels/mlp.py)
    # — ~2x faster fwd+bwd on v5e; flagship-architecture only.
    backend: str = "xla"
    # std of Gaussian noise added to raw sigma during training — the
    # regularizer the reference left as a TODO (utils/rendering.py:63;
    # original NeRF sec. A). 0.0 = off (reference behavior).
    sigma_noise: float = 0.0
    # Use the all-in-one fused render kernel (MLP + compositing) for eval.
    # Measured SLOWER than fwd-kernel + XLA compositing on v5e (854 vs
    # 784 ms per 800x800x128 frame: in-kernel compositing serializes with
    # the MXU, while XLA's overlaps with the next chunk) — off by default,
    # kept for hardware where kernel-launch overhead dominates.
    fused_eval: bool = False
    # statics for occupancy-informed eval sampling (ops/occupancy.py);
    # active only when an ``occ`` grid array is passed to the chunked
    # render entry points. Deterministic quantile draws (det=True) keep
    # eval frames reproducible.
    occ_Nb: int = 64
    occ_floor: float = 0.01
    occ_aabb: float = 4.0
    # share one occupancy probe across each run of ``occ_group``
    # consecutive rays (adjacent pixels at eval traverse the same grid
    # cells) — divides the probe gather count, the occ sampler's dominant
    # cost, by the group size. 1 = per-ray probes (always used for
    # training's random ray batches).
    occ_group: int = 1
    # Ask the fused kernel's VJP for input gradients dL/dx (pose
    # refinement trains through ray generation; kernels/mlp.py
    # _input_grad_tile). Only meaningful under autodiff on the pallas
    # backend; costs three skinny matmuls + an (8, rows) write in the
    # backward kernel, so off for everything but the pose train path.
    input_grads: bool = False


def render_rays(
    params: Params,
    rays: jnp.ndarray,
    key: jax.Array,
    settings: RenderSettings = RenderSettings(),
    model: NerfMLP = NerfMLP(),
    ts: jnp.ndarray | None = None,
    app: jnp.ndarray | None = None,
    enc_alpha: jnp.ndarray | None = None,
) -> CompositeOut:
    """Stratified-sample and render a batch of rays (coarse-only path).

    Args:
      params: MLP params pytree.
      rays: (B, 6) packed ``[origin | direction]`` (direction unnormalized).
      key: PRNG key for stratified jitter.
      ts: optional externally chosen (B, N) sorted sample distances (e.g.
        occupancy-informed, ops/occupancy.py); None = stratified.
      app: optional (B, model.app_dim) per-ray appearance codes
        (models/nerf.py app_dim) — broadcast over samples and appended to
        the direction encoding. Both backends (the pallas kernel carries
        codes on its input stream's rows 8..15 when app_dim <= 8; wider
        codes fall back to XLA).
      enc_alpha: optional BARF anneal progress in [0, 1] (traced scalar)
        — damps high PE octaves during joint pose refinement
        (TrainConfig.pe_anneal_until). Both backends: the pallas path
        windows in-kernel (kernels/mlp.py::anneal_row_weights).

    Returns CompositeOut; ``.rgb`` is raw/unclipped like the reference.
    """
    B = rays.shape[0]
    # noise key derived by fold_in so the ts stream is unchanged whether or
    # not the regularizer is enabled (parity when sigma_noise == 0)
    noise_key = jax.random.fold_in(key, 1) if settings.sigma_noise > 0 else None
    if settings.mip:
        assert ts is None, "mip rendering draws its own interval edges"
        assert app is None, "appearance codes are not plumbed through mip"
        assert enc_alpha is None, "PE annealing is not plumbed through mip"
        return _render_mip(params, rays, key, settings, model, noise_key)
    if ts is None:
        ts = stratified_ts_spaced(
            key, B, settings.N, settings.tn, settings.tf, rays.dtype,
            settings.sampling_space,
        )
    return _render_at_ts(
        params, rays, ts, settings, model, noise_key, app, enc_alpha
    )


def _render_mip(
    params: Params,
    rays: jnp.ndarray,
    key: jax.Array,
    settings: RenderSettings,
    model: NerfMLP,
    noise_key: jax.Array | None = None,
    return_coarse: bool = False,
) -> CompositeOut | tuple[CompositeOut, CompositeOut]:
    """Cone-cast rendering: N+1 stratified edges -> N conical-frustum
    Gaussians -> IPE forward -> interval compositing (finite deltas, no
    1e10 tail). One fused XLA program like the point path.

    ``settings.mip_levels == 2`` runs the full mip-NeRF algorithm: the
    SAME params render a coarse level, the fine level's edges are
    resampled from the (stop-gradient) coarse weight histogram
    (ops/sampling.py::resample_edges), and the fine output is returned
    (both with ``return_coarse=True`` — the train loss needs both)."""
    B, N = rays.shape[0], settings.N

    def one_level(edges, nk):
        return _mip_level(params, rays, edges, settings, model, nk)

    edges = stratified_ts_spaced(
        key, B, N + 1, settings.tn, settings.tf, rays.dtype,
        settings.sampling_space,
    )
    out_c = one_level(edges, noise_key)
    if settings.mip_levels < 2:
        return out_c

    from nerf_simple_tpu.ops.sampling import resample_edges

    edges_f = resample_edges(
        jax.random.fold_in(key, 2),
        edges,
        jax.lax.stop_gradient(out_c.weights),
        N,
        blur=settings.resample_blur,
    )
    out_f = one_level(
        edges_f,
        jax.random.fold_in(noise_key, 2) if noise_key is not None else None,
    )
    if return_coarse:
        return out_c, out_f
    return out_f


def _mip_level(
    params: Params,
    rays: jnp.ndarray,
    edges: jnp.ndarray,
    settings: RenderSettings,
    model: NerfMLP,
    nk: jax.Array | None = None,
) -> CompositeOut:
    """Render ONE cone-cast level at the given interval edges: conical
    frustum Gaussians -> IPE forward -> interval compositing (finite
    deltas, no 1e10 tail). Shared by ``_render_mip`` (stratified /
    resampled edges) and ``render_rays_proposal`` under ``settings.mip``
    (proposal-placed edges — the mip-NeRF 360 composition).

    8-column rays (multiscale training / NDC animation) carry a per-ray
    cone radius in column 6, overriding ``settings.base_radius``.
    """
    from nerf_simple_tpu.models.nerf import nerf_apply_mip
    from nerf_simple_tpu.ops.sampling import conical_gaussian
    from nerf_simple_tpu.ops.volume import composite_intervals

    assert isinstance(model, NerfMLP), (
        "mip rendering is NerfMLP-family only (the hash encoding has no "
        "integrated form)"
    )
    B, N = edges.shape[0], edges.shape[1] - 1
    dirs = rays[:, 3:6]
    unit_dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    radius = rays[:, 6:7] if rays.shape[1] >= 7 else settings.base_radius

    if settings.backend == "pallas":
        # fused kernel with the IPE encoder (kernels/mlp.py mip=True);
        # interval compositing stays in XLA like the point eval path
        outT, t_mids = _fused_mlp_bn_mip(
            params, rays, edges, settings, model, radius
        )
        if nk is not None and settings.sigma_noise > 0:
            noise = settings.sigma_noise * jax.random.normal(nk, (B, N))
            outT = outT.at[3].add(noise)
        return composite_intervals(
            jnp.moveaxis(outT, 0, -1), edges, t_mids, unit_dirs,
            opaque_tail=settings.opaque_background,
        )

    means, vars_, t_mids = conical_gaussian(
        rays, edges, radius, settings.mip_shape
    )
    rows = B * N
    q = jnp.concatenate(
        [
            means.reshape(rows, 3),
            vars_.reshape(rows, 3),
            jnp.broadcast_to(unit_dirs[:, None, :], (B, N, 3)).reshape(
                rows, 3
            ),
        ],
        axis=-1,
    )

    def f(qq):
        return nerf_apply_mip(
            params, qq[:, :3], qq[:, 3:6], qq[:, 6:9], model,
            settings.compute_dtype,
        )

    k = 1
    while rows // k > settings.max_mlp_rows and rows % (k * 2) == 0:
        k *= 2
    out = (
        jax.lax.map(f, q.reshape(k, rows // k, 9)) if k > 1 else f(q)
    ).reshape(B, N, 4)
    if nk is not None and settings.sigma_noise > 0:
        noise = settings.sigma_noise * jax.random.normal(nk, (B, N))
        out = out.at[..., 3].add(noise)
    return composite_intervals(
        out, edges, t_mids, unit_dirs,
        opaque_tail=settings.opaque_background,
    )


def _render_at_ts(
    params: Params,
    rays: jnp.ndarray,
    ts: jnp.ndarray,
    settings: RenderSettings,
    model: NerfMLP,
    noise_key: jax.Array | None = None,
    app: jnp.ndarray | None = None,
    enc_alpha: jnp.ndarray | None = None,
) -> CompositeOut:
    from nerf_simple_tpu.kernels.mlp import supported as _kernel_ok

    B, N = ts.shape
    if (
        settings.backend == "pallas"
        and isinstance(model, NerfMLP)
        and _kernel_ok(model)  # app_dim > 8 falls back to the XLA path
        and (app is None) == (model.app_dim == 0)
    ):
        # feature-major path: build the kernel's x^T directly from the
        # (B, N) ray/sample structure — no (B*N, 6) transpose ever
        # exists. BARF annealing (enc_alpha) runs in-kernel via per-row
        # window weights (kernels/mlp.py::anneal_row_weights);
        # appearance codes (app) ride input rows 8..15 and their
        # gradients return through the kernel's input-grad output.
        outT = _fused_mlp_bn(
            params, rays, ts, settings, model, enc_alpha=enc_alpha,
            app=app,
        )  # (4,B,N)
        if noise_key is not None and settings.sigma_noise > 0:
            noise = settings.sigma_noise * jax.random.normal(noise_key, (B, N))
            outT = outT.at[3].add(noise)
        dirs = rays[:, 3:]
        unit_dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        return composite_T(outT, ts, unit_dirs)

    locs, unit_dirs = sample_points(rays, ts)
    query = jnp.concatenate(
        [locs, jnp.broadcast_to(unit_dirs[:, None, :], locs.shape)], axis=-1
    ).reshape(B * N, 6)
    C = 6
    if app is not None:
        # per-ray appearance codes broadcast over samples; they ride the
        # query columns so the lax.map chunking below splits them with
        # the coordinates
        A = app.shape[-1]
        query = jnp.concatenate(
            [
                query,
                jnp.broadcast_to(app[:, None, :], (B, N, A)).reshape(
                    B * N, A
                ),
            ],
            axis=-1,
        )
        C += A

    def _apply(q):
        return apply_model(
            params, q[:, :6], model, compute_dtype=settings.compute_dtype,
            app=q[:, 6:] if app is not None else None,
            enc_alpha=enc_alpha,
        )

    rows = B * N
    k = 1
    while rows // k > settings.max_mlp_rows and rows % (k * 2) == 0:
        k *= 2
    if k > 1:
        out = jax.lax.map(_apply, query.reshape(k, rows // k, C))
    else:
        out = _apply(query)
    out = out.reshape(B, N, 4)
    if noise_key is not None and settings.sigma_noise > 0:
        noise = settings.sigma_noise * jax.random.normal(noise_key, (B, N))
        out = out.at[..., 3].add(noise)
    return composite(out, ts, unit_dirs)


def _fused_mlp_bn_mip(
    params: Params,
    rays: jnp.ndarray,
    edges: jnp.ndarray,
    settings: RenderSettings,
    model: NerfMLP,
    radius=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """``_fused_mlp_bn`` for the mip path: frustum Gaussian moments
    (ops/sampling.py::frustum_moments) built directly in the kernel's
    feature-major (16, B*N) layout — means rows 0..2, unit dirs 3..5,
    diagonal variances 11..13 — evaluated by the fused kernel's IPE
    encoder. ``radius`` is the scalar or (B, 1) per-ray cone radius
    (default: settings.base_radius). Returns ((4, B, N) rgb/sigma,
    (B, N) frustum centers)."""
    from nerf_simple_tpu.kernels.mlp import fused_mlp, pack_weights, supported
    from nerf_simple_tpu.ops.sampling import frustum_gaussians_T

    assert supported(model), (
        f"pallas backend needs H % 16 == 0, H >= 16 (got {model}); "
        "use backend='xla' for other architectures"
    )
    if radius is None:
        radius = settings.base_radius
    B, N = edges.shape[0], edges.shape[1] - 1
    meanT, unitT, varT, mu_t = frustum_gaussians_T(
        rays, edges, radius, settings.mip_shape
    )
    x = jnp.concatenate(
        [
            meanT,
            jnp.broadcast_to(unitT[:, :, None], (3, B, N)),
            jnp.zeros((5, B, N), rays.dtype),
            varT,
            jnp.zeros((2, B, N), rays.dtype),
        ],
        axis=0,
    ).reshape(16, B * N)

    rows = B * N
    tile = 1024 if rows % 1024 == 0 else 128
    rows_p = -(-rows // tile) * tile
    if rows_p != rows:
        x = jnp.pad(x, ((0, 0), (0, rows_p - rows)))
    wts = pack_weights(params, model=model)
    # input_grads (pose_opt + mip): the backward kernel emits
    # dL/d(mean, dir, variance) via _input_grad_tile_mip, and XLA
    # autodiff chains them through frustum_gaussians_T -> the ray
    # stream -> apply_cam_deltas
    outT = fused_mlp(
        wts, x, tile, settings.compute_dtype, model, True,
        settings.input_grads,
    )
    return outT[:4, :rows].reshape(4, B, N), mu_t


def _fused_mlp_bn(
    params: Params,
    rays: jnp.ndarray,
    ts: jnp.ndarray,
    settings: RenderSettings,
    model: NerfMLP,
    enc_alpha: jnp.ndarray | None = None,
    app: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Evaluate the fused Pallas MLP over a (B, N) ray/sample grid.

    Builds the kernel's feature-major x^T (8, B*N) directly from the ray
    structure — rows 0..2 sample xyz (unnormalized-dir placement, the
    reference quirk at utils/rendering.py:31-36), rows 3..5 unit view dir
    — so no (rows, 6)-shaped minor-dim transpose is ever materialized.
    ``app`` (B, model.app_dim), required iff the model has an appearance
    rail: codes broadcast per sample onto rows 8..15 of a 16-row stream
    (kernels/mlp.py FusedWeightsApp); under autodiff their gradients
    come back through the kernel's input-grad output, so the per-image
    code tables train at fused-kernel speed.
    Returns channel-major (4, B, N); gradients flow to ``params`` through
    pack_weights' (differentiable) permutation/transposition.
    """
    from nerf_simple_tpu.kernels.mlp import fused_mlp, pack_weights, supported

    assert supported(model), (
        f"pallas backend needs H % 16 == 0, H >= 16, app_dim <= 8 (got "
        f"{model}); use backend='xla' for other architectures"
    )
    assert (app is None) == (model.app_dim == 0), (model.app_dim, app)
    B, N = ts.shape
    oT = rays[:, :3].T  # (3, B) — tiny transposes
    dT = rays[:, 3:].T  # (3, B)
    unitT = dT / jnp.linalg.norm(dT, axis=0, keepdims=True)
    locs_T = oT[:, :, None] + dT[:, :, None] * ts[None, :, :]  # (3, B, N)
    dirs_T = jnp.broadcast_to(unitT[:, :, None], (3, B, N))
    blocks = [locs_T, dirs_T, jnp.zeros((2, B, N), rays.dtype)]
    if app is not None:
        appT = jnp.broadcast_to(
            app.T[:, :, None].astype(rays.dtype),
            (model.app_dim, B, N),
        )
        blocks += [appT, jnp.zeros((8 - model.app_dim, B, N), rays.dtype)]
    x = jnp.concatenate(blocks, axis=0).reshape(-1, B * N)

    rows = B * N
    tile = 1024 if rows % 1024 == 0 else 128
    rows_p = -(-rows // tile) * tile
    if rows_p != rows:
        x = jnp.pad(x, ((0, 0), (0, rows_p - rows)))
    wts = pack_weights(params, model=model)
    enc_w = None
    if enc_alpha is not None:
        from nerf_simple_tpu.kernels.mlp import anneal_row_weights

        enc_w = anneal_row_weights(model, enc_alpha)
    outT = fused_mlp(
        wts, x, tile, settings.compute_dtype, model, False,
        settings.input_grads, enc_w,
    )
    return outT[:4, :rows].reshape(4, B, N)


def render_rays_hierarchical(
    params_coarse: Params,
    params_fine: Params,
    rays: jnp.ndarray,
    key: jax.Array,
    settings: RenderSettings,
    model: NerfMLP = NerfMLP(),
    det_fine: bool = False,
    ts_coarse: jnp.ndarray | None = None,
    return_ts: bool = False,
    app: jnp.ndarray | None = None,
    enc_alpha: jnp.ndarray | None = None,
) -> tuple[CompositeOut, CompositeOut]:
    """Coarse+fine rendering (reference roadmap feature, built per the NeRF
    paper sec. 5.2): Nc stratified coarse samples -> weight PDF ->
    N importance samples; the fine net evaluates the sorted union of both
    sample sets (Nc + N points per ray).

    ``ts_coarse`` optionally replaces the stratified coarse samples (e.g.
    occupancy-informed, ops/occupancy.py).

    Returns (coarse_out, fine_out); with ``return_ts``, additionally the
    (ts_coarse, ts_union) sample distances (the distortion regularizer
    needs the ts each composite consumed).
    """
    assert settings.N_coarse > 0, "hierarchical path needs N_coarse > 0"
    k_strat, k_imp = jax.random.split(key)
    B = rays.shape[0]
    ts_c = ts_coarse
    if ts_c is None:
        ts_c = stratified_ts_spaced(
            k_strat, B, settings.N_coarse, settings.tn, settings.tf,
            rays.dtype, settings.sampling_space,
        )
    coarse_out = _render_at_ts(
        params_coarse, rays, ts_c, settings, model, app=app,
        enc_alpha=enc_alpha,
    )

    ts_f = importance_ts(
        k_imp,
        ts_c,
        jax.lax.stop_gradient(coarse_out.weights),
        settings.N,
        det=det_fine,
    )
    ts_all = merge_sorted(ts_c, ts_f)  # both sorted: O(N) rank merge
    fine_out = _render_at_ts(
        params_fine, rays, ts_all, settings, model, app=app,
        enc_alpha=enc_alpha,
    )
    if return_ts:
        return coarse_out, fine_out, (ts_c, ts_all)
    return coarse_out, fine_out


def render_rays_proposal(
    params: dict,
    rays: jnp.ndarray,
    key: jax.Array,
    settings: RenderSettings,
    model: NerfMLP = NerfMLP(),
    prop_model=None,
    det_fine: bool = False,
    ts_prop: jnp.ndarray | None = None,
    return_aux: bool = False,
    app: jnp.ndarray | None = None,
    enc_alpha: jnp.ndarray | None = None,
    prop_anneal: jnp.ndarray | None = None,
):
    """Proposal-guided rendering (mip-NeRF 360 scheme, models/proposal.py):
    N_prop stratified probes of the tiny proposal density -> weight PDF ->
    the main net evaluates ONLY the N importance samples (no coarse∪fine
    union — the proposal net exists so the expensive field never touches
    badly-placed points).

    ``params`` = {"prop": proposal params, "fine": main-field params}.
    ``ts_prop`` optionally replaces the stratified probe distances (e.g.
    occupancy-informed). ``return_aux`` additionally returns
    (ts_prop, w_prop, ts_fine) — the interlevel loss consumes them;
    ``w_prop`` is differentiable wrt the proposal params.

    With ``settings.mip`` this becomes the full mip-NeRF 360 composition:
    the proposal's interval histogram over stratified probe EDGES places
    the fine level's interval edges (ops/sampling.py::resample_edges),
    and the main field renders IPE cone frustums at them (``_mip_level``).
    ``return_aux`` then returns (edges_prop, w_prop, edges_fine) — the
    interval-form interlevel/distortion losses consume these.

    ``prop_anneal``: traced placement-anneal exponent in [0, 1] (train
    drivers only; ops/sampling.py::anneal_weights) — the histogram that
    PLACES samples is ``w_prop ** prop_anneal`` while the interlevel
    loss target stays un-annealed. None (eval) = true weights.
    """
    from nerf_simple_tpu.models.proposal import ProposalMLP, proposal_weights

    assert settings.N_prop > 0, "proposal path needs N_prop > 0"
    if prop_model is None:
        prop_model = ProposalMLP()
    k_strat, k_imp = jax.random.split(key)
    B = rays.shape[0]
    if settings.mip:
        from nerf_simple_tpu.models.proposal import (
            proposal_weights_intervals,
        )
        from nerf_simple_tpu.ops.sampling import (
            anneal_weights,
            resample_edges,
        )

        # config blocks appearance/anneal/occupancy with mip (IPE is not
        # plumbed through them); probe edges are freshly stratified
        # (midpoint-placed under det_fine so eval renders are fully
        # deterministic end to end)
        assert app is None and enc_alpha is None and ts_prop is None
        edges_p = stratified_ts_spaced(
            k_strat, B, settings.N_prop + 1, settings.tn, settings.tf,
            rays.dtype, settings.sampling_space, det=det_fine,
        )
        w_prop = proposal_weights_intervals(
            params["prop"], rays, edges_p, prop_model, settings.compute_dtype,
            opaque_tail=settings.opaque_background,
        )
        edges_f = resample_edges(
            k_imp,
            edges_p,
            anneal_weights(jax.lax.stop_gradient(w_prop), prop_anneal),
            settings.N,
            blur=settings.resample_blur,
            det=det_fine,
        )
        out = _mip_level(params["fine"], rays, edges_f, settings, model)
        if return_aux:
            return out, (edges_p, w_prop, edges_f)
        return out
    if ts_prop is None:
        ts_prop = stratified_ts_spaced(
            k_strat, B, settings.N_prop, settings.tn, settings.tf,
            rays.dtype, settings.sampling_space, det=det_fine,
        )
    w_prop = proposal_weights(
        params["prop"], rays, ts_prop, prop_model, settings.compute_dtype
    )
    from nerf_simple_tpu.ops.sampling import anneal_weights

    ts_f = importance_ts(
        k_imp,
        ts_prop,
        anneal_weights(jax.lax.stop_gradient(w_prop), prop_anneal),
        settings.N,
        det=det_fine,
    )
    # enc_alpha anneals the MAIN field only: the proposal MLP is a
    # low-capacity smooth density (Lp=6 default) whose whole job is the
    # coarse geometry the anneal would be keeping anyway
    out = _render_at_ts(
        params["fine"], rays, ts_f, settings, model, app=app,
        enc_alpha=enc_alpha,
    )
    if return_aux:
        return out, (ts_prop, w_prop, ts_f)
    return out


# ---------------------------------------------------------------------------
# Tiled full-image rendering.
# ---------------------------------------------------------------------------


def _fused_render_tile_for(settings: RenderSettings, chunk: int) -> int:
    """Ray tile for the fused eval render kernel, or 0 if ineligible."""
    if (
        not settings.fused_eval
        or settings.backend != "pallas"
        or settings.N_coarse > 0
        or settings.N_prop > 0
        or settings.mip
    ):
        return 0
    N = settings.N
    R = 1
    while R * 2 * N <= 1024 and chunk % (R * 2) == 0:
        R *= 2
    if chunk % R:
        return 0
    return R * N


@functools.lru_cache(maxsize=32)
def _chunked_render_fn(
    settings: RenderSettings,
    model: NerfMLP,
    chunk: int,
    mesh=None,
    prop_model=None,
    has_app: bool = False,
    has_alpha: bool = False,
):
    """Build a jitted fn mapping padded (n_chunks, chunk, 6) rays ->
    (rgb, disp) with one compiled chunk program scanned over chunks.

    ``has_alpha``: thread the traced BARF anneal progress (``alpha``
    argument of the returned fn) into the encoders — used by mid-anneal
    training previews (TrainConfig.pe_anneal_until), where rendering at
    full frequency would feed never-trained octaves. Forces the XLA
    path (the fused kernel computes the standard encoder).

    With ``mesh``, chunks are sharded over the ``data`` axis (shard_map:
    each chip scans its own block of chunks, params/occ replicated, no
    collectives — results concatenate on the sharded axis). Chunk PRNG
    keys are folded with GLOBAL chunk indices, so multi-chip renders are
    bit-identical to single-chip ones."""

    from nerf_simple_tpu.kernels.mlp import supported as _kernel_supported

    fused_tile = (
        _fused_render_tile_for(settings, chunk)
        if _kernel_supported(model) and not has_app and not has_alpha
        else 0
    )

    def fused_chunk(params, rays_c, k, ts):
        from nerf_simple_tpu.kernels.mlp import fused_render, pack_weights

        B, N = rays_c.shape[0], settings.N
        oT = rays_c[:, :3].T
        dT = rays_c[:, 3:].T
        unitT = dT / jnp.linalg.norm(dT, axis=0, keepdims=True)
        locs_T = oT[:, :, None] + dT[:, :, None] * ts[None]
        x16 = jnp.concatenate(
            [
                locs_T,
                jnp.broadcast_to(unitT[:, :, None], (3, B, N)),
                ts[None],
                jnp.zeros((9, B, N), rays_c.dtype),
            ],
            axis=0,
        ).reshape(16, B * N)
        out = fused_render(
            pack_weights(params, model=model),
            x16,
            N,
            fused_tile,
            settings.compute_dtype,
            model,
        )
        heads = out[:, ::N]  # (8, B): rgb rows 0..2, depth 3, acc 4
        rgb = jnp.clip(heads[:3].T, 0.0, 1.0)
        disp = 1.0 / jnp.maximum(1e-10, heads[3] / heads[4])
        return rgb, disp

    def _occ_ts(occ, rays_c, k, N):
        """Occupancy-informed deterministic sample distances, or None ->
        the callee's stratified sampler."""
        if occ is None:
            return None
        from nerf_simple_tpu.ops.occupancy import occupancy_ts

        return occupancy_ts(
            k, rays_c, occ, N, settings.tn, settings.tf, settings.occ_aabb,
            Nb=settings.occ_Nb, floor=settings.occ_floor, det=True,
            group=settings.occ_group,
        )

    def _scan_chunks(params, rays_chunks, idxs, key, occ, app, alpha):
        al = alpha if has_alpha else None

        def one_chunk(carry, inp):
            params, key = carry
            rays_c, idx = inp
            k = jax.random.fold_in(key, idx)
            app_c = (
                None
                if app is None
                else jnp.broadcast_to(
                    app, (rays_c.shape[0], app.shape[-1])
                )
            )
            if fused_tile:
                ts = _occ_ts(occ, rays_c, k, settings.N)
                if ts is None:
                    ts = stratified_ts_spaced(
                        k, rays_c.shape[0], settings.N, settings.tn,
                        settings.tf, rays_c.dtype, settings.sampling_space,
                    )
                return carry, fused_chunk(params, rays_c, k, ts)
            if settings.N_coarse > 0:
                # hierarchical eval: params = {"coarse", "fine"};
                # deterministic quantile importance samples for
                # reproducible frames
                _, out = render_rays_hierarchical(
                    params["coarse"], params["fine"], rays_c, k, settings,
                    model, det_fine=True,
                    ts_coarse=_occ_ts(occ, rays_c, k, settings.N_coarse),
                    app=app_c, enc_alpha=al,
                )
            elif settings.N_prop > 0:
                # proposal eval: params = {"prop", "fine"}; deterministic
                # quantiles of the proposal PDF
                out = render_rays_proposal(
                    params, rays_c, k, settings, model, prop_model,
                    det_fine=True,
                    ts_prop=_occ_ts(occ, rays_c, k, settings.N_prop),
                    app=app_c, enc_alpha=al,
                )
            else:
                out = render_rays(
                    params, rays_c, k, settings, model,
                    ts=_occ_ts(occ, rays_c, k, settings.N),
                    app=app_c, enc_alpha=al,
                )
            rgb = jnp.clip(out.rgb, 0.0, 1.0)  # eval clip: rendering.py:103
            return carry, (rgb, out.disp)

        _, (rgb, disp) = jax.lax.scan(
            one_chunk, (params, key), (rays_chunks, idxs)
        )
        return rgb, disp

    if mesh is None:

        @jax.jit
        def run(params, rays_chunks, idxs, key, occ, app, alpha):
            return _scan_chunks(
                params, rays_chunks, idxs, key, occ, app, alpha
            )

        return run

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    @jax.jit
    def run(params, rays_chunks, idxs, key, occ, app, alpha):
        return shard_map(
            _scan_chunks,
            mesh=mesh,
            in_specs=(P(), P("data"), P("data"), P(), P(), P(), P()),
            out_specs=(P("data"), P("data")),
            check_vma=False,
        )(params, rays_chunks, idxs, key, occ, app, alpha)

    return run


def render_rays_chunked(
    params: Params,
    rays: jnp.ndarray,
    key: jax.Array,
    settings: RenderSettings = RenderSettings(),
    model: NerfMLP = NerfMLP(),
    chunk: int = 16384,
    occ: jnp.ndarray | None = None,
    mesh=None,
    prop_model=None,
    app: jnp.ndarray | None = None,
    enc_alpha: float | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Render an arbitrary number of rays in fixed-size padded chunks.

    ``app``: optional (app_dim,) appearance code conditioning the whole
    render (appearance-embedding checkpoints; broadcast per ray).

    ``enc_alpha``: optional BARF anneal progress in [0, 1) — render with
    the same partially-annealed encoder the field is being trained with
    (mid-anneal training previews; TrainConfig.pe_anneal_until). Traced,
    so every preview step reuses one compiled program. None = the
    standard full-frequency encoder (and fused-kernel eligibility).

    Returns (rgb clipped to [0,1] (R,3), disparity (R,)) for all R input
    rays — including the remainder the reference drops
    (utils/rendering.py:100).

    ``occ``: optional (R, R, R) occupancy grid (ops/occupancy.py) —
    samples are drawn as deterministic quantiles of the grid-informed
    PDF instead of stratified, concentrating the per-ray budget in
    occupied space (higher quality per sample at eval).

    ``mesh``: optional ``parallel.make_mesh`` device mesh — chunks are
    sharded over its ``data`` axis (each chip renders its own block,
    params replicated, no collectives) with bit-identical results to
    the single-chip path. Multi-host meshes work too: inputs are fed as
    host numpy (every process holds identical copies; jax uploads each
    process's addressable shards) and the sharded result is assembled on
    every host with ``multihost_utils.process_allgather``.
    """
    R = rays.shape[0]
    multihost = mesh is not None and any(
        d.process_index != jax.process_index() for d in mesh.devices.flat
    )
    # Align the chunk to 1024 rays: MXU-friendly tiling, and unaligned
    # sizes can crash the TPU AOT compiler (observed: a libtpu regalloc
    # RET_CHECK at chunk=16000 where 16384 compiles fine). The reference's
    # 16000-ray eval chunk (configs/lego.yaml:18) thus maps to 16384.
    chunk = max(1024 * (-(-chunk // 1024)), 1024) if R >= 1024 else chunk
    n_chunks = -(-R // chunk)
    if mesh is not None:
        # every chip scans an equal block of chunks
        n_dev = mesh.shape["data"]
        n_chunks = -(-n_chunks // n_dev) * n_dev
    pad = n_chunks * chunk - R
    rays_p = jnp.pad(rays, ((0, pad), (0, 0)))
    # Padded rays have zero direction -> zero norm; replicate the LAST
    # REAL ray instead (keeps the normalize finite, and keeps occ probe
    # GROUPS that straddle the real/pad boundary centered on a real ray
    # rather than a synthetic one — results are stripped anyway).
    C = rays.shape[1]  # 6, or 8 with per-ray mip radius/weight columns
    if pad:
        rays_p = rays_p.at[R:].set(jnp.broadcast_to(rays[R - 1], (pad, C)))
    run = _chunked_render_fn(
        settings, model, chunk, mesh, prop_model,
        has_app=app is not None, has_alpha=enc_alpha is not None,
    )
    rays_chunks = rays_p.reshape(n_chunks, chunk, C)
    idxs = jnp.arange(n_chunks)
    alpha = jnp.float32(1.0 if enc_alpha is None else enc_alpha)
    if multihost:
        # host numpy in (identical on every process -> jax uploads each
        # process's addressable shards of the P("data") inputs and treats
        # the replicated ones as such; device-local jax.Arrays would be
        # rejected against a global sharding)
        params = jax.device_get(params)
        rays_chunks = np.asarray(rays_chunks)
        idxs = np.asarray(idxs)
        key = np.asarray(key)
        occ = None if occ is None else np.asarray(occ)
        app = None if app is None else np.asarray(app)
        alpha = np.asarray(alpha)
    rgb, disp = run(params, rays_chunks, idxs, key, occ, app, alpha)
    if multihost:
        # the result is sharded over non-addressable devices; assemble the
        # full image on every host (one allgather over DCN per frame)
        from jax.experimental import multihost_utils

        rgb, disp = multihost_utils.process_allgather((rgb, disp), tiled=True)
    return rgb.reshape(-1, 3)[:R], disp.reshape(-1)[:R]


# ---------------------------------------------------------------------------
# Normal-map rendering (eval extra; no reference analogue — the reference
# LOADS GT normal maps, dataload.py:38-40, but nothing consumes them).
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _normals_chunk_fn(settings: RenderSettings, model: NerfMLP, chunk: int):
    """Jitted chunk renderer for surface normals: composite the
    density-gradient direction n(x) = -normalize(∇ softplus σ(x)) with
    the same per-sample weights the rgb render uses."""
    from nerf_simple_tpu.models import apply_model

    @jax.jit
    def run(params, rays_c, key):
        ts = stratified_ts_spaced(
            key, rays_c.shape[0], settings.N, settings.tn, settings.tf,
            rays_c.dtype, settings.sampling_space,
        )
        out = _render_at_ts(params, rays_c, ts, settings, model)
        locs, _ = sample_points(rays_c, ts)
        flat = locs.reshape(-1, 3)
        # grad of the SUMMED density = per-row gradients (sigma depends
        # only on its own row), as ONE batched matmul-shaped backward
        # pass — a per-row vmap(grad) lowers to a scalar-address program
        # that trips the libtpu regalloc RET_CHECK at these shapes.
        dirs = jnp.zeros_like(flat).at[:, 2].set(-1.0)  # sigma ignores dir

        def sigma_sum(x):
            from nerf_simple_tpu.models import zeros_app_for

            v = jnp.concatenate([x, dirs], axis=-1)
            return jnp.sum(
                jax.nn.softplus(
                    apply_model(
                        params, v, model, settings.compute_dtype,
                        app=zeros_app_for(model, x.shape[0]),
                    )[:, 3]
                )
            )

        g = jax.grad(sigma_sum)(flat).reshape(locs.shape)
        n = -g / jnp.maximum(
            jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-8
        )
        # Two deliberate choices, both validated against the analytic
        # hard-surface field (box faces -> flat colors, background ->
        # gray):
        # - the TAIL sample is excluded: the 1e10 tail delta makes the
        #   last weight absorb all remaining transmittance (acc == 1
        #   even for empty rays), so including it would composite pure
        #   gradient noise at the far plane on background pixels;
        # - the composite is NOT renormalized: its magnitude is the
        #   foreground/coherence mass, so empty or diffuse regions map
        #   to gray instead of amplified unit-length noise.
        return jnp.einsum(
            "bn,bnc->bc", out.weights[:, :-1], n[:, :-1]
        )

    return run


def render_normals_chunked(
    params: Params,
    rays: jnp.ndarray,
    key: jax.Array,
    settings: RenderSettings = RenderSettings(),
    model: NerfMLP = NerfMLP(),
    chunk: int = 16384,
) -> np.ndarray:
    """Render per-pixel surface normals for ``rays``: the per-sample
    density-gradient directions composited with the render weights,
    shape (R, 3), values in [-1, 1] with ||n|| <= 1 (magnitude =
    gradient coherence; ~0 over empty or diffuse regions). Hierarchical
    settings use the fine net at the plain N-sample setting (normals
    need one density field)."""
    if isinstance(params, dict) and "fine" in params:
        params = params["fine"]
    s = dataclasses.replace(
        settings, N_coarse=0, N_prop=0, mip=False, backend="xla"
    )
    # normals always render point samples; drop any mip radius/weight
    # columns (sample_points reads every column past 3 as the direction)
    rays = rays[:, :6]
    R = rays.shape[0]
    chunk = max(1024 * (-(-chunk // 1024)), 1024) if R >= 1024 else chunk
    n_chunks = -(-R // chunk)
    pad = n_chunks * chunk - R
    rays_p = jnp.pad(rays, ((0, pad), (0, 0)))
    if pad:
        rays_p = rays_p.at[R:].set(
            jnp.broadcast_to(rays[R - 1], (pad, rays.shape[1]))
        )
    run = _normals_chunk_fn(s, model, chunk)
    outs = []
    for i in range(n_chunks):
        outs.append(
            np.asarray(
                run(
                    params,
                    jax.lax.dynamic_slice_in_dim(rays_p, i * chunk, chunk),
                    jax.random.fold_in(key, i),
                )
            )
        )
    return np.concatenate(outs)[:R]


def render_image(
    params: Params,
    rays_split: jnp.ndarray,
    H: int,
    W: int,
    im_idx: int,
    key: jax.Array,
    settings: RenderSettings = RenderSettings(),
    model: NerfMLP = NerfMLP(),
    chunk: int = 16384,
    occ: jnp.ndarray | None = None,
    mesh=None,
    prop_model=None,
    app: jnp.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Render image ``im_idx`` from a precomputed per-split ray tensor.

    Equivalent of utils/rendering.py:88-113 (which slices the split ray
    dataset by image index). Returns host numpy (1,H,W,3) rgb in [0,1] and
    (1,H,W,1) disparity, the reference's TensorBoard-ready shapes.
    """
    n = H * W
    rays = jax.lax.dynamic_slice_in_dim(rays_split, im_idx * n, n, axis=0)
    rgb, disp = render_rays_chunked(
        params, rays, key, settings, model, chunk, occ=occ, mesh=mesh,
        prop_model=prop_model, app=app,
    )
    return (
        np.asarray(rgb).reshape(1, H, W, 3),
        np.asarray(disp).reshape(1, H, W, 1),
    )


def render_orbit_video(
    params: Params,
    poses: np.ndarray,
    H: int,
    W: int,
    f: float,
    savepath: str,
    key: jax.Array,
    settings: RenderSettings = RenderSettings(),
    model: NerfMLP = NerfMLP(),
    chunk: int = 16384,
    fps: int = 15,
    apply_ndc: bool = False,
    ndc_near: float = 1.0,
    occ: jnp.ndarray | None = None,
    mesh=None,
    prop_model=None,
    app: jnp.ndarray | None = None,
) -> str:
    """Render a pose orbit and write an mp4 (equivalent of
    utils/rendering.py:116-160, reference writes 15fps mp4).

    Note: the reference passes (H, W) as the cv2 frame size
    (utils/rendering.py:156), which only works for square frames; we pass
    the correct (W, H).

    ``apply_ndc`` must be set for NDC-trained scenes (LLFF): training rays
    are NDC-warped at dataset build (data/dataset.py), so animation rays
    must take the same warp or t in [0,1] samples off-scene world space.

    Returns the written video path.
    """
    import cv2

    rays_all = rays_for_poses(jnp.asarray(poses, jnp.float32), H, W, f)
    if apply_ndc:
        from nerf_simple_tpu.ops.rays import ndc_rays

        rays_all = ndc_rays(rays_all, H, W, f, near=ndc_near)
    if settings.mip and apply_ndc:
        # NDC mip animation: per-ray cylinder radii from the warped
        # origins' neighbor spacing, same as the training rays
        from nerf_simple_tpu.ops.rays import append_mip_ray_columns

        rays_all = append_mip_ray_columns(rays_all, H, W, use_origins=True)
    n = H * W
    os.makedirs(savepath or ".", exist_ok=True)
    out_path = os.path.join(
        savepath, f"nerf_rgb{str(time.time())[-10:]}.mp4"
    )
    writer = cv2.VideoWriter(
        out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (W, H)
    )
    for i in range(len(poses)):
        frame_rays = jax.lax.dynamic_slice_in_dim(rays_all, i * n, n, axis=0)
        rgb, _ = render_rays_chunked(
            params, frame_rays, jax.random.fold_in(key, i), settings, model,
            chunk, occ=occ, mesh=mesh, prop_model=prop_model, app=app,
        )
        img = np.asarray(rgb).reshape(H, W, 3)
        bgr = cv2.cvtColor((img * 255).astype(np.uint8), cv2.COLOR_RGB2BGR)
        writer.write(bgr)
    writer.release()
    return out_path
