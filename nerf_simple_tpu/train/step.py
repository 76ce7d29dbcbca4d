"""The jitted training step: sample -> render -> loss -> grad -> Adam.

TPU-first redesign of the reference hot loop (train.py:45-57). One jit
compiles the WHOLE per-iteration pipeline — on-device batch selection
(deleting the reference's host randperm + per-step H2D, its two CPU hot
spots), stratified sampling, positional encoding, the 9-matmul MLP,
compositing, MSE on raw colors, backward, and the Adam update — and a
``lax.scan`` fuses ``steps_per_call`` iterations into one device launch so
dispatch/tunnel latency amortizes to nothing.

Learning-rate schedule replicates the reference exactly: Adam starts at
the HARDCODED 5e-4 (train.py:43 ignores lr_init — a known bug we
replicate by default for parity, fixable via honor_lr_init) and is
multiplied by ``exp(ln(lr_final/lr_init)/num_iters)`` after every step
(train.py:39,56-57), i.e. lr(i) = lr0 * decay^i.

Data parallelism: pass ``mesh`` and the step runs under an explicit
``shard_map`` — each chip draws its own B/n ray sub-batch, computes the
local loss/grad (through either backend; the fused Pallas kernels are
custom calls XLA cannot auto-partition), and the gradient ``pmean`` is the
only collective, riding ICI. Params and the HBM-resident ray dataset stay
replicated; the optimizer update runs replicated outside the shard_map.

The hot path uses a SINGLE fused Pallas kernel per iteration
(kernels/mlp.py::fused_train_step): forward MLP, volume compositing, the
MSE loss gradient, and the full backward run per ray-tile with
activations live in VMEM — no backward recompute, no activation HBM
traffic. Hierarchical runs two fused passes (coarse emits the importance
weights). Ineligible configs (non-flagship arch, sigma-noise,
indivisible shapes) fall back to autodiff over the render path.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from nerf_simple_tpu.config import TrainConfig
from nerf_simple_tpu.models.nerf import NerfMLP
from nerf_simple_tpu.render.renderer import (
    RenderSettings,
    render_rays,
    render_rays_hierarchical,
)


class TrainState(NamedTuple):
    params: Any  # Params, or {"coarse": Params, "fine": Params}
    opt_state: optax.OptState
    step: jnp.ndarray  # scalar int32
    # occupancy grid (cfg.occupancy): derived EMA state, (R, R, R); the
    # empty tuple when disabled. Rebuilt (not restored) when absent from
    # a checkpoint — see checkpoint.restore_checkpoint.
    occ: Any = ()


def _aux_on(cfg: TrainConfig) -> bool:
    """Per-image trainable extras enabled? (pose deltas / appearance
    codes — params gain a {"field": ..., "cams"/"app": ...} wrapper)."""
    return cfg.pose_opt or cfg.appearance_dim > 0


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    lr0 = cfg.lr_init if cfg.honor_lr_init else 5e-4  # train.py:43 quirk
    decay = float(jnp.exp(jnp.log(cfg.lr_final / cfg.lr_init) / cfg.num_iters))
    schedule = optax.exponential_decay(
        init_value=lr0, transition_steps=1, decay_rate=decay
    )
    if cfg.model_family == "hashgrid":
        # Instant-NGP optimizer settings (paper sec. 4: Adam with
        # eps=1e-15, beta2=0.99): hash-table entries receive SPARSE
        # gradients, so with the default eps=1e-8 a rarely-hit entry's
        # second-moment EMA decays toward zero between hits and its
        # effective step collapses; eps=1e-15 keeps the update ~lr-sized.
        field = optax.adam(learning_rate=schedule, b2=0.99, eps=1e-15)
    else:
        field = optax.adam(learning_rate=schedule)
    grid_tx = None
    if cfg.model_family == "cpgrid":
        # TensoRF sec. 5: the factor grids train at ~20x the decoder lr
        # (cfg.cp_lr_grid), decaying by the SAME per-step factor. Labels
        # are path-based so the split survives any params nesting
        # (hierarchical {"coarse","fine"}, proposal {"prop","fine"},
        # per-image-extras {"field", ...}).
        grid_tx = optax.adam(
            optax.exponential_decay(
                init_value=cfg.cp_lr_grid,
                transition_steps=1,
                decay_rate=decay,
            )
        )
    aux = _aux_on(cfg)

    def _cp_label_fn(params):
        def lab(path, _):
            keys = [getattr(k, "key", None) for k in path]
            if aux and keys and keys[0] in ("cams", "app"):
                return keys[0]
            if any(isinstance(n, str) and n.startswith("lines") for n in keys):
                return "grid"
            return "field"

        return jax.tree_util.tree_map_with_path(lab, params)

    if not aux:
        if grid_tx is None:
            return field
        return optax.multi_transform(
            {"field": field, "grid": grid_tx}, _cp_label_fn
        )
    # per-image extras get their own Adam groups: pose deltas on the
    # (faster-decaying) pose schedule, appearance codes on the main one
    pose_decay = float(
        jnp.exp(jnp.log(cfg.pose_lr_final / cfg.pose_lr_init) / cfg.num_iters)
    )

    def pose_schedule(step):
        # zero lr through the warmup (see TrainConfig.pose_warmup), then
        # the exponential schedule counted from training start
        lr = cfg.pose_lr_init * pose_decay**step
        return jnp.where(step < cfg.pose_warmup, 0.0, lr)

    tx = {
        "field": field,
        "cams": optax.adam(pose_schedule),
        "app": optax.adam(learning_rate=schedule),
    }
    if grid_tx is not None:
        tx["grid"] = grid_tx
        return optax.multi_transform(tx, _cp_label_fn)

    def label_fn(params):
        return {k: jax.tree.map(lambda _: k, v) for k, v in params.items()}

    return optax.multi_transform(tx, label_fn)


def make_train_state(
    key: jax.Array,
    cfg: TrainConfig,
    model: NerfMLP = NerfMLP(),
    n_images: int | None = None,
) -> TrainState:
    """``n_images`` (number of train images) is required when per-image
    extras are enabled (cfg.pose_opt / cfg.appearance_dim — the delta and
    code tables have one row per train image; the train driver passes
    it)."""
    from nerf_simple_tpu.models import init_model_params

    if cfg.hierarchical:
        kc, kf = jax.random.split(key)
        params: Any = {
            "coarse": init_model_params(kc, model),
            "fine": init_model_params(kf, model),
        }
    elif cfg.proposal:
        from nerf_simple_tpu.models.proposal import (
            init_proposal_params,
            proposal_from_train_config,
        )

        kp, kf = jax.random.split(key)
        params = {
            "prop": init_proposal_params(kp, proposal_from_train_config(cfg)),
            "fine": init_model_params(kf, model),
        }
    else:
        params = init_model_params(key, model)
    if _aux_on(cfg):
        if n_images is None:
            raise ValueError(
                "pose_opt / appearance_dim need n_images (rows of the "
                "per-image delta/code tables); the train driver passes "
                "the train-split image count"
            )
        # zero init: the identity pose correction / a no-op code — both
        # break symmetry through the photometric gradient itself
        params = {"field": params}
        if cfg.pose_opt:
            params["cams"] = {
                "dr": jnp.zeros((n_images, 3), jnp.float32),
                "dt": jnp.zeros((n_images, 3), jnp.float32),
            }
        if cfg.appearance_dim > 0:
            params["app"] = jnp.zeros(
                (n_images, cfg.appearance_dim), jnp.float32
            )
    opt_state = make_optimizer(cfg).init(params)
    occ: Any = ()
    if cfg.occupancy:
        from nerf_simple_tpu.ops.occupancy import init_occ_grid

        occ = init_occ_grid(cfg.occ_R)
    return TrainState(
        params=params, opt_state=opt_state, step=jnp.int32(0), occ=occ
    )


def freeze_pose_state(state: TrainState, cfg: TrainConfig) -> TrainState:
    """Drop the pose-refinement {"field", "cams"} params wrapper
    (TrainConfig.pose_freeze_at): returns a post-freeze TrainState whose
    params are the bare field and whose optimizer state is the plain
    field optimizer's — with the field's Adam moments (mu/nu/count) and
    the lr-schedule count carried over from the multi_transform state,
    so the optimizer trajectory is seamless across the freeze. The
    caller is responsible for baking ``state.params["cams"]`` into the
    ray dataset first (ops/rays.py::bake_cam_deltas) — dropping the
    deltas without baking silently un-refines the rig.

    Falls back to a FRESH field-optimizer init (with carried-over
    schedule/bias-correction counts where the state shape permits, and a
    loud warning) if the optax state layout ever stops matching the
    ``multi_transform(adam)`` structure this surgery expects."""
    import dataclasses
    import warnings

    field = state.params["field"]
    cfg2 = dataclasses.replace(
        cfg, pose_opt=False, pose_freeze_at=0, pe_anneal_until=0
    )
    tmpl = make_optimizer(cfg2).init(field)
    new_opt = tmpl
    try:
        # multi_transform state: inner_states["field"] is a MaskedState
        # whose inner_state is the field adam's chain state
        # (ScaleByAdamState, ScaleByScheduleState); mu/nu are full-tree
        # dicts with MaskedNode at non-field leaves.
        adam_st, sched_st = state.opt_state.inner_states[
            "field"
        ].inner_state
        new_opt = (
            tmpl[0]._replace(
                count=adam_st.count,
                mu=adam_st.mu["field"],
                nu=adam_st.nu["field"],
            ),
            tmpl[1]._replace(count=sched_st.count),
        )
        if jax.tree.structure(new_opt) != jax.tree.structure(tmpl):
            raise TypeError("carried state tree != plain optimizer tree")
    except (AttributeError, KeyError, TypeError) as e:
        warnings.warn(
            "pose freeze: could not carry Adam moments across the "
            f"wrapper drop ({type(e).__name__}: {e}); re-initializing "
            "the field optimizer (moments rebuild within ~100 iters, "
            "but the lr schedule restarts from lr_init)"
        )
        new_opt = tmpl
    return TrainState(
        params=field, opt_state=new_opt, step=state.step, occ=state.occ
    )


def build_train_step(
    cfg: TrainConfig,
    model: NerfMLP = NerfMLP(),
    mesh=None,
    donate: bool = True,
    rays_per_image: int | None = None,
    base_radius: float = 0.0,
):
    """Build ``step_fn(state, rays, pixels, key) -> (state, losses)``.

    ``rays``/``pixels`` are the full training split resident in HBM;
    ``losses`` is (steps_per_call,) — the per-iteration training MSE, so
    the driver logs exact per-iter losses without extra device syncs.

    ``rays_per_image`` (= H*W) is required only when
    ``cfg.train_im_idxs`` restricts sampling to specific train images
    (the reference's commented-out select_imgs mode, train.py:48).

    ``base_radius`` (cfg.mip only): per-frame cone radius growth,
    2/sqrt(12)/focal — the train driver computes it from the dataset.
    """
    if cfg.mip and base_radius <= 0:
        raise ValueError(
            "cfg.mip=True needs base_radius > 0 (2/sqrt(12)/focal; the "
            "train driver passes it automatically)"
        )
    # NDC-warped rays (LLFF) cast cylinders; pinhole frames cast cones
    mip_shape = (
        "cylinder" if (cfg.dataset == "llff" and cfg.ndc) else "cone"
    )
    if cfg.train_im_idxs and rays_per_image is None:
        raise ValueError(
            "cfg.train_im_idxs needs rays_per_image (= H*W) to map image "
            "indices to ray rows; the train driver passes it automatically"
        )
    aux_on = _aux_on(cfg)
    if aux_on and rays_per_image is None:
        raise ValueError(
            "pose_opt / appearance_dim need rays_per_image (= H*W) to map "
            "sampled ray rows to their source image; the train driver "
            "passes it automatically"
        )

    def sample_idx(key, n: int, n_rows):
        """Draw n ray indices: uniform over the split, or restricted to
        cfg.train_im_idxs (random image, random pixel within it)."""
        if not cfg.train_im_idxs:
            return jax.random.randint(key, (n,), 0, n_rows)
        k_img, k_pix = jax.random.split(key)
        im = jnp.asarray(cfg.train_im_idxs)[
            jax.random.randint(k_img, (n,), 0, len(cfg.train_im_idxs))
        ]
        pix = jax.random.randint(k_pix, (n,), 0, rays_per_image)
        return im * rays_per_image + pix

    optimizer = make_optimizer(cfg)
    base_model = model
    if (
        cfg.model_family == "hashgrid"
        and cfg.hash_fwd_mode == "sample"
        and getattr(model, "grad_mode", None) != "sample-fwd"
    ):
        # training-only forward estimator: one gathered corner per
        # query/level (8x fewer gather rows — the step bottleneck).
        # base_model (exact interpolation) is what checkpoints/eval use;
        # the occ refresh below also probes with base_model.
        import dataclasses as _dc

        model = _dc.replace(model, grad_mode="sample-fwd")
    # Per-image extras (pose refinement AND appearance codes) can stay
    # on the Pallas render path: the fused kernel's vjp emits dL/dx
    # from the backward kernel when asked (kernels/mlp.py
    # _input_grad_tile — for appearance models the same output carries
    # the per-sample code gradients on rows 8..15; under mip,
    # _input_grad_tile_mip emits d/d(mean, dir, VARIANCE) through the
    # IPE damp chain and the coupled contraction Jacobian, so
    # anti-aliased pose refinement stays fused too), XLA autodiff
    # chains them through ray generation / the code-table gather, and
    # BARF annealing runs in-kernel via traced window-weight inputs
    # (anneal_row_weights). Only app_dim > 8 (no stream rows left)
    # still needs the XLA render path.
    from nerf_simple_tpu.kernels.mlp import supported as _kernel_supported

    pallas_aux = (
        _aux_on(cfg)
        and cfg.backend == "pallas"
        and isinstance(model, NerfMLP)
        and _kernel_supported(model)  # checks H alignment + app_dim <= 8
    )
    settings = RenderSettings(
        N=cfg.Nf,
        N_coarse=cfg.Nc if cfg.hierarchical else 0,
        N_prop=cfg.Np if cfg.proposal else 0,
        mip=cfg.mip,
        mip_levels=cfg.mip_levels,
        mip_shape=mip_shape,
        resample_blur=cfg.resample_blur,
        opaque_background=cfg.opaque_background,
        base_radius=base_radius if cfg.mip else 0.0,
        sampling_space=cfg.sampling_space,
        tn=cfg.tn,
        tf=cfg.tf,
        compute_dtype=cfg.render_dtype,
        # per-image extras need d(loss)/d(rays) and d(loss)/d(codes):
        # apart from the pallas_aux cases above (where the backward
        # kernel emits them), the LOSS path must render through XLA
        # autodiff (the fused kernel's default vjp is weights-only).
        # Eval settings are unaffected (no pose/code grads).
        backend=cfg.backend if (not _aux_on(cfg) or pallas_aux) else "xla",
        input_grads=pallas_aux,
        sigma_noise=cfg.sigma_noise,
    )
    prop_arch = None
    if cfg.proposal:
        from nerf_simple_tpu.models.proposal import proposal_from_train_config

        prop_arch = proposal_from_train_config(cfg)

    def _maybe_occ_ts(key, rays_b, occ, N):
        """Occupancy-informed (B, N) samples, or None -> the callee runs
        the reference stratified sampler (bit-identical key streams to
        the occupancy-off build)."""
        if not cfg.occupancy:
            return None
        from nerf_simple_tpu.ops.occupancy import occupancy_ts

        return occupancy_ts(
            jax.random.fold_in(key, 17),
            rays_b,
            occ,
            N,
            cfg.tn,
            cfg.tf,
            cfg.occ_aabb,
            Nb=cfg.occ_Nb,
            floor=cfg.occ_floor,
        )

    def _s_norm(ts):
        """Normalize sample distances to the SAMPLING parametrization
        s in [0,1] before the distortion regularizer — mip-NeRF 360
        defines eqn. 15 in s-space for exactly the unbounded case: in
        raw t a far disparity bin spans tens of units and its width
        alone dominates the self term, suppressing legitimate
        background. For linear spacing this is an affine rescale (the
        regularizer's relative geometry is unchanged; weights calibrate
        per (tf - tn))."""
        if cfg.sampling_space == "disparity":
            return (1.0 / cfg.tn - 1.0 / jnp.maximum(ts, 1e-10)) / (
                1.0 / cfg.tn - 1.0 / cfg.tf
            )
        return (ts - cfg.tn) / (cfg.tf - cfg.tn)

    def _prop_anneal(step):
        """Traced placement-anneal exponent (TrainConfig.prop_anneal_frac;
        ops/sampling.py::anneal_weights): ramps 0 -> 1 over the first
        prop_anneal_frac * num_iters steps so sample placement cannot
        lock onto the early random field. None = off (exact current
        behavior, no extra ops in the compiled step)."""
        if cfg.prop_anneal_frac <= 0 or step is None:
            return None
        return jnp.clip(
            step.astype(jnp.float32)
            / (cfg.prop_anneal_frac * cfg.num_iters),
            0.0,
            1.0,
        )

    def _depth_term(out, gt_d):
        """Masked L2 on expected termination depth (DS-NeRF eqn. 3
        analogue). gt_d <= 0 / non-finite rows (holes in real depth
        data) contribute nothing; the mean is over valid rays only."""
        valid = jnp.isfinite(gt_d) & (gt_d > 0)
        sq = jnp.where(valid, (out.depth - gt_d) ** 2, 0.0)
        return jnp.sum(sq) / jnp.maximum(jnp.sum(valid), 1)

    def loss_fn(params, rays_b, pix_b, im_b, key, occ, step=None):
        # per-image extras: unwrap the {"field", "cams"/"app"} params,
        # refine the sampled rays by their source image's pose delta
        # (gradients flow into the delta tables through ray generation),
        # and gather per-ray appearance codes
        app_b = None
        if aux_on:
            aux, params = params, params["field"]
            if cfg.pose_opt:
                from nerf_simple_tpu.ops.rays import apply_cam_deltas

                rays_b = apply_cam_deltas(
                    rays_b, aux["cams"]["dr"][im_b], aux["cams"]["dt"][im_b]
                )
            if cfg.appearance_dim > 0:
                app_b = aux["app"][im_b]
        # depth supervision rides as a 4th pixel channel (loop.py packs
        # it) so every signature downstream of the sampler is unchanged
        gt_d = None
        if cfg.depth_loss_weight > 0:
            pix_b, gt_d = pix_b[:, :3], pix_b[:, 3]
        # BARF coarse-to-fine anneal progress (cfg.pe_anneal_until):
        # traced from the step counter, so the whole schedule is one
        # compiled program. None = standard encoder (static, free).
        enc_alpha = None
        if cfg.pe_anneal_until > 0 and step is not None:
            enc_alpha = jnp.clip(
                step.astype(jnp.float32) / cfg.pe_anneal_until, 0.0, 1.0
            )
        prop_anneal = _prop_anneal(step)
        if cfg.hierarchical:
            coarse, fine, (_, ts_all) = render_rays_hierarchical(
                params["coarse"], params["fine"], rays_b, key, settings, model,
                ts_coarse=_maybe_occ_ts(key, rays_b, occ, cfg.Nc),
                return_ts=True,
                app=app_b,
                enc_alpha=enc_alpha,
            )
            # standard NeRF total loss (paper eqn. 6): both heads to gt
            loss = jnp.mean((coarse.rgb - pix_b) ** 2) + jnp.mean(
                (fine.rgb - pix_b) ** 2
            )
            if gt_d is not None:
                loss = loss + cfg.depth_loss_weight * (
                    _depth_term(coarse, gt_d) + _depth_term(fine, gt_d)
                )
            if cfg.distortion_loss_weight > 0:
                # regularize the FINE field (what eval renders; the
                # coarse net only steers sampling)
                from nerf_simple_tpu.ops.volume import distortion_loss

                loss = loss + cfg.distortion_loss_weight * distortion_loss(
                    fine.weights, _s_norm(ts_all)
                )
            return loss
        if cfg.proposal:
            from nerf_simple_tpu.ops.volume import interlevel_loss
            from nerf_simple_tpu.render.renderer import render_rays_proposal

            out, (ts_p, w_prop, ts_f) = render_rays_proposal(
                params, rays_b, key, settings, model,
                prop_model=prop_arch,
                ts_prop=_maybe_occ_ts(key, rays_b, occ, cfg.Np),
                return_aux=True,
                app=app_b,
                enc_alpha=enc_alpha,
                prop_anneal=prop_anneal,
            )
            loss = jnp.mean((out.rgb - pix_b) ** 2)
            # distill the proposal from the main field's weights; the
            # stop_gradient keeps the main field from chasing its student
            if cfg.mip:
                # mip x proposal (the published mip-NeRF 360 model):
                # the aux is interval EDGES (ts_p/ts_f are (B, N+1)
                # edge arrays, w's are per-interval), so the losses
                # take their exact interval-histogram forms
                from nerf_simple_tpu.ops.volume import (
                    interlevel_loss_intervals,
                )

                mids_f = 0.5 * (ts_f[:, 1:] + ts_f[:, :-1])
                loss = loss + cfg.proposal_loss_weight * (
                    interlevel_loss_intervals(
                        jax.lax.stop_gradient(out.weights),
                        mids_f, w_prop, ts_p,
                        opaque_tail=cfg.opaque_background,
                    )
                )
            else:
                loss = loss + cfg.proposal_loss_weight * interlevel_loss(
                    jax.lax.stop_gradient(out.weights), ts_f, w_prop, ts_p
                )
            if gt_d is not None:
                loss = loss + cfg.depth_loss_weight * _depth_term(out, gt_d)
            if cfg.distortion_loss_weight > 0:
                if cfg.mip:
                    from nerf_simple_tpu.ops.volume import (
                        distortion_loss_intervals,
                    )

                    loss = loss + (
                        cfg.distortion_loss_weight
                        * distortion_loss_intervals(
                            out.weights, _s_norm(ts_f),
                            opaque_tail=cfg.opaque_background,
                        )
                    )
                else:
                    from nerf_simple_tpu.ops.volume import distortion_loss

                    loss = loss + cfg.distortion_loss_weight * (
                        distortion_loss(out.weights, _s_norm(ts_f))
                    )
            return loss
        if cfg.mip and cfg.mip_levels == 2:
            # full mip-NeRF: one shared MLP, coarse + resampled-fine
            # cone-cast renders, weighted two-level loss (paper sec. 3.3)
            from nerf_simple_tpu.render.renderer import _render_mip

            nk = jax.random.fold_in(key, 1) if cfg.sigma_noise > 0 else None
            out_c, out_f = _render_mip(
                params, rays_b, key, settings, model, nk, return_coarse=True
            )
            lw = rays_b[:, 7:8] if rays_b.shape[-1] >= 8 else 1.0
            loss = cfg.mip_coarse_weight * jnp.mean(
                lw * (out_c.rgb - pix_b) ** 2
            ) + jnp.mean(lw * (out_f.rgb - pix_b) ** 2)
            if gt_d is not None:
                loss = loss + cfg.depth_loss_weight * _depth_term(out_f, gt_d)
            return loss
        ts = _maybe_occ_ts(key, rays_b, occ, cfg.Nf)
        edges = None
        if cfg.distortion_loss_weight > 0:
            # materialize the same stratified draw render_rays makes
            # internally (identical key -> identical stream), so the
            # regularizer sees what the composite consumed: N point ts
            # on the point path, N+1 interval edges under mip
            from nerf_simple_tpu.ops.sampling import stratified_ts_spaced

            if cfg.mip:
                edges = stratified_ts_spaced(
                    key, rays_b.shape[0], cfg.Nf + 1, cfg.tn, cfg.tf,
                    rays_b.dtype, cfg.sampling_space,
                )
            elif ts is None:
                ts = stratified_ts_spaced(
                    key, rays_b.shape[0], cfg.Nf, cfg.tn, cfg.tf,
                    rays_b.dtype, cfg.sampling_space,
                )
        out = render_rays(
            params, rays_b, key, settings, model, ts=ts, app=app_b,
            enc_alpha=enc_alpha,
        )
        if cfg.mip and rays_b.shape[-1] >= 8:
            # multiscale: footprint-area loss weight rides ray column 7
            loss = jnp.mean(rays_b[:, 7:8] * (out.rgb - pix_b) ** 2)
        else:
            loss = jnp.mean((out.rgb - pix_b) ** 2)  # raw-color MSE, train.py:52
        if gt_d is not None:
            loss = loss + cfg.depth_loss_weight * _depth_term(out, gt_d)
        if cfg.distortion_loss_weight > 0:
            if cfg.mip:
                from nerf_simple_tpu.ops.volume import (
                    distortion_loss_intervals,
                )

                loss = loss + cfg.distortion_loss_weight * (
                    distortion_loss_intervals(
                        out.weights, _s_norm(edges),
                        opaque_tail=cfg.opaque_background,
                    )
                )
            else:
                from nerf_simple_tpu.ops.volume import distortion_loss

                loss = loss + cfg.distortion_loss_weight * distortion_loss(
                    out.weights, _s_norm(ts)
                )
        return loss

    def _pick_tile(N: int, batch_rows: int) -> int | None:
        """Largest power-of-two rays-per-tile R with N*R <= 1024 and
        R | batch_rows; None if no valid tiling exists."""
        R = 1
        while R * 2 * N <= 1024 and batch_rows % (R * 2) == 0:
            R *= 2
        if batch_rows % R:
            return None
        return R * N

    def _build_x16(rays_b, ts, pix_b):
        B, N = ts.shape
        oT = rays_b[:, :3].T
        dT = rays_b[:, 3:].T
        unitT = dT / jnp.linalg.norm(dT, axis=0, keepdims=True)
        locs_T = oT[:, :, None] + dT[:, :, None] * ts[None]
        return jnp.concatenate(
            [
                locs_T,
                jnp.broadcast_to(unitT[:, :, None], (3, B, N)),
                ts[None],
                jnp.zeros((1, B, N), rays_b.dtype),
                jnp.broadcast_to(pix_b.T[:, :, None], (3, B, N)),
                jnp.zeros((5, B, N), rays_b.dtype),
            ],
            axis=0,
        ).reshape(16, B * N)

    def _build_x16_mip(rays_b, edges, pix_b):
        """Feature-major x16 for the mip fused kernel: frustum Gaussian
        means on rows 0..2, interval widths on row 6, diagonal variances
        on rows 11..13, per-ray loss weight on row 14
        (ops/sampling.py::frustum_moments math, built directly in the
        kernel's (16, B*N) layout — no (B, N, 3) intermediates to
        re-transpose). 8-column rays (mip_multiscale / LLFF) carry a
        per-ray radius in column 6 and the footprint loss weight in
        column 7; 6-column rays use the closure's scalar base_radius and
        weight 1. ``mip_shape`` picks cone vs NDC-cylinder moments."""
        from nerf_simple_tpu.ops.sampling import frustum_gaussians_T

        B = rays_b.shape[0]
        N = edges.shape[1] - 1
        if rays_b.shape[1] >= 8:
            radius = rays_b[:, 6][:, None]  # (B, 1) -> broadcast (B, N)
            lw = jnp.broadcast_to(rays_b[:, 7][:, None], (B, N))
        else:
            radius = base_radius
            lw = jnp.ones((B, N), rays_b.dtype)
        meanT, unitT, varT, _ = frustum_gaussians_T(
            rays_b, edges, radius, mip_shape
        )
        t0, t1 = edges[:, :-1], edges[:, 1:]  # (B, N)
        return jnp.concatenate(
            [
                meanT,
                jnp.broadcast_to(unitT[:, :, None], (3, B, N)),
                (t1 - t0)[None],
                # row 7: interval near edge — consumed only by the
                # kernel's interval-form distortion rail (the encoder's
                # spread matrices never read x columns 6..7)
                t0[None],
                jnp.broadcast_to(pix_b.T[:, :, None], (3, B, N)),
                varT,
                lw[None],
                jnp.zeros((1, B, N), rays_b.dtype),
            ],
            axis=0,
        ).reshape(16, B * N)

    def _make_core(batch_rows: int):
        """(loss, grads) for one sampled batch. Uses the single fused
        fwd+composite+MSE+bwd kernel when eligible (flagship arch, MSE
        loss, tile-divisible shapes) — it skips the backward pass's
        forward recompute, ~25% of training FLOPs. The hierarchical path
        runs TWO fused passes (coarse with a weights output feeding the
        importance sampler, fine on the sorted union), whose gradient sum
        exactly equals the generic coarse+fine loss gradient."""
        from nerf_simple_tpu.kernels.mlp import supported as _kernel_supported

        tile_f = _pick_tile(cfg.Nf, batch_rows)
        tile_c = _pick_tile(cfg.Nc, batch_rows) if cfg.hierarchical else 1
        tile_u = (
            _pick_tile(cfg.Nc + cfg.Nf, batch_rows) if cfg.hierarchical else 1
        )
        fused_ok = (
            cfg.backend == "pallas"
            and not aux_on
            and cfg.sigma_noise == 0.0
            and cfg.depth_loss_weight == 0.0
            # distortion runs IN-KERNEL in both its forms
            # (kernels/mlp.py::_composite_grad_block dist rail: point
            # form on sample ts, exact interval-histogram form under
            # mip); mip x proposal runs the fused mip core below with
            # proposal-placed interval edges — only the two-level
            # shared-MLP scheme keeps distortion off (config rejects
            # mip_levels=2 + distortion)
            and _kernel_supported(model)
            and None not in (tile_f, tile_c, tile_u)
        )
        # in-kernel distortion parameters (static: baked into the
        # compiled kernel)
        dist = (
            (
                float(cfg.distortion_loss_weight),
                float(cfg.tn),
                float(cfg.tf),
                cfg.sampling_space == "disparity",
            )
            if cfg.distortion_loss_weight > 0
            else None
        )
        if not fused_ok:
            # per-image extras (pose/appearance) intentionally run the
            # 2-kernel custom-vjp path (fused fwd + fused bwd with
            # input/code grads) instead of the single fused train
            # kernel — still Pallas, no warning.
            if cfg.backend == "pallas" and not pallas_aux:
                import warnings

                reason = (
                    "appearance_dim > 8 (no free rows in the "
                    "kernel's 16-row input stream)"
                    if aux_on and not _kernel_supported(model)
                    and getattr(model, "app_dim", 0) > 8
                    else "sigma_noise > 0"
                    if cfg.sigma_noise != 0.0
                    else "depth_loss_weight > 0 (the fused kernel's "
                    "in-VMEM backward is MSE-only)"
                    if cfg.depth_loss_weight > 0
                    else f"arch (Lp,Ld,H)={(model.Lp, model.Ld, model.H)} "
                    "(needs H % 16 == 0, H >= 16)"
                    if not _kernel_supported(model)
                    else f"batch rows {batch_rows} not tile-divisible for "
                    f"Nf={cfg.Nf}" + (f"/Nc={cfg.Nc}" if cfg.hierarchical else "")
                )
                warnings.warn(
                    f"backend='pallas' requested but the fused train kernel "
                    f"is ineligible ({reason}); falling back to the autodiff "
                    f"XLA path for this step",
                    stacklevel=2,
                )
            return lambda params, rays_b, pix_b, im_b, key, occ, step=None: (
                jax.value_and_grad(loss_fn)(
                    params, rays_b, pix_b, im_b, key, occ, step
                )
            )

        from nerf_simple_tpu.kernels.mlp import fused_train_step, pack_weights
        from nerf_simple_tpu.ops.sampling import (
            importance_ts,
            merge_sorted,
            stratified_ts_spaced,
        )

        def _pack(p):
            return pack_weights(p, model=model)

        if cfg.hierarchical:

            def core(params, rays_b, pix_b, im_b, key, occ, step=None):
                B = rays_b.shape[0]
                k_strat, k_imp = jax.random.split(key)
                ts_c = _maybe_occ_ts(key, rays_b, occ, cfg.Nc)
                if ts_c is None:
                    ts_c = stratified_ts_spaced(
                        k_strat, B, cfg.Nc, cfg.tn, cfg.tf, rays_b.dtype,
                        cfg.sampling_space,
                    )
                wts_c, vjp_c = jax.vjp(_pack, params["coarse"])
                loss_c, dwts_c, w_c = fused_train_step(
                    wts_c,
                    _build_x16(rays_b, ts_c, pix_b),
                    cfg.Nc,
                    tile_c,
                    cfg.render_dtype,
                    out_weights=True,
                    model=model,
                )
                ts_f = importance_ts(k_imp, ts_c, w_c, cfg.Nf)
                ts_all = merge_sorted(ts_c, ts_f)
                wts_f, vjp_f = jax.vjp(_pack, params["fine"])
                # distortion (if on) regularizes the FINE union only,
                # matching loss_fn (the coarse net just steers sampling)
                loss_f, dwts_f = fused_train_step(
                    wts_f,
                    _build_x16(rays_b, ts_all, pix_b),
                    cfg.Nc + cfg.Nf,
                    tile_u,
                    cfg.render_dtype,
                    model=model,
                    dist=dist,
                )
                return loss_c + loss_f, {
                    "coarse": vjp_c(dwts_c)[0],
                    "fine": vjp_f(dwts_f)[0],
                }

            return core

        if cfg.proposal and cfg.mip:
            from nerf_simple_tpu.models.proposal import (
                proposal_weights_intervals,
            )
            from nerf_simple_tpu.ops.sampling import (
                anneal_weights,
                resample_edges,
            )
            from nerf_simple_tpu.ops.volume import interlevel_loss_intervals

            def core(params, rays_b, pix_b, im_b, key, occ, step=None):
                # the published mip-NeRF 360 composition on the single
                # fused kernel: the proposal's interval histogram over
                # stratified probe EDGES places the fine interval edges,
                # the main field's IPE fwd+composite+MSE+bwd (plus the
                # interval distortion rail when cfg asks) runs in-kernel,
                # and the interval-form interlevel loss distills the
                # proposal from the kernel's (non-differentiable —
                # i.e. already stop-gradient) weights output. Key stream
                # matches renderer.py::render_rays_proposal's mip branch
                # exactly, so xla/pallas losses agree per step.
                B = rays_b.shape[0]
                k_strat, k_imp = jax.random.split(key)
                edges_p = stratified_ts_spaced(
                    k_strat, B, cfg.Np + 1, cfg.tn, cfg.tf, rays_b.dtype,
                    cfg.sampling_space,
                )
                w_prop, vjp_p = jax.vjp(
                    lambda pp: proposal_weights_intervals(
                        pp, rays_b, edges_p, prop_arch, cfg.render_dtype,
                        opaque_tail=cfg.opaque_background,
                    ),
                    params["prop"],
                )
                edges_f = resample_edges(
                    k_imp,
                    edges_p,
                    anneal_weights(
                        jax.lax.stop_gradient(w_prop), _prop_anneal(step)
                    ),
                    cfg.Nf,
                    blur=cfg.resample_blur,
                )
                wts_f, vjp_f = jax.vjp(_pack, params["fine"])
                loss_mse, dwts_f, w_f = fused_train_step(
                    wts_f,
                    _build_x16_mip(rays_b, edges_f, pix_b),
                    cfg.Nf,
                    tile_f,
                    cfg.render_dtype,
                    out_weights=True,
                    model=model,
                    mip=True,
                    dist=dist,
                    opaque_tail=cfg.opaque_background,
                )
                mids_f = 0.5 * (edges_f[:, 1:] + edges_f[:, :-1])
                il, d_wprop = jax.value_and_grad(
                    lambda wp: interlevel_loss_intervals(
                        w_f, mids_f, wp, edges_p,
                        opaque_tail=cfg.opaque_background,
                    )
                )(w_prop)
                return loss_mse + cfg.proposal_loss_weight * il, {
                    "prop": vjp_p(cfg.proposal_loss_weight * d_wprop)[0],
                    "fine": vjp_f(dwts_f)[0],
                }

            return core

        if cfg.proposal:
            from nerf_simple_tpu.models.proposal import proposal_weights
            from nerf_simple_tpu.ops.sampling import anneal_weights
            from nerf_simple_tpu.ops.volume import interlevel_loss

            def core(params, rays_b, pix_b, im_b, key, occ, step=None):
                # proposal probes + importance placement run in XLA (tiny
                # MXU matmuls, <3% of step time); only the main field's
                # fwd+bwd goes through the fused kernel. The kernel's
                # weights output is non-differentiable, which IS the
                # intended stop_gradient on the distillation target.
                B = rays_b.shape[0]
                k_strat, k_imp = jax.random.split(key)
                ts_p = _maybe_occ_ts(key, rays_b, occ, cfg.Np)
                if ts_p is None:
                    ts_p = stratified_ts_spaced(
                        k_strat, B, cfg.Np, cfg.tn, cfg.tf, rays_b.dtype,
                        cfg.sampling_space,
                    )
                w_prop, vjp_p = jax.vjp(
                    lambda pp: proposal_weights(
                        pp, rays_b, ts_p, prop_arch, cfg.render_dtype
                    ),
                    params["prop"],
                )
                ts_f = importance_ts(
                    k_imp,
                    ts_p,
                    anneal_weights(
                        jax.lax.stop_gradient(w_prop), _prop_anneal(step)
                    ),
                    cfg.Nf,
                )
                wts_f, vjp_f = jax.vjp(_pack, params["fine"])
                loss_mse, dwts_f, w_f = fused_train_step(
                    wts_f,
                    _build_x16(rays_b, ts_f, pix_b),
                    cfg.Nf,
                    tile_f,
                    cfg.render_dtype,
                    out_weights=True,
                    model=model,
                    dist=dist,
                )
                il, d_wprop = jax.value_and_grad(
                    lambda wp: interlevel_loss(w_f, ts_f, wp, ts_p)
                )(w_prop)
                return loss_mse + cfg.proposal_loss_weight * il, {
                    "prop": vjp_p(cfg.proposal_loss_weight * d_wprop)[0],
                    "fine": vjp_f(dwts_f)[0],
                }

            return core

        if cfg.mip:
            from nerf_simple_tpu.ops.sampling import resample_edges

            def core(params, rays_b, pix_b, im_b, key, occ, step=None):
                # same key -> identical edge stream as the XLA
                # _render_mip path (renderer.py), so xla/pallas losses
                # agree; mip excludes hierarchical/occupancy by config
                # validation (proposal composes via the core above)
                edges = stratified_ts_spaced(
                    key, rays_b.shape[0], cfg.Nf + 1, cfg.tn, cfg.tf,
                    rays_b.dtype, cfg.sampling_space,
                )
                wts, vjp_fn = jax.vjp(_pack, params)
                if cfg.mip_levels == 2:
                    # the SAME packed weights serve both levels (the
                    # paper's single shared MLP); the kernel's weights
                    # output is non-differentiable, which IS the
                    # stop_gradient on the resampling histogram
                    loss_c, dw_c, w_c = fused_train_step(
                        wts, _build_x16_mip(rays_b, edges, pix_b), cfg.Nf,
                        tile_f, cfg.render_dtype, out_weights=True,
                        model=model, mip=True,
                        opaque_tail=cfg.opaque_background,
                    )
                    edges_f = resample_edges(
                        jax.random.fold_in(key, 2), edges, w_c, cfg.Nf,
                        blur=cfg.resample_blur,
                    )
                    loss_f, dw_f = fused_train_step(
                        wts, _build_x16_mip(rays_b, edges_f, pix_b),
                        cfg.Nf, tile_f, cfg.render_dtype, model=model,
                        mip=True,
                        opaque_tail=cfg.opaque_background,
                    )
                    cw = cfg.mip_coarse_weight
                    dw = jax.tree.map(lambda a, b: cw * a + b, dw_c, dw_f)
                    return cw * loss_c + loss_f, vjp_fn(dw)[0]
                loss, dwts = fused_train_step(
                    wts, _build_x16_mip(rays_b, edges, pix_b), cfg.Nf,
                    tile_f, cfg.render_dtype, model=model, mip=True,
                    dist=dist,
                    opaque_tail=cfg.opaque_background,
                )
                return loss, vjp_fn(dwts)[0]

            return core

        def core(params, rays_b, pix_b, im_b, key, occ, step=None):
            ts = _maybe_occ_ts(key, rays_b, occ, cfg.Nf)
            if ts is None:
                ts = stratified_ts_spaced(
                    key, rays_b.shape[0], cfg.Nf, cfg.tn, cfg.tf,
                    rays_b.dtype, cfg.sampling_space,
                )
            wts, vjp_fn = jax.vjp(_pack, params)
            loss, dwts = fused_train_step(
                wts, _build_x16(rays_b, ts, pix_b), cfg.Nf, tile_f,
                cfg.render_dtype, model=model, dist=dist,
            )
            return loss, vjp_fn(dwts)[0]

        return core

    def _loss_and_grads_single(params, occ, rays, pixels, key, step=None):
        k_sel, k_render = jax.random.split(key)
        idx = sample_idx(k_sel, cfg.batch_size, rays.shape[0])
        rays_b = rays[idx]
        pix_b = pixels[idx]
        im_b = idx // rays_per_image if aux_on else None
        return _make_core(cfg.batch_size)(
            params, rays_b, pix_b, im_b, k_render, occ, step
        )

    if mesh is not None:
        # SPMD data parallelism via shard_map: each chip samples its own
        # B/n_shards rays (per-shard fold_in key stream), computes the
        # local loss/grad, and the psum rides ICI. Explicit shard_map
        # (rather than a sharding constraint + auto-partitioning) because
        # the fused Pallas kernel is a custom call XLA cannot partition.
        # Semantics: the global batch is the union of per-shard draws —
        # distributionally identical to the single-chip sampler.
        from jax import shard_map

        n_data = mesh.shape["data"]
        if cfg.batch_size % n_data:
            raise ValueError(
                f"batch_size={cfg.batch_size} must be divisible by the "
                f"data-mesh size {n_data} (each chip draws an equal ray "
                f"sub-batch); pick batch_size="
                f"{-(-cfg.batch_size // n_data) * n_data}"
            )
        shard_B = cfg.batch_size // n_data

        shard_core = _make_core(shard_B)

        def _shard_fn(params, occ, rays, pixels, key, step):
            shard = jax.lax.axis_index("data")
            k_sel, k_render = jax.random.split(jax.random.fold_in(key, shard))
            # under shard_dataset, ``rays`` here is this chip's local block
            # (P("data") in_spec) and indices are drawn against it — no
            # cross-chip gather ever happens (train_im_idxs + shard_dataset
            # is rejected at config time)
            idx = sample_idx(k_sel, shard_B, rays.shape[0])
            im_b = idx // rays_per_image if aux_on else None
            loss, grads = shard_core(
                params, rays[idx], pixels[idx], im_b, k_render, occ, step
            )
            # equal shard sizes -> pmean of shard means == global mean
            return jax.lax.pmean((loss, grads), "data")

        data_spec = P("data") if cfg.shard_dataset else P()
        _loss_and_grads = shard_map(
            _shard_fn,
            mesh=mesh,
            in_specs=(P(), P(), data_spec, data_spec, P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
    else:
        _loss_and_grads = _loss_and_grads_single

    def _refresh_occ(params, occ, key):
        """EMA occupancy refresh: one dense density evaluation of the
        current field at jittered grid-cell centers (ops/occupancy.py).
        Runs replicated (outside the shard_map, like the optimizer)."""
        from nerf_simple_tpu.ops.occupancy import density_fn, update_occ_grid

        if aux_on:
            params = params["field"]
        density_params = (
            params["fine"] if cfg.hierarchical or cfg.proposal else params
        )  # the fine field is what eval renders
        return update_occ_grid(
            occ,
            density_fn(density_params, base_model, cfg.render_dtype),
            key,
            cfg.occ_aabb,
            decay=cfg.occ_decay,
        )

    def one_iter(state: TrainState, rays, pixels, key):
        occ = state.occ
        if cfg.occupancy:
            k_occ, key = jax.random.split(key)
            occ = jax.lax.cond(
                state.step % cfg.occ_update_every == 0,
                lambda o: _refresh_occ(state.params, o, k_occ),
                lambda o: o,
                occ,
            )
        loss, grads = _loss_and_grads(
            state.params, occ, rays, pixels, key, state.step
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1, occ), loss

    def multi_step(state: TrainState, rays, pixels, key):
        def body(state, i):
            k = jax.random.fold_in(key, i)
            return one_iter(state, rays, pixels, k)

        # fold_in on the global step keeps sampling deterministic across
        # restarts regardless of steps_per_call batching
        return jax.lax.scan(
            body, state, state.step + jnp.arange(cfg.steps_per_call)
        )

    if cfg.debug_nan:
        # checkify NaN/Inf/OOB guards (utils/guards.py): any non-finite
        # value inside the step raises host-side with a location. No
        # donation — checkify re-traces and the donated state would dangle.
        from nerf_simple_tpu.utils.guards import checked

        return checked(jax.jit(multi_step))
    return jax.jit(multi_step, donate_argnums=(0,) if donate else ())
