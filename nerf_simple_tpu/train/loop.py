"""The training driver: config -> data -> scanned train steps -> logs/ckpts.

Equivalent of reference ``train()`` (train.py:28-91) with the same
observable behavior — loss/lr scalars every ``ckpt_loss`` iters, train+val
image renders with MSE/PSNR every ``ckpt_images`` iters, model saves every
``ckpt_model`` iters and at the end — but TPU-shaped:

- the hot loop is ``steps_per_call`` iterations fused in one jitted scan
  (logging cadence is exact: per-iteration losses come back as an array);
- the dataset lives in HBM; steady-state training does no host transfers;
- checkpoints carry params+opt_state+step and support exact resume
  (the reference's TODO at train.py:44);
- a rays/sec throughput meter runs alongside (absent in the reference).
"""

from __future__ import annotations

import math
import os
from typing import Any

import jax
import numpy as np

from nerf_simple_tpu.config import TrainConfig, train_config_from_dict
from nerf_simple_tpu.data.blender import load_blender
from nerf_simple_tpu.data.dataset import RayDataset
from nerf_simple_tpu.render.renderer import RenderSettings
from nerf_simple_tpu.train import checkpoint as ckpt
from nerf_simple_tpu.train.metrics import img_mse, img_psnr
from nerf_simple_tpu.train.step import (
    TrainState,
    build_train_step,
    make_train_state,
)
from nerf_simple_tpu.utils.profiling import SteadyStateMeter, chunk_schedule
from nerf_simple_tpu.utils.tb import Logger, run_log_dir


def _load_dataset(cfg: TrainConfig):
    if cfg.dataset == "llff":
        from nerf_simple_tpu.data.llff import load_llff

        return load_llff(cfg.datapath, factor=cfg.llff_factor, ndc=cfg.ndc)
    if cfg.dataset == "tiny_nerf":
        from nerf_simple_tpu.data.tiny_nerf import load_tiny_nerf

        return load_tiny_nerf(cfg.datapath)
    return load_blender(
        cfg.datapath, cfg.half_res, cfg.num_train_imgs,
        white_bkgd=cfg.white_bkgd,
    )


def train(params_or_cfg: dict[str, Any] | TrainConfig) -> TrainState:
    """Run training. Accepts a reference-schema YAML dict or a TrainConfig.

    Returns the final TrainState.
    """
    cfg = (
        params_or_cfg
        if isinstance(params_or_cfg, TrainConfig)
        else train_config_from_dict(params_or_cfg)
    )
    if cfg.distributed:
        # multi-host: join the global mesh before any array work
        from nerf_simple_tpu.parallel.distributed import (
            maybe_initialize,
            process_info,
        )

        if maybe_initialize():
            pi, pc = process_info()
            print(f"jax.distributed initialized: process {pi}/{pc}, "
                  f"{len(jax.devices())} global devices")
    from nerf_simple_tpu.models import model_from_train_config

    model = model_from_train_config(cfg)
    exp_dir = os.path.join(cfg.savepath, cfg.exp_name)
    os.makedirs(exp_dir, exist_ok=True)
    # sidecar so eval can rebuild the exact model (required for hashgrid
    # statics; redundant-but-consistent for NerfMLP)
    ckpt.save_model_meta(exp_dir, model)
    logger = Logger(run_log_dir(cfg.log_dir))

    mesh = None
    if cfg.num_data_shards == -1 or cfg.num_data_shards > 1:
        from nerf_simple_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(cfg.num_data_shards)

    data = _load_dataset(cfg)
    # NDC: t in [0,1] over the warped frustum; non-NDC LLFF: the scene's
    # own poses_bounds depth range (shared helper with the eval driver)
    from nerf_simple_tpu.data.dataset import apply_dataset_bounds

    cfg = apply_dataset_bounds(cfg, data)
    rd = RayDataset.from_blender(data)
    rays = rd.rays["train"]
    pixels = rd.pixels["train"]
    if cfg.mip_multiscale:
        # pyramid union with per-ray cone radii + area loss weights
        # (rays columns 6..7); eval/checkpoint surfaces are untouched —
        # the pyramid exists only in the train sampler's ray pool
        from nerf_simple_tpu.data.dataset import multiscale_train_arrays

        rays, pixels = multiscale_train_arrays(
            data, 2.0 / math.sqrt(12.0) / rd.f
        )
    elif cfg.mip and cfg.dataset == "llff":
        # LLFF mip: per-ray radii from neighbor-pixel spacing (NDC rays
        # carry pixel offsets in their origins and cast cylinders)
        from nerf_simple_tpu.ops.rays import append_mip_ray_columns

        rays = append_mip_ray_columns(rays, rd.H, rd.W, use_origins=cfg.ndc)
    if cfg.depth_loss_weight > 0:
        # depth supervision: metric GT depth rides as a 4th pixel channel
        # so the sampler/step signatures are unchanged (step.py splits it)
        md = getattr(data.splits.get("train"), "metric_depth", None)
        if md is None:
            raise ValueError(
                "depth_loss_weight > 0 but the train split has no metric "
                f"depth sidecars ({cfg.datapath}/depth/train/r_<i>.npy — "
                "data/synthetic.py write_blender_scene(write_depth=True) "
                "emits them)"
            )
        import jax.numpy as jnp

        pixels = jnp.concatenate(
            [pixels, jnp.asarray(md.reshape(-1, 1))], axis=1
        )
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        if cfg.shard_dataset:
            # each chip keeps 1/n of the ray dataset (HBM scaling); in
            # multi-host runs every process passes only ITS contiguous
            # row range and the global array is assembled across hosts
            from nerf_simple_tpu.parallel.distributed import (
                global_batch_array,
                process_info,
            )

            n = mesh.shape["data"] * mesh.shape["model"]
            rows = rays.shape[0] - rays.shape[0] % n  # truncate to even shards
            pi, pc = process_info()
            lo, hi = pi * rows // pc, (pi + 1) * rows // pc
            rays = global_batch_array(mesh, np.asarray(rays[lo:hi]))
            pixels = global_batch_array(mesh, np.asarray(pixels[lo:hi]))
        else:
            rep = NamedSharding(mesh, P())
            rays = jax.device_put(rays, rep)
            pixels = jax.device_put(pixels, rep)

    key = jax.random.PRNGKey(cfg.seed)
    k_init, k_train, k_eval = jax.random.split(key, 3)
    # per-image extras (pose deltas / appearance codes) have one table
    # row per TRAIN image
    aux_on = cfg.pose_opt or cfg.appearance_dim > 0
    n_train_images = rd.split_size("train") // (rd.H * rd.W)

    # two-phase pose refinement (cfg.pose_freeze_at): phase A trains the
    # {"field","cams"} wrapper on the autodiff path, then at the first
    # chunk boundary >= pose_freeze_at the deltas are baked into the ray
    # dataset and the run continues as the plain config (fused-eligible).
    # ``frozen``/``cam_tbl`` are runtime flags shared with the eval
    # renderer; the deltas persist as <exp_dir>/cam_deltas.npz.
    freeze_eff = 0
    cfg_frozen = cfg
    if cfg.pose_opt and cfg.pose_freeze_at:
        import dataclasses as _dcf

        freeze_eff = min(
            -(-cfg.pose_freeze_at // cfg.steps_per_call)
            * cfg.steps_per_call,
            cfg.num_iters,
        )
        cfg_frozen = _dcf.replace(
            cfg, pose_opt=False, pose_freeze_at=0, pe_anneal_until=0
        )
    frozen = False
    cam_tbl: tuple | None = None  # host (dr, dt) after freeze

    state = make_train_state(
        k_init, cfg, model, n_images=n_train_images if aux_on else None
    )
    if cfg.resume:
        latest = ckpt.latest_checkpoint(exp_dir)
        if latest is not None:
            saved_step = int(os.path.basename(str(latest)).rsplit("_", 1)[-1])
            # strictly past the boundary: a checkpoint AT freeze_eff is
            # always wrapper-shaped (phase A's last chunk saved it;
            # do_freeze itself never saves) — re-freezing from it below
            if freeze_eff and saved_step > freeze_eff:
                # post-freeze checkpoints are plain-shaped: restore into
                # the frozen template and re-bake the persisted deltas
                sidecar = os.path.join(exp_dir, "cam_deltas.npz")
                if not os.path.exists(sidecar):
                    raise FileNotFoundError(
                        f"resuming past pose_freeze_at ({saved_step} > "
                        f"{freeze_eff}) but {sidecar} is missing: cannot "
                        "re-apply the baked pose refinement"
                    )
                import jax.numpy as jnp

                from nerf_simple_tpu.ops.rays import bake_cam_deltas

                d = np.load(sidecar)
                cam_tbl = (d["dr"], d["dt"])
                # NOT donated: rd.rays["train"] aliases this buffer and
                # the preview renderer slices the UN-refined copy from it
                # (deltas are re-applied per image there) — donating
                # frees it under the renderer (TPU INVALID_ARGUMENT).
                # Cost: a transient 2x ray-dataset footprint at the bake.
                rays = jax.jit(bake_cam_deltas, static_argnums=3)(
                    rays, jnp.asarray(d["dr"]), jnp.asarray(d["dt"]),
                    rd.H * rd.W,
                )
                state = make_train_state(k_init, cfg_frozen, model)
                frozen = True
            state = ckpt.restore_checkpoint(latest, state)
            print(f"resumed from {latest} at step {int(state.step)}")

    # mip cone radius: pixel world-space half-width at unit distance
    # (2/sqrt(12) * the 1/f dir-grid spacing, mip-NeRF sec. 3.1)
    base_radius = 2.0 / math.sqrt(12.0) / rd.f if cfg.mip else 0.0

    _step_fns: dict = {}

    def get_step_fn(spc_n: int, use_frozen: bool):
        """Scanned train step for a chunk length / phase, built lazily
        (the freeze boundary and resume offsets can each need one
        non-default chunk length; every variant compiles once)."""
        k = (spc_n, use_frozen)
        if k not in _step_fns:
            import dataclasses as _dc

            c = cfg_frozen if use_frozen else cfg
            if spc_n != c.steps_per_call:
                c = _dc.replace(c, steps_per_call=spc_n)
            _step_fns[k] = build_train_step(
                c, model, mesh, rays_per_image=rd.H * rd.W,
                base_radius=base_radius,
            )
        return _step_fns[k]

    step_fn = get_step_fn(cfg.steps_per_call, frozen)
    prop_arch = None
    if cfg.proposal:
        from nerf_simple_tpu.models.proposal import proposal_from_train_config

        prop_arch = proposal_from_train_config(cfg)
    eval_settings = RenderSettings(
        N=cfg.Nf,
        N_coarse=cfg.Nc if cfg.hierarchical else 0,
        N_prop=cfg.Np if cfg.proposal else 0,
        mip=cfg.mip,
        mip_levels=cfg.mip_levels,
        mip_shape="cylinder" if (cfg.dataset == "llff" and cfg.ndc) else "cone",
        resample_blur=cfg.resample_blur,
        opaque_background=cfg.opaque_background,
        base_radius=base_radius,
        sampling_space=cfg.sampling_space,
        tn=cfg.tn,
        tf=cfg.tf,
        compute_dtype=cfg.render_dtype,
        backend=cfg.backend,
        occ_Nb=cfg.occ_Nb,
        occ_floor=cfg.occ_floor,
        occ_aabb=cfg.occ_aabb,
    )

    eval_rays = rd.rays
    if cfg.mip and cfg.dataset == "llff":
        # eval renders need the same per-ray radii as training
        from nerf_simple_tpu.ops.rays import append_mip_ray_columns

        eval_rays = {
            k: append_mip_ray_columns(v, rd.H, rd.W, cfg.ndc)
            for k, v in rd.rays.items()
        }

    def render_and_log(split: str, ii: int, i: int) -> None:
        n_split = rd.split_size(split) // (rd.H * rd.W)
        if ii >= n_split:
            # default val_idxs=(0, 1) vs a 1-image split: skip rather
            # than hand TensorBoard an empty image stack (ZeroDivision
            # inside its make_grid)
            print(
                f"skipping {split} render {ii}: split has {n_split} images"
            )
            return
        # state.params is the full coarse+fine dict when hierarchical —
        # the renderer runs the two-pass path on it. Occupancy runs pass
        # the live grid: an occupancy-reduced Nf budget rendered with
        # plain stratified samples would systematically understate the
        # model's quality in the logged curves.
        render_params = (
            state.params["field"] if (aux_on and not frozen) else state.params
        )
        app_vec = None
        if cfg.appearance_dim > 0:
            tbl = state.params["app"]
            # train renders use the image's OWN code; val/test views have
            # none — render the mean code (the NeRF-W canonical look)
            app_vec = tbl[ii] if split == "train" else tbl.mean(axis=0)
        n = rd.H * rd.W
        rays_img = jax.lax.dynamic_slice_in_dim(
            eval_rays[split], ii * n, n, axis=0
        )
        if cfg.pose_opt and split == "train":
            # train-split renders use the REFINED pose (what the model
            # was actually fit to); val poses are un-refined by design.
            # After the freeze the live delta tables are gone — the
            # host-side baked copy (cam_tbl) supplies the same values.
            import jax.numpy as jnp

            from nerf_simple_tpu.ops.rays import apply_cam_deltas

            if frozen:
                dr_i = jnp.asarray(cam_tbl[0][ii])
                dt_i = jnp.asarray(cam_tbl[1][ii])
            else:
                dr_i = state.params["cams"]["dr"][ii]
                dt_i = state.params["cams"]["dt"][ii]
            rays_img = apply_cam_deltas(
                rays_img,
                jnp.broadcast_to(dr_i, (n, 3)),
                jnp.broadcast_to(dt_i, (n, 3)),
            )
        from nerf_simple_tpu.render.renderer import render_rays_chunked

        # mid-anneal previews render with the encoder the field is
        # actually being trained with — at full frequency the untrained
        # high-octave weights (zero input so far) would corrupt the
        # logged images/PSNR into a phantom regression
        enc_alpha = None
        if cfg.pe_anneal_until > 0 and not frozen and (
            i + 1
        ) < cfg.pe_anneal_until:
            enc_alpha = (i + 1) / cfg.pe_anneal_until
        rgb, disp = render_rays_chunked(
            render_params,
            rays_img,
            jax.random.fold_in(k_eval, i),
            eval_settings,
            model,
            chunk=16384,  # reference's 16000 eval chunk, MXU-aligned
            occ=state.occ if cfg.occupancy else None,
            # chunks shard over the mesh data axis; in multi-HOST runs
            # render_rays_chunked assembles the sharded result on every
            # host via process_allgather, so the global mesh is safe here
            mesh=mesh,
            prop_model=prop_arch,
            app=app_vec,
            enc_alpha=enc_alpha,
        )
        rgb = np.asarray(rgb).reshape(1, rd.H, rd.W, 3)
        disp = np.asarray(disp).reshape(1, rd.H, rd.W, 1)
        gt = np.asarray(rd.pixels[split]).reshape(-1, rd.H, rd.W, 3)[
            ii : ii + 1
        ]
        tag = "train" if split == "train" else "Val"
        logger.images(f"{tag}/RGB_{ii}", rgb, i + 1)
        logger.images(f"{tag}/Depth_{ii}", disp / max(disp.max(), 1e-9), i + 1)
        logger.images(f"{tag}/GT_{ii}", gt, i + 1)
        logger.scalar(
            f"Loss/{tag}_Img_MSE_{ii}", float(img_mse(gt, rgb)), i + 1
        )
        logger.scalar(
            f"Loss/{tag}_Img_PSNR_{ii}", float(img_psnr(gt, rgb)), i + 1
        )
        if min(rd.H, rd.W) >= 11:  # SSIM needs one full 11x11 window
            from nerf_simple_tpu.train.metrics import img_ssim

            logger.scalar(
                f"Loss/{tag}_Img_SSIM_{ii}", float(img_ssim(gt, rgb)), i + 1
            )

    meter = SteadyStateMeter(cfg.batch_size)
    start = int(state.step)

    def do_freeze() -> None:
        """Cross the pose-freeze boundary: persist + bake the trained
        deltas, drop the params wrapper (Adam moments carry over), and
        flip the runtime flags so later chunks take the plain step."""
        nonlocal state, rays, frozen, cam_tbl
        import jax.numpy as jnp

        from nerf_simple_tpu.ops.rays import bake_cam_deltas
        from nerf_simple_tpu.train.step import freeze_pose_state

        dr = np.asarray(jax.device_get(state.params["cams"]["dr"]))
        dt = np.asarray(jax.device_get(state.params["cams"]["dt"]))
        np.savez(
            os.path.join(exp_dir, "cam_deltas.npz"),
            dr=dr, dt=dt, freeze_step=int(state.step),
        )
        # NOT donated: rd.rays["train"] aliases this buffer and the
        # preview renderer keeps slicing the un-refined copy from it
        # (deltas re-applied per image) — donating frees it under the
        # renderer. Cost: a transient 2x ray-dataset footprint here.
        rays = jax.jit(bake_cam_deltas, static_argnums=3)(
            rays, jnp.asarray(dr), jnp.asarray(dt), rd.H * rd.W
        )
        state = freeze_pose_state(state, cfg)
        cam_tbl = (dr, dt)
        frozen = True
        # the next chunk compiles the post-freeze step: restart the
        # steady-state meter so the reported rays/s is phase-B's
        meter.discard_warmup()
        print(
            f"pose freeze at step {int(state.step)}: deltas baked into "
            f"the ray dataset (|dr| max {np.abs(dr).max():.4f} rad, "
            f"|dt| max {np.abs(dt).max():.4f}); continuing on the plain "
            f"{cfg.backend} step"
        )

    if cfg.profile_dir and (
        freeze_eff
        and not frozen
        and start + 2 * cfg.steps_per_call > freeze_eff
    ):
        # the two profiling chunks run OUTSIDE the phase walk with the
        # pre-freeze step fn — crossing the boundary here would silently
        # train poses past the configured freeze step
        print(
            f"profile_dir set but the trace chunks would cross "
            f"pose_freeze_at ({freeze_eff}); skipping trace (profile a "
            "resumed post-freeze run instead)"
        )
    elif cfg.profile_dir and cfg.num_iters - start >= 2 * cfg.steps_per_call:
        # capture chunks 1-2 (post-compile) as a device trace; skipped when
        # fewer than two full chunks remain (a short run / late resume must
        # not overshoot num_iters)
        from nerf_simple_tpu.utils.profiling import trace_context

        state, losses = step_fn(state, rays, pixels, k_train)
        np.asarray(losses)
        with trace_context(cfg.profile_dir):
            state, losses = step_fn(state, rays, pixels, k_train)
            np.asarray(losses)
        start = int(state.step)
        meter.discard_warmup()  # exclude compile + traced chunks
    elif cfg.profile_dir:
        print(
            f"profile_dir set but only {cfg.num_iters - start} iters remain "
            f"(< 2*steps_per_call={2 * cfg.steps_per_call}); skipping trace"
        )
    def walk(w_start: int, w_end: int) -> None:
        nonlocal state
        for chunk_start, spc, boundary in chunk_schedule(
            w_start,
            w_end,
            cfg.steps_per_call,
            (cfg.ckpt_loss, cfg.ckpt_images, cfg.ckpt_model),
        ):
            state, losses = get_step_fn(spc, frozen)(
                state, rays, pixels, k_train
            )
            # Only synchronize with the device when this chunk crosses a
            # logging/checkpoint boundary — otherwise chunks stay
            # enqueued and the device never idles waiting on the host
            # (each sync costs a full tunnel round trip).
            if not boundary:
                continue
            losses = np.asarray(losses)  # device sync
            # first sync includes jit compile (and, cold, data load) —
            # the meter excludes it so reported rays/s is steady-state
            meter.sync(chunk_start + spc - start)

            for j, loss in enumerate(losses):
                i = chunk_start + j
                if i % cfg.ckpt_loss == 0:
                    lr0 = cfg.lr_init if cfg.honor_lr_init else 5e-4
                    decay = math.exp(
                        math.log(cfg.lr_final / cfg.lr_init) / cfg.num_iters
                    )
                    logger.scalar("Loss/train", float(loss), i + 1)
                    logger.scalar("Train/lr", lr0 * decay ** (i + 1), i + 1)
                    rate = (
                        f"{meter.iters_per_sec:.1f} it/s | "
                        f"{meter.rays_per_sec:,.0f} rays/s"
                        if meter.iters
                        else "warmup (compile)"
                    )
                    print(
                        f"loss: {float(loss):.6f} | iter: {i + 1} | {rate}"
                    )

            i_last = chunk_start + spc - 1
            if any(
                (chunk_start + j) % cfg.ckpt_images == 0
                for j in range(len(losses))
            ):
                for ii in cfg.val_idxs:
                    render_and_log("train", ii, i_last)
                    render_and_log("val", ii, i_last)
            if any(
                (chunk_start + j) % cfg.ckpt_model == 0
                for j in range(len(losses))
            ):
                p = ckpt.save_checkpoint(exp_dir, state)
                print(f"saved checkpoint {p}")

    if freeze_eff and not frozen:
        # phase A: refine poses up to the (chunk-aligned) freeze
        # boundary; resumes landing mid-phase get a one-off remainder
        # scan from get_step_fn
        walk(start, freeze_eff)  # freeze_eff is already <= num_iters
        do_freeze()
        walk(max(start, freeze_eff), cfg.num_iters)
    else:
        walk(start, cfg.num_iters)

    path = ckpt.save_checkpoint(exp_dir, state)
    ckpt.export_params_npz(
        os.path.join(exp_dir, f"params_{int(state.step)}.npz"),
        jax.device_get(state.params),
    )
    if cfg.model_family == "nerf" and cfg.appearance_dim == 0:
        # reference-compatible torch state_dict (loads into the reference
        # Nerf with strict=True); hierarchical exports the fine net, the
        # reference's single-network semantics. NerfMLP-only: the torch
        # reference has no hash-grid module to load other families into
        # (and appearance-widened color heads don't fit its Nerf either).
        try:
            host_params = jax.device_get(state.params)
            # per-image extras are not part of the reference format
            # (post-freeze states already dropped the wrapper)
            if aux_on and not frozen:
                host_params = host_params["field"]
            # hierarchical/proposal states export the fine net — the
            # reference's single-network semantics
            if "fine" in host_params and "trunk0" not in host_params:
                host_params = host_params["fine"]
            ckpt.export_params_pth(
                os.path.join(exp_dir, f"params_{int(state.step)}.pth"),
                host_params,
            )
        except ImportError:
            pass  # torch not installed: npz remains the portable export
    if meter.iters:
        print(
            f"final checkpoint {path} | {meter.iters_per_sec:.1f} it/s "
            f"| {meter.rays_per_sec:,.0f} rays/s (steady-state)"
        )
    else:
        print(
            f"final checkpoint {path} | steady-state throughput n/a "
            f"(run finished within the first compiled chunk)"
        )
    logger.close()
    return state
