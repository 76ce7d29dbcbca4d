"""Eval driver: still-image rendering and the spherical-dome orbit video.

Equivalent of reference ``test()`` (test.py:18-45): loads weights, then
either (a) renders an orbit animation at radius 4 / theta from config
(test.py:30-35) or (b) renders ``im_idxs`` from ``im_set``, saving a
gt-beside-prediction grid PNG and a disparity PNG per index
(test.py:39-45).

Weight loading accepts the framework's own artifacts: an Orbax checkpoint
directory (full TrainState) or a ``params_*.npz`` flat export — the
.pth-equivalent of the reference's ``loadpath`` interface.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from nerf_simple_tpu.config import TestConfig, test_config_from_dict
from nerf_simple_tpu.data.blender import load_blender
from nerf_simple_tpu.data.dataset import RayDataset
from nerf_simple_tpu.ops.rays import orbit_poses
from nerf_simple_tpu.render.renderer import (
    RenderSettings,
    render_image,
    render_orbit_video,
)
from nerf_simple_tpu.train.metrics import img_mse, img_psnr


def load_params(
    loadpath: str, keep_hierarchy: bool = False, return_aux: bool = False
):
    """Load eval params from an npz export or an Orbax checkpoint dir.
    For hierarchical checkpoints, returns the fine net unless
    ``keep_hierarchy`` (set when eval itself renders coarse+fine).

    Per-image-extras checkpoints ({"field", "cams"/"app"} wrapper —
    pose_opt / appearance training) are unwrapped to the field params;
    ``return_aux`` additionally returns the extras dict (empty when the
    checkpoint has none)."""
    if loadpath.endswith(".npz"):
        from nerf_simple_tpu.train.checkpoint import import_params_npz

        params = import_params_npz(loadpath)
    elif loadpath.endswith((".pth", ".pt")):
        # the reference's own torch.save(state_dict) format (test.py:28)
        from nerf_simple_tpu.train.checkpoint import import_params_pth

        params = import_params_pth(loadpath)
    else:
        import orbax.checkpoint as ocp

        from nerf_simple_tpu.train.checkpoint import latest_checkpoint

        path = loadpath
        if not os.path.basename(path).startswith("ckpt_"):
            found = latest_checkpoint(path)
            if found is None:
                raise FileNotFoundError(f"no ckpt_* under {path}")
            path = found
        with ocp.PyTreeCheckpointer() as ckptr:
            restored = ckptr.restore(os.path.abspath(path))
        params = restored["params"] if "params" in restored else restored
    aux = {}
    if isinstance(params, dict) and "field" in params:
        aux = {k: v for k, v in params.items() if k != "field"}
        params = params["field"]
    if "fine" in params and not keep_hierarchy:
        params = params["fine"]
    params = jax.tree.map(jnp.asarray, params)
    if return_aux:
        return params, jax.tree.map(jnp.asarray, aux)
    return params


def test(params_or_cfg: dict[str, Any] | TestConfig) -> None:
    """Run evaluation per the reference test_params interface."""
    cfg = (
        params_or_cfg
        if isinstance(params_or_cfg, TestConfig)
        else test_config_from_dict(params_or_cfg)
    )
    assert os.path.exists(cfg.loadpath), "model path doesn't exist"  # test.py:19
    out_dir = os.path.join(cfg.savepath, cfg.exp_name)
    os.makedirs(out_dir, exist_ok=True)

    params, aux = load_params(
        cfg.loadpath, keep_hierarchy=cfg.Nc > 0 or cfg.Np > 0,
        return_aux=True,
    )
    # appearance-embedding checkpoints: pick the conditioning code
    # (cfg.appearance_idx: -1 = mean code, >= 0 = that train image's)
    app_vec = None
    if "app" in aux:
        tbl = aux["app"]
        app_vec = (
            tbl.mean(axis=0)
            if cfg.appearance_idx < 0
            else tbl[cfg.appearance_idx]
        )
    # adapt to the checkpoint's model: exact rebuild from the model.json
    # sidecar when present, else infer the architecture from weight shapes
    from nerf_simple_tpu.models import infer_model
    from nerf_simple_tpu.train.checkpoint import load_model_meta

    model = load_model_meta(cfg.loadpath)
    if model is None:
        import warnings

        model = infer_model(params)
        if not getattr(model, "contract", False):
            warnings.warn(
                "no model.json sidecar next to the checkpoint; the "
                "architecture was inferred from weight shapes, which "
                "cannot recover shape-invariant fields (contract=False "
                "assumed — a contracted checkpoint would render wrong). "
                "Keep the sidecar with the weights.",
                stacklevel=2,
            )
    if cfg.Nc > 0 and not (
        isinstance(params, dict) and "coarse" in params
    ):
        raise ValueError(
            "Nc > 0 requests hierarchical eval but the checkpoint has no "
            "coarse/fine nets"
        )
    prop_model = None
    if cfg.Np > 0:
        if not (isinstance(params, dict) and "prop" in params):
            raise ValueError(
                "Np > 0 requests proposal-guided eval but the checkpoint "
                "has no proposal net (train with proposal: true)"
            )
        from nerf_simple_tpu.models.proposal import infer_proposal_arch

        # the ProposalMLP arch is fully determined by its weight shapes;
        # contract is NOT (shape-invariant) — copy it from the main
        # model's sidecar so both fields warp positions identically
        prop_model = dataclasses.replace(
            infer_proposal_arch(params["prop"]),
            contract=getattr(model, "contract", False),
        )
    settings = RenderSettings(
        N=cfg.N_samples,
        N_coarse=cfg.Nc,
        N_prop=cfg.Np,
        mip=cfg.mip,
        mip_levels=cfg.mip_levels,
        resample_blur=cfg.resample_blur,
        opaque_background=cfg.opaque_background,
        sampling_space=cfg.sampling_space,
        tn=cfg.tn,
        tf=cfg.tf,
        compute_dtype=cfg.render_dtype,
        backend=cfg.backend,
        occ_Nb=cfg.occ_Nb,
        occ_floor=cfg.occ_floor,
        occ_aabb=cfg.occ_aabb,
        occ_group=cfg.occ_group,
    )
    key = jax.random.PRNGKey(cfg.seed)

    mesh = None
    if cfg.num_data_shards not in (0, 1):
        # multi-host meshes are safe: render_rays_chunked feeds host-numpy
        # inputs and assembles the sharded result on every host with
        # process_allgather (tests/_distributed_worker.py proves parity)
        from nerf_simple_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(cfg.num_data_shards)

    occ = None
    if cfg.occupancy:
        # the grid is DERIVED state: rebuild it from the loaded density
        # field (a few dense forward passes) rather than checkpointing it
        from nerf_simple_tpu.ops.occupancy import rebuild_occ

        occ = rebuild_occ(
            params, model, cfg.render_dtype, cfg.occ_R, cfg.occ_aabb,
            jax.random.fold_in(key, 99),
        )

    if cfg.dataset == "llff":
        from nerf_simple_tpu.data.llff import load_llff

        data = load_llff(cfg.datapath, factor=cfg.llff_factor, ndc=cfg.ndc)
    elif cfg.dataset == "tiny_nerf":
        from nerf_simple_tpu.data.tiny_nerf import load_tiny_nerf

        data = load_tiny_nerf(cfg.datapath)
    else:
        data = load_blender(cfg.datapath, cfg.half_res)
    from nerf_simple_tpu.data.dataset import apply_dataset_bounds

    cfg = apply_dataset_bounds(cfg, data)
    rd = RayDataset.from_blender(data)
    is_llff_ndc = cfg.dataset == "llff" and bool(getattr(data, "ndc", False))
    settings = dataclasses.replace(
        settings,
        tn=cfg.tn,
        tf=cfg.tf,
        # mip cone radius from the eval frame's focal (2/sqrt(12)/f);
        # LLFF rays override it per ray (column 6) and NDC casts cylinders
        base_radius=(2.0 / 12.0**0.5 / rd.f) if cfg.mip else 0.0,
        mip_shape="cylinder" if is_llff_ndc else "cone",
    )
    eval_rays = rd.rays
    if cfg.mip and cfg.dataset == "llff":
        from nerf_simple_tpu.ops.rays import append_mip_ray_columns

        eval_rays = {
            k: append_mip_ray_columns(v, rd.H, rd.W, is_llff_ndc)
            for k, v in rd.rays.items()
        }

    # pose-refined checkpoints: train-split stills render from the
    # REFINED rig (what the field was actually fit to). Deltas come from
    # the checkpoint's live "cams" tables, or — after a pose freeze
    # (TrainConfig.pose_freeze_at) — from the cam_deltas.npz sidecar the
    # freeze wrote next to the checkpoints. Val/test poses are never
    # refined (only train images have deltas).
    cam_dr = cam_dt = None
    if "cams" in aux:
        cam_dr, cam_dt = aux["cams"]["dr"], aux["cams"]["dt"]
    elif cfg.im_set == "train" and not cfg.animation:
        # the sidecar lives in the EXP dir: step up from a params file
        # (<exp>/params_N.npz) OR a specific checkpoint dir
        # (<exp>/ckpt_N — also a directory, so isdir alone misroutes)
        _exp = cfg.loadpath
        if not os.path.isdir(_exp) or os.path.basename(
            os.path.normpath(_exp)
        ).startswith("ckpt_"):
            _exp = os.path.dirname(os.path.normpath(_exp))
        _side = os.path.join(_exp, "cam_deltas.npz")
        if os.path.exists(_side):
            _d = np.load(_side)
            cam_dr, cam_dt = jnp.asarray(_d["dr"]), jnp.asarray(_d["dt"])
    # only the train split has refined poses; baking is one jitted pass
    # over ALL train rays, so skip it when those renders won't happen
    if (
        cam_dr is not None
        and "train" in eval_rays
        and cfg.im_set == "train"
        and not cfg.animation
    ):
        from nerf_simple_tpu.ops.rays import bake_cam_deltas

        n_tr = eval_rays["train"].shape[0] // (rd.H * rd.W)
        if n_tr == cam_dr.shape[0]:
            eval_rays = dict(eval_rays)
            eval_rays["train"] = bake_cam_deltas(
                eval_rays["train"], cam_dr, cam_dt, rd.H * rd.W
            )
        else:
            print(
                f"pose deltas cover {cam_dr.shape[0]} train images but "
                f"the split has {n_tr}; skipping eval-time refinement"
            )

    if cfg.animation:
        if cfg.dataset == "llff":
            # forward-facing capture: a dome orbit leaves the pose cone the
            # scene was shot from — use the standard LLFF spiral path, and
            # warp the animation rays exactly like the training rays
            from nerf_simple_tpu.ops.rays import spiral_poses

            poses = spiral_poses(
                data.splits["train"].poses,
                near=float(getattr(data, "world_near", 1.0)),
                far=float(getattr(data, "world_far", 2.0)),
                n_poses=cfg.num_poses,
            )
            apply_ndc = bool(getattr(data, "ndc", False))
        else:
            poses = orbit_poses(cfg.orbit_radius, -cfg.theta, cfg.num_poses)
            apply_ndc = False
        out = render_orbit_video(
            params,
            poses,
            rd.H,
            rd.W,
            rd.f,
            out_dir,
            key,
            settings,
            model,
            chunk=cfg.batch_size,
            apply_ndc=apply_ndc,
            occ=occ,
            mesh=mesh,
            prop_model=prop_model,
            app=app_vec,
        )
        print(f"wrote {out}")
        return

    import cv2

    print(f"saving images to {out_dir}")
    for idx in cfg.im_idxs:
        rgb, disp = render_image(
            params,
            eval_rays[cfg.im_set],
            rd.H,
            rd.W,
            idx,
            jax.random.fold_in(key, idx),
            settings,
            model,
            chunk=cfg.batch_size,
            occ=occ,
            mesh=mesh,
            prop_model=prop_model,
            app=app_vec,
        )
        gt = np.asarray(rd.pixels[cfg.im_set]).reshape(-1, rd.H, rd.W, 3)[
            idx : idx + 1
        ]
        ssim_txt = ""
        if min(rd.H, rd.W) >= 11:  # SSIM needs one full 11x11 window
            from nerf_simple_tpu.train.metrics import img_ssim

            ssim_txt = f" ssim={float(img_ssim(gt, rgb)):.4f}"
        print(
            f"im {idx}: mse={float(img_mse(gt, rgb)):.5f} "
            f"psnr={float(img_psnr(gt, rgb)):.2f}" + ssim_txt
        )
        # gt-beside-prediction grid, like the reference's make_grid
        # (test.py:43-44)
        grid = np.concatenate([gt[0], rgb[0]], axis=1)
        cv2.imwrite(
            os.path.join(out_dir, f"rgb_{idx}.png"),
            cv2.cvtColor((grid * 255).astype(np.uint8), cv2.COLOR_RGB2BGR),
        )
        d = disp[0, ..., 0]
        # metric depth accuracy when the scene ships GT depth sidecars
        # (data/synthetic.py write_depth=True). acc == 1 identically
        # (the 1e10 tail delta saturates the last alpha), so predicted
        # depth is exactly 1/disparity — no extra render output needed.
        md = getattr(data.splits[cfg.im_set], "metric_depth", None)
        if md is not None:
            depth_pred = 1.0 / np.maximum(np.asarray(d), 1e-10)
            gt_d = md[idx]
            valid = np.isfinite(gt_d) & (gt_d > 0)
            rmse = float(
                np.sqrt(np.mean((depth_pred - gt_d)[valid] ** 2))
            )
            print(f"im {idx}: depth_rmse={rmse:.4f} (metric GT)")
        d = d / max(d.max(), 1e-9)
        cv2.imwrite(
            os.path.join(out_dir, f"depth_{idx}.png"),
            (d * 255).astype(np.uint8),
        )
        if cfg.normals:
            from nerf_simple_tpu.render.renderer import render_normals_chunked

            n = rd.H * rd.W
            frame_rays = jax.lax.dynamic_slice_in_dim(
                rd.rays[cfg.im_set], idx * n, n, axis=0
            )
            nrm = render_normals_chunked(
                params, frame_rays, jax.random.fold_in(key, 1000 + idx),
                settings, model, chunk=cfg.batch_size,
            ).reshape(rd.H, rd.W, 3)
            cv2.imwrite(
                os.path.join(out_dir, f"normal_{idx}.png"),
                cv2.cvtColor(
                    ((nrm * 0.5 + 0.5) * 255).astype(np.uint8),
                    cv2.COLOR_RGB2BGR,
                ),
            )
