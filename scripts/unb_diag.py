"""Diagnose WHY the anti-aliased (mip x proposal) 360 recipe fails to
generalize on the unbounded probe scene while the point-form recipe
reaches 40+ dB test PSNR (benchmarks/unbounded_bench.json).

Trains the two recipes side by side (same scene/seeds/iters), then for
each dumps:
  * pred / gt PNGs for one TEST and one TRAIN view (/tmp/unb_diag/)
  * per-ray weight diagnostics on 512 test + 512 train rays: total
    absorbed mass (acc), s-space weighted center and spread (the
    quantity distortion penalizes), and expected depth — floaters show
    up as near-camera depth + tight spread on TEST rays.

Usage: python scripts/unb_diag.py [ITERS] [point|mip|both]
Reuses $UNB_SCENE (default /tmp/unb_scene_v3/scene) like unbounded_bench.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from nerf_simple_tpu.config import TrainConfig
from nerf_simple_tpu.data.blender import load_blender
from nerf_simple_tpu.data.dataset import RayDataset
from nerf_simple_tpu.models import model_from_train_config
from nerf_simple_tpu.models.proposal import proposal_from_train_config
from nerf_simple_tpu.ops.rays import rays_for_poses
from nerf_simple_tpu.render.renderer import (
    RenderSettings,
    render_rays_chunked,
    render_rays,
    render_rays_proposal,
)
from nerf_simple_tpu.train.metrics import img_psnr
from nerf_simple_tpu.train.step import build_train_step, make_train_state

SCENE = os.environ.get("UNB_SCENE", "/tmp/unb_scene_v3/scene")
OUTDIR = "/tmp/unb_diag"


def s_norm(ts, tn, tf):
    return (1.0 / tn - 1.0 / np.maximum(ts, 1e-10)) / (1.0 / tn - 1.0 / tf)


def train_recipe(name, mip, data, rd, iters):
    cfg = TrainConfig(
        datapath=SCENE, Nf=128, batch_size=4096, num_iters=iters,
        steps_per_call=40, compute_dtype="bf16", backend="pallas",
        ckpt_loss=10**9, ckpt_images=10**9, ckpt_model=10**9,
        tn=1.0, tf=30.0, sampling_space="disparity", contract=True,
        proposal=True, Np=64, mip=mip, distortion_loss_weight=0.01,
    )
    model = model_from_train_config(cfg)
    base_radius = 2.0 / 12.0**0.5 / float(data.f)
    state = make_train_state(jax.random.PRNGKey(0), cfg, model)
    step = build_train_step(cfg, model, donate=False, base_radius=base_radius)
    rays, pixels = rd.rays["train"], rd.pixels["train"]
    key = jax.random.PRNGKey(0)
    for i in range(iters // cfg.steps_per_call):
        state, losses = step(state, rays, pixels, jax.random.fold_in(key, i))
    float(losses[-1])
    return cfg, model, state.params, base_radius


def diagnose(name, cfg, model, params, base_radius, data, backend="pallas"):
    settings = RenderSettings(
        N=128, N_prop=cfg.Np, mip=cfg.mip, base_radius=base_radius,
        tn=cfg.tn, tf=cfg.tf, sampling_space=cfg.sampling_space,
        opaque_background=cfg.opaque_background,
        compute_dtype=jnp.bfloat16, backend=backend,
    )
    prop_model = proposal_from_train_config(cfg)

    # --- image dumps + PSNR ---
    try:
        import cv2
    except Exception:
        cv2 = None
    for split, vi in (("test", 0), ("train", 0)):
        sp = data.splits[split]
        rr = rays_for_poses(
            jnp.asarray(sp.poses[vi : vi + 1]), data.H, data.W, data.f
        )
        rgb, disp = render_rays_chunked(
            params, rr, jax.random.PRNGKey(1), settings, model,
            chunk=20480, prop_model=prop_model,
        )
        rgb = np.clip(np.asarray(rgb).reshape(data.H, data.W, 3), 0, 1)
        gt = np.asarray(sp.images[vi])
        psnr = round(float(img_psnr(gt[None], rgb[None])), 2)
        if cv2 is not None:
            os.makedirs(OUTDIR, exist_ok=True)
            pair = np.concatenate([gt, rgb], axis=1)
            cv2.imwrite(
                f"{OUTDIR}/{name}_{split}{vi}_gt_pred.png",
                (pair[:, :, ::-1] * 255).astype(np.uint8),
            )
            d = np.asarray(disp).reshape(data.H, data.W)
            d = (d - d.min()) / max(d.max() - d.min(), 1e-9)
            cv2.imwrite(
                f"{OUTDIR}/{name}_{split}{vi}_disp.png",
                (d * 255).astype(np.uint8),
            )
        print(f"DIAG {name} {split}{vi} psnr={psnr}", flush=True)

    # --- per-ray weight diagnostics on 512 rays of each split ---
    for split in ("test", "train"):
        sp = data.splits[split]
        rr = np.asarray(
            rays_for_poses(
                jnp.asarray(sp.poses[:1]), data.H, data.W, data.f
            )
        )
        sel = np.random.default_rng(0).choice(len(rr), 512, replace=False)
        rays_b = jnp.asarray(rr[sel])
        if cfg.mip:
            out, (ep, wp, ef) = render_rays_proposal(
                {"prop": params["prop"], "fine": params["fine"]},
                rays_b, jax.random.PRNGKey(2), settings, model,
                prop_model=prop_model, det_fine=True, return_aux=True,
            )
            ts = 0.5 * (np.asarray(ef)[:, 1:] + np.asarray(ef)[:, :-1])
        else:
            out, (tp, wp, tf_) = render_rays_proposal(
                {"prop": params["prop"], "fine": params["fine"]},
                rays_b, jax.random.PRNGKey(2), settings, model,
                prop_model=prop_model, det_fine=True, return_aux=True,
            )
            ts = np.asarray(tf_)
        w = np.asarray(out.weights)[:, : ts.shape[1]]
        acc = w.sum(-1)
        s = s_norm(ts, cfg.tn, cfg.tf)
        wn = w / np.maximum(acc[:, None], 1e-9)
        center = (wn * s).sum(-1)
        spread = np.sqrt(
            np.maximum((wn * (s - center[:, None]) ** 2).sum(-1), 0)
        )
        depth = (wn * ts).sum(-1)
        wprop = np.asarray(wp)
        stats = {
            "recipe": name,
            "split": split,
            "acc_mean": round(float(acc.mean()), 3),
            "s_center_mean": round(float(center.mean()), 3),
            "s_spread_mean": round(float(spread.mean()), 4),
            "s_spread_p90": round(float(np.percentile(spread, 90)), 4),
            "depth_mean": round(float(depth.mean()), 2),
            "depth_p10": round(float(np.percentile(depth, 10)), 2),
            "prop_acc_mean": round(float(wprop.sum(-1).mean()), 3),
        }
        print("DIAG " + json.dumps(stats), flush=True)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    which = sys.argv[2] if len(sys.argv) > 2 else "both"
    data = load_blender(SCENE, half_res=False)
    rd = RayDataset.from_blender(data)
    if which == "crosseval":
        # representation-vs-optimization discriminator: train the
        # WORKING point recipe, then render it BOTH ways. If cone-cast
        # (IPE) eval of the true geometry holds the point eval's test
        # PSNR, the mip forward model can represent/render this scene
        # and the collapse is an optimization attractor; if it drops
        # badly, the fixture's far field is beyond the IPE axial
        # resolution and honest geometry pays an MSE floor.
        cfg, model, params, br = train_recipe("point", False, data, rd, iters)
        diagnose("point_eval", cfg, model, params, br, data)
        import dataclasses

        cfg_m = dataclasses.replace(cfg, mip=True)
        # both backends: a pallas-vs-xla split here pins an in-kernel
        # IPE bug; agreement pins shared math
        diagnose("conecast_eval", cfg_m, model, params, br, data)
        diagnose(
            "conecast_eval_xla", cfg_m, model, params, br, data,
            backend="xla",
        )
        # with the boundary absorber: de-confounds the tail (the point
        # path's 1e10 delta absorbed ~1/3 of the ray mass on this scene;
        # opaque_background gives interval compositing the same absorber)
        diagnose(
            "conecast_eval_opaque",
            dataclasses.replace(cfg_m, opaque_background=True),
            model, params, br, data,
        )
        # apply-level split: SAME params, SAME frustums — point encode
        # at the frustum centers vs IPE encode with the live variances.
        # A sigma/color delta here pins the collapse to the encoder
        # inputs; agreement pins it to compositing/placement.
        from nerf_simple_tpu.models.nerf import nerf_apply, nerf_apply_mip
        from nerf_simple_tpu.ops.sampling import conical_gaussian
        from nerf_simple_tpu.render.renderer import (
            RenderSettings,
            render_rays_proposal,
        )

        sp = data.splits["test"]
        rr = np.asarray(
            rays_for_poses(jnp.asarray(sp.poses[:1]), data.H, data.W, data.f)
        )
        rays_b = jnp.asarray(rr[:: len(rr) // 512][:512])
        st = RenderSettings(
            N=128, N_prop=cfg.Np, mip=True, base_radius=br,
            tn=cfg.tn, tf=cfg.tf, sampling_space=cfg.sampling_space,
        )
        _, (ep, wp, ef) = render_rays_proposal(
            {"prop": params["prop"], "fine": params["fine"]},
            rays_b, jax.random.PRNGKey(2), st, model,
            prop_model=proposal_from_train_config(cfg),
            det_fine=True, return_aux=True,
        )
        means, vars_, t_mids = conical_gaussian(rays_b, ef, br)
        B, N = t_mids.shape
        unit = rays_b[:, 3:6] / jnp.linalg.norm(
            rays_b[:, 3:6], axis=-1, keepdims=True
        )
        dirs = jnp.broadcast_to(unit[:, None, :], (B, N, 3)).reshape(-1, 3)
        out_pt = nerf_apply(
            params["fine"],
            jnp.concatenate([means.reshape(-1, 3), dirs], -1),
            model,
        )
        out_ipe = nerf_apply_mip(
            params["fine"], means.reshape(-1, 3), vars_.reshape(-1, 3),
            dirs, model,
        )
        sp_, si = np.asarray(out_pt[:, 3]), np.asarray(out_ipe[:, 3])
        cp, ci = np.asarray(out_pt[:, :3]), np.asarray(out_ipe[:, :3])
        v = np.asarray(vars_.reshape(-1, 3))
        print(
            "DIAG "
            + json.dumps(
                {
                    "recipe": "apply_split",
                    "sigma_point_p50": round(float(np.median(sp_)), 3),
                    "sigma_ipe_p50": round(float(np.median(si)), 3),
                    "sigma_absdelta_p90": round(
                        float(np.percentile(np.abs(sp_ - si), 90)), 3
                    ),
                    "color_absdelta_p90": round(
                        float(np.percentile(np.abs(cp - ci), 90)), 3
                    ),
                    "var_p50": float(np.median(v)),
                    "var_p99": float(np.percentile(v, 99)),
                }
            ),
            flush=True,
        )
        return
    for name, mip in (("point", False), ("mip", True)):
        if which != "both" and which != name:
            continue
        cfg, model, params, br = train_recipe(name, mip, data, rd, iters)
        diagnose(name, cfg, model, params, br, data)


if __name__ == "__main__":
    main()
