"""Point-form full-360-recipe reference at an arbitrary iteration
budget (the bench JSON rows are 10k-iter; knob probes need an
equal-iters calibration of what "working" looks like).

Usage: python scripts/point_ref_probe.py ITERS
"""

from __future__ import annotations

import json
import os
import sys
import time

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
from nerf_simple_tpu.render.renderer import RenderSettings, render_rays_chunked
from nerf_simple_tpu.train.metrics import img_psnr
from nerf_simple_tpu.train.step import build_train_step, make_train_state

SCENE = os.environ.get("UNB_SCENE", "/tmp/unb_scene_v3/scene")


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    data = load_blender(SCENE, half_res=False)
    rd = RayDataset.from_blender(data)
    cfg = TrainConfig(
        datapath=SCENE, Nf=128, batch_size=4096, num_iters=iters,
        steps_per_call=40, compute_dtype="bf16", backend="pallas",
        ckpt_loss=10**9, ckpt_images=10**9, ckpt_model=10**9,
        tn=1.0, tf=30.0, sampling_space="disparity", contract=True,
        proposal=True, Np=64, distortion_loss_weight=0.01,
    )
    model = model_from_train_config(cfg)
    state = make_train_state(jax.random.PRNGKey(0), cfg, model)
    step = build_train_step(cfg, model, donate=False)
    rays, pixels = rd.rays["train"], rd.pixels["train"]
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    for i in range(iters // cfg.steps_per_call):
        state, losses = step(state, rays, pixels, jax.random.fold_in(key, i))
    float(losses[-1])
    wall = round(time.time() - t0, 1)

    settings = RenderSettings(
        N=128, N_prop=cfg.Np, tn=cfg.tn, tf=cfg.tf,
        sampling_space=cfg.sampling_space,
        compute_dtype=jnp.bfloat16, backend="pallas",
    )
    prop_model = proposal_from_train_config(cfg)

    def psnrs(split, n):
        sp = data.splits[split]
        rr = rays_for_poses(
            jnp.asarray(sp.poses[:n]), data.H, data.W, data.f
        )
        rgb, _ = render_rays_chunked(
            state.params, rr, jax.random.PRNGKey(1), settings, model,
            chunk=20480, prop_model=prop_model,
        )
        rgb = np.asarray(rgb).reshape(n, data.H, data.W, 3)
        gt = np.asarray(sp.images[:n])
        return [
            round(float(img_psnr(gt[i : i + 1], rgb[i : i + 1])), 2)
            for i in range(n)
        ]

    print(
        "PROBE "
        + json.dumps(
            {
                "probe": f"point full-360 recipe iters={iters}",
                "train_wall_s": wall,
                "test_psnr": psnrs("test", 4),
                "train_view_psnr": psnrs("train", 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
