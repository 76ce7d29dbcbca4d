"""Unbounded-scene benchmark: scene contraction + disparity sampling vs
bounded / linear baselines.

The procedural "unbounded" scene (data/synthetic.py::_field_unbounded)
has content at two depth octaves — a central blob cluster at radius
~1-2 and a banded shell at radius 20. Four flagship configs train on it:

  1. bounded (tf=6):   the reference regime — the background is simply
                       outside the sampled range and renders black
  2. linear, tf=25:    the budget spreads evenly over 25 units; ~5 of
                       128 samples land on the central content
  3. disparity, tf=25: bins uniform in 1/t — dense near, sparse far
  4. disparity + contract, tf=25: the mip-NeRF 360 recipe — the far
                       field also lands in a bounded encoding domain

Writes benchmarks/unbounded_bench.json. Run on the TPU chip; reuses
/tmp/unb_scene/scene if present (generate with
data/synthetic.py::write_blender_scene(style="unbounded")).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from nerf_simple_tpu.config import TrainConfig
from nerf_simple_tpu.data.blender import load_blender
from nerf_simple_tpu.data.dataset import RayDataset
from nerf_simple_tpu.ops.rays import rays_for_poses
from nerf_simple_tpu.render.renderer import RenderSettings, render_rays_chunked
from nerf_simple_tpu.train.metrics import img_psnr
from nerf_simple_tpu.train.step import build_train_step, make_train_state

SCENE = os.environ.get("UNB_SCENE", "/tmp/unb_scene/scene")
ITERS = int(os.environ.get("UNB_ITERS", 10_000))
BATCH = int(os.environ.get("UNB_BATCH", 4096))

CONFIGS = [
    ("bounded tf=6 (reference regime)", dict(tn=2.0, tf=6.0)),
    ("linear tf=25", dict(tn=0.5, tf=25.0)),
    (
        "disparity tf=25",
        dict(tn=0.5, tf=25.0, sampling_space="disparity"),
    ),
    (
        "disparity + contract tf=25 (the 360 recipe)",
        dict(tn=0.5, tf=25.0, sampling_space="disparity", contract=True),
    ),
]


def main():
    if not os.path.exists(SCENE):
        from nerf_simple_tpu.data.synthetic import write_blender_scene

        write_blender_scene(
            SCENE, n_train=25, n_val=2, n_test=2, H=200, W=200,
            train_jitter=3, style="unbounded",
        )
    data = load_blender(SCENE, half_res=False)
    rd = RayDataset.from_blender(data)
    test = data.splits["test"]
    test_rays = rays_for_poses(
        jax.numpy.asarray(test.poses), data.H, data.W, data.f
    )
    gts = np.asarray(test.images)

    rows = []
    for name, kw in CONFIGS:
        cfg = TrainConfig(
            datapath=SCENE, Nf=128, batch_size=BATCH, num_iters=ITERS,
            steps_per_call=100, compute_dtype="bf16", backend="pallas",
            ckpt_loss=10**9, ckpt_images=10**9, ckpt_model=10**9, **kw,
        )
        from nerf_simple_tpu.models import model_from_train_config

        model = model_from_train_config(cfg)
        state = make_train_state(jax.random.PRNGKey(0), cfg, model)
        step = build_train_step(cfg, model, donate=False)
        rays, pixels = rd.rays["train"], rd.pixels["train"]
        key = jax.random.PRNGKey(0)
        state, losses = step(state, rays, pixels, jax.random.fold_in(key, 0))
        float(losses[-1])
        t0 = time.time()
        n_chunks = cfg.num_iters // cfg.steps_per_call
        for i in range(1, n_chunks):
            state, losses = step(
                state, rays, pixels, jax.random.fold_in(key, i)
            )
        float(losses[-1])
        # single-chunk runs (CPU smoke) can't exclude the compile chunk
        wall = round(
            (time.time() - t0) * n_chunks / max(n_chunks - 1, 1), 1
        )

        settings = RenderSettings(
            N=128,
            tn=cfg.tn,
            tf=cfg.tf,
            sampling_space=cfg.sampling_space,
            compute_dtype=jax.numpy.bfloat16,
            backend="pallas",
        )
        rgb, _ = render_rays_chunked(
            state.params, test_rays, jax.random.PRNGKey(1), settings, model,
            chunk=20480,
        )
        rgb = np.asarray(rgb).reshape(2, data.H, data.W, 3)
        psnrs = [
            round(float(img_psnr(gts[i : i + 1], rgb[i : i + 1])), 2)
            for i in range(2)
        ]
        rows.append(
            {"config": name, "train_wall_s": wall, "test_psnr": psnrs}
        )
        print(rows[-1], flush=True)

    out = os.path.join(os.path.dirname(__file__), "..", "benchmarks")
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "unbounded_bench.json"), "w") as fh:
        json.dump(rows, fh, indent=1)
    print("wrote benchmarks/unbounded_bench.json")


if __name__ == "__main__":
    main()
