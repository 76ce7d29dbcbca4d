"""Multi-scale anti-aliasing benchmark: mip cone casting vs point NeRF.

The mip-NeRF claim, reproduced on the hard-surface procedural scene:
render the SAME trained scene at progressively coarser resolutions
(zoomed-out / far-away viewing). A point-sampled NeRF shoots one
infinitesimal ray per pixel, so at 1/4 and 1/8 scale each pixel
integrates a footprint the ray never saw — edges shimmer and PSNR vs
the area-downsampled ground truth collapses. Cone casting integrates
the pixel frustum (IPE damps sub-footprint frequencies), so quality
holds across scales.

Both models train single-scale (the harder setting — the mip model has
never seen coarse pixels); eval renders scales 1..1/8 against
INTER_AREA-downsampled GT with the cone radius scaled per frame
(2/sqrt(12) / (f/s)).

Writes benchmarks/mip_bench.json. Run on the TPU chip.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from nerf_simple_tpu.config import TrainConfig
from nerf_simple_tpu.data.blender import load_blender
from nerf_simple_tpu.data.dataset import RayDataset
from nerf_simple_tpu.models.nerf import NerfMLP
from nerf_simple_tpu.ops.rays import rays_for_poses
from nerf_simple_tpu.render.renderer import RenderSettings, render_rays_chunked
from nerf_simple_tpu.train.metrics import img_psnr
from nerf_simple_tpu.train.step import build_train_step, make_train_state

SCENE = "/tmp/hard_scene/scene"
OUT = os.path.join(os.path.dirname(__file__), "..", "benchmarks")
ITERS = 10_000
BATCH = 4096


def train_one(cfg, rd, base_radius):
    model = NerfMLP()
    state = make_train_state(jax.random.PRNGKey(0), cfg, model)
    step = build_train_step(cfg, model, donate=False, base_radius=base_radius)
    rays, pixels = rd.rays["train"], rd.pixels["train"]
    key = jax.random.PRNGKey(0)
    state, losses = step(state, rays, pixels, jax.random.fold_in(key, 0))
    float(losses[-1])
    t0 = time.time()
    n_chunks = cfg.num_iters // cfg.steps_per_call
    for i in range(1, n_chunks):
        state, losses = step(state, rays, pixels, jax.random.fold_in(key, i))
    float(losses[-1])
    wall = (time.time() - t0) * n_chunks / (n_chunks - 1)
    return state.params, model, round(wall, 1)


from nerf_simple_tpu.ops.rays import rays_for_poses_scaled as aligned_rays  # noqa: E402


def eval_scales(
    params, model, data, mip: bool, mip_levels: int = 1, N_prop: int = 0,
    prop_model=None,
):
    """Test-view PSNR at scales 1, 2, 4, 8 vs INTER_AREA-downsampled GT."""
    test = data.splits["test"]
    poses = jnp.asarray(test.poses[:2])
    gts = np.asarray(test.images[:2])
    H, W, f = data.H, data.W, data.f
    per_scale = {}
    for s in (1, 2, 4, 8):
        Hs, Ws, fs = H // s, W // s, f / s
        rays = (
            aligned_rays(poses, H, W, f, s) if s > 1
            else rays_for_poses(poses, H, W, f)
        )
        settings = RenderSettings(
            N=128,
            mip=mip,
            mip_levels=mip_levels,
            N_prop=N_prop,
            base_radius=(2.0 / math.sqrt(12.0) / fs) if mip else 0.0,
            tn=2.0,
            tf=6.0,
            compute_dtype=jnp.bfloat16,
        )
        rgb, _ = render_rays_chunked(
            params, rays, jax.random.PRNGKey(1), settings, model,
            chunk=min(16384, max(1024, Hs * Ws)), prop_model=prop_model,
        )
        rgb = np.asarray(rgb).reshape(2, Hs, Ws, 3)
        psnrs = []
        for i in range(2):
            gt = gts[i]
            if s > 1:
                gt = cv2.resize(gt, (Ws, Hs), interpolation=cv2.INTER_AREA)
            psnrs.append(
                round(float(img_psnr(gt[None], rgb[i : i + 1])), 2)
            )
        per_scale[f"1/{s}"] = psnrs
    return per_scale


def run_mip_proposal(base, rd, data, base_radius):
    """The anti-aliased composition row (r5): proposal-placed interval
    edges + IPE cone frustums through the fused mip x proposal train
    core. Per-scale PSNR vs mip-alone answers whether proposal
    placement costs (or buys) anti-aliasing on the bounded scene."""
    from nerf_simple_tpu.models import model_from_train_config
    from nerf_simple_tpu.models.proposal import proposal_from_train_config
    from nerf_simple_tpu.train.step import make_train_state as mts  # noqa: F401

    cfg = TrainConfig(
        mip=True, proposal=True, Np=64, backend="pallas", **base
    )
    model = model_from_train_config(cfg)
    state = make_train_state(jax.random.PRNGKey(0), cfg, model)
    step = build_train_step(cfg, model, donate=False, base_radius=base_radius)
    rays, pixels = rd.rays["train"], rd.pixels["train"]
    key = jax.random.PRNGKey(0)
    state, losses = step(state, rays, pixels, jax.random.fold_in(key, 0))
    float(losses[-1])
    t0 = time.time()
    n_chunks = cfg.num_iters // cfg.steps_per_call
    for i in range(1, n_chunks):
        state, losses = step(state, rays, pixels, jax.random.fold_in(key, i))
    float(losses[-1])
    wall = round((time.time() - t0) * n_chunks / max(n_chunks - 1, 1), 1)
    row = {
        "config": "mip x proposal (anti-aliased, proposal-placed edges)",
        "train_wall_s": wall,
        "psnr_by_scale": eval_scales(
            state.params, model, data, mip=True, N_prop=cfg.Np,
            prop_model=proposal_from_train_config(cfg),
        ),
    }
    print(row, flush=True)
    path = os.path.join(OUT, "mip_bench.json")
    rows = json.load(open(path)) if os.path.exists(path) else []
    rows = [r for r in rows if r["config"] != row["config"]] + [row]
    with open(path, "w") as fh:
        json.dump(rows, fh, indent=1)
    print("wrote benchmarks/mip_bench.json (merged)")


def main():
    if not os.path.exists(SCENE):
        from nerf_simple_tpu.data.synthetic import write_blender_scene

        os.makedirs(os.path.dirname(SCENE), exist_ok=True)
        write_blender_scene(
            SCENE, n_train=25, n_val=2, n_test=2, H=400, W=400,
            train_jitter=3, style="hard",
        )
    data = load_blender(SCENE, half_res=True)
    rd = RayDataset.from_blender(data)
    base_radius = 2.0 / math.sqrt(12.0) / data.f

    base = dict(
        datapath=SCENE, Nf=128, batch_size=BATCH, num_iters=ITERS,
        steps_per_call=100, compute_dtype="bf16",
        ckpt_loss=10**9, ckpt_images=10**9, ckpt_model=10**9,
    )
    only = os.environ.get("MB_ONLY", "")
    if only:
        # partial re-measure: run just the mip x proposal composition row
        # and merge it into the existing json by config name
        run_mip_proposal(base, rd, data, base_radius)
        return
    rows = []
    p_pt, m_pt, wall_pt = train_one(
        TrainConfig(backend="pallas", **base), rd, 0.0
    )
    rows.append(
        {
            "config": "point NeRF (flagship, pallas)",
            "train_wall_s": wall_pt,
            "psnr_by_scale": eval_scales(p_pt, m_pt, data, mip=False),
        }
    )
    print(rows[-1], flush=True)
    p_mip, m_mip, wall_mip = train_one(
        TrainConfig(mip=True, backend="pallas", **base), rd, base_radius
    )
    rows.append(
        {
            "config": "mip NeRF (cone casting, pallas fused)",
            "train_wall_s": wall_mip,
            "psnr_by_scale": eval_scales(p_mip, m_mip, data, mip=True),
        }
    )
    print(rows[-1], flush=True)
    p_m2, m_m2, wall_m2 = train_one(
        TrainConfig(mip=True, mip_levels=2, backend="pallas", **base),
        rd, base_radius,
    )
    rows.append(
        {
            "config": "mip NeRF two-level (coarse+fine, shared MLP, pallas)",
            "train_wall_s": wall_m2,
            "psnr_by_scale": eval_scales(
                p_m2, m_m2, data, mip=True, mip_levels=2
            ),
        }
    )
    print(rows[-1], flush=True)
    # cross eval: the point-trained net rendered with cones at eval only
    rows.append(
        {
            "config": "point-trained, cone-cast eval",
            "train_wall_s": wall_pt,
            "psnr_by_scale": eval_scales(p_pt, m_pt, data, mip=True),
        }
    )
    print(rows[-1], flush=True)
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "mip_bench.json"), "w") as fh:
        json.dump(rows, fh, indent=1)
    print("wrote benchmarks/mip_bench.json")


if __name__ == "__main__":
    main()
