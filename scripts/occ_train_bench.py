"""Occupancy speed-preset benchmark: equal-PSNR at lower wall-clock.

Trains the flagship config (Nf=128, stratified — configs/lego.yaml) and
the occupancy speed preset (Nf=64 redistributed by the EMA grid —
configs/lego_occ.yaml) for the same iteration count on the procedural
lego-scale scene, then renders held-out views at the REFERENCE eval
setting (N=128 stratified, utils/rendering.py:102) for both so the
quality comparison is sampler-independent.

Writes benchmarks/occ_train_bench.json. Run on the TPU chip.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nerf_simple_tpu.config import TrainConfig
from nerf_simple_tpu.data.blender import load_blender
from nerf_simple_tpu.data.dataset import RayDataset
from nerf_simple_tpu.models import NerfMLP
from nerf_simple_tpu.render.renderer import RenderSettings, render_rays_chunked
from nerf_simple_tpu.train.metrics import img_psnr
from nerf_simple_tpu.train.step import build_train_step, make_train_state

SCENE = "/tmp/occ_sweep/scene"  # shared with occ_eval_sweep.py
OUT = os.path.join(os.path.dirname(__file__), "..", "benchmarks")
ITERS = 10_000
SPC = 100
BATCH = 4096


def run_one(name: str, cfg: TrainConfig, rd) -> dict:
    model = NerfMLP()
    key = jax.random.PRNGKey(0)
    state = make_train_state(key, cfg, model)
    step_fn = build_train_step(cfg, model, donate=False)
    rays, pixels = rd.rays["train"], rd.pixels["train"]
    # compile + first chunk outside the timed window (steady-state wall)
    state, losses = step_fn(state, rays, pixels, jax.random.fold_in(key, 0))
    float(losses[-1])
    t0 = time.time()
    n_chunks = ITERS // SPC
    for i in range(1, n_chunks):
        state, losses = step_fn(state, rays, pixels, jax.random.fold_in(key, i))
    final_loss = float(losses[-1])
    steady_s = time.time() - t0
    iters_timed = (n_chunks - 1) * SPC
    rays_per_sec = BATCH * iters_timed / steady_s

    # reference eval setting for BOTH runs: N=128 stratified
    es = RenderSettings(N=128, compute_dtype=cfg.render_dtype, backend=cfg.backend)
    n = rd.H * rd.W
    psnrs = []
    for ti in range(2):
        test_rays = rd.rays["test"][ti * n : (ti + 1) * n]
        gt = np.asarray(rd.pixels["test"][ti * n : (ti + 1) * n]).reshape(
            1, rd.H, rd.W, 3
        )
        rgb, _ = render_rays_chunked(
            state.params, test_rays, jax.random.PRNGKey(1), es, model
        )
        psnrs.append(
            float(img_psnr(gt, np.asarray(rgb).reshape(1, rd.H, rd.W, 3)))
        )
    row = {
        "config": name,
        "Nf": cfg.Nf,
        "occupancy": cfg.occupancy,
        "iters": ITERS,
        "steady_wall_s_full_run_est": round(steady_s * n_chunks / (n_chunks - 1), 1),
        "rays_per_sec": round(rays_per_sec),
        "final_loss": final_loss,
        "test_psnr_at_ref_eval": [round(p, 2) for p in psnrs],
    }
    print(row, flush=True)
    return row


def main():
    if not os.path.exists(SCENE):
        from nerf_simple_tpu.data.synthetic import write_blender_scene

        os.makedirs(os.path.dirname(SCENE), exist_ok=True)
        write_blender_scene(SCENE, n_train=25, n_val=2, n_test=2, H=400, W=400)
    data = load_blender(SCENE, half_res=True)
    rd = RayDataset.from_blender(data)

    base = dict(
        datapath=SCENE, batch_size=BATCH, num_iters=ITERS, steps_per_call=SPC,
        backend="pallas", compute_dtype="bf16",
        ckpt_loss=10**9, ckpt_images=10**9, ckpt_model=10**9,
    )
    flagship = TrainConfig(Nf=128, **base)
    occ64 = TrainConfig(
        Nf=64, occupancy=True, occ_R=64, occ_Nb=32, occ_update_every=16,
        occ_aabb=2.0, **base,
    )

    results = [
        run_one("flagship Nf=128 stratified", flagship, rd),
        run_one("occ preset Nf=64", occ64, rd),
    ]
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "occ_train_bench.json"), "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote benchmarks/occ_train_bench.json")


if __name__ == "__main__":
    main()
