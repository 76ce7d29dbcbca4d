"""Occupancy-informed eval sweep: quality-vs-samples + frame time.

Trains the flagship model on the procedural scene, then renders a held-out
view at several per-ray sample budgets with (a) stratified sampling and
(b) occupancy-grid deterministic-quantile sampling (ops/occupancy.py),
recording PSNR and 800x800-frame render time for each.

Writes benchmarks/occ_eval_sweep.json. Run on the TPU chip.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nerf_simple_tpu.config import TrainConfig
from nerf_simple_tpu.data.blender import load_blender
from nerf_simple_tpu.data.dataset import RayDataset
from nerf_simple_tpu.data.synthetic import write_blender_scene
from nerf_simple_tpu.models import NerfMLP
from nerf_simple_tpu.ops.occupancy import rebuild_occ
from nerf_simple_tpu.render.renderer import RenderSettings, render_rays_chunked
from nerf_simple_tpu.train.metrics import img_psnr
from nerf_simple_tpu.train.step import build_train_step, make_train_state

SCENE = os.environ.get("OCC_SWEEP_SCENE", "/tmp/occ_sweep/scene")
STYLE = os.environ.get("OCC_SWEEP_STYLE", "blobs")
TAG = os.environ.get("OCC_SWEEP_TAG", "")  # output file suffix
OUT = os.path.join(os.path.dirname(__file__), "..", "benchmarks")
ITERS = 3000
SPC = 40
BATCH = 4096


def main():
    os.makedirs(os.path.dirname(SCENE), exist_ok=True)
    if not os.path.exists(SCENE):
        write_blender_scene(
            SCENE, n_train=25, n_val=2, n_test=2, H=400, W=400, style=STYLE
        )
    data = load_blender(SCENE, half_res=True)
    rd = RayDataset.from_blender(data)
    rays, pixels = rd.rays["train"], rd.pixels["train"]

    model = NerfMLP()
    cfg = TrainConfig(
        datapath=SCENE, batch_size=BATCH, Nf=128, num_iters=ITERS,
        steps_per_call=SPC, backend="pallas", compute_dtype="bf16",
    )
    key = jax.random.PRNGKey(0)
    state = make_train_state(key, cfg, model)
    step_fn = build_train_step(cfg, model, donate=False)
    t0 = time.time()
    for i in range(ITERS // SPC):
        state, losses = step_fn(state, rays, pixels, jax.random.fold_in(key, i))
    final_loss = float(losses[-1])
    train_s = time.time() - t0
    print(f"trained {ITERS} iters in {train_s:.1f}s, loss {final_loss:.2e}")

    occ = rebuild_occ(
        state.params, model, jnp.float32, 64, 2.0, jax.random.PRNGKey(5)
    )
    occ_frac = float(jnp.mean((occ > 0.01).astype(jnp.float32)))
    print(f"occupied fraction of grid: {occ_frac:.3f}")

    test_rays = rd.rays["test"][: rd.H * rd.W]
    gt = np.asarray(rd.pixels["test"][: rd.H * rd.W]).reshape(
        1, rd.H, rd.W, 3
    )

    def eval_at(N, use_occ, Nb=64, group=1):
        s = RenderSettings(
            N=N, compute_dtype=jnp.bfloat16, backend="pallas",
            occ_aabb=2.0, occ_Nb=Nb, occ_floor=0.01, occ_group=group,
        )
        g = occ if use_occ else None
        rgb, _ = render_rays_chunked(
            state.params, test_rays, jax.random.PRNGKey(1), s, model, occ=g
        )
        psnr = float(
            img_psnr(gt, np.asarray(rgb).reshape(1, rd.H, rd.W, 3))
        )
        # 800x800 frame timing: 640000 rays padded to 10 chunks of 65536
        big = jnp.tile(test_rays, (-(-640000 // test_rays.shape[0]), 1))[
            :640000
        ]
        for _ in range(2):  # warm + time
            t0 = time.time()
            rgb2, _ = render_rays_chunked(
                state.params, big, jax.random.PRNGKey(2), s, model, occ=g,
                chunk=65536,
            )
            float(jnp.sum(rgb2))  # sync
            dt = time.time() - t0
        return psnr, dt

    results = {
        "train_iters": ITERS, "train_s": train_s, "final_loss": final_loss,
        "occupied_frac": occ_frac, "sweep": [],
    }
    # (sampler, Nb, group): stratified baseline; r2 per-ray occ probes;
    # r3 cheap probes (Nb=32 + one probe per 4 adjacent rays)
    variants = [
        ("stratified", 64, 1, False),
        ("occ", 64, 1, True),
        ("occ-cheap", 32, 4, True),
    ]
    for N in (16, 32, 64, 128):
        for name, Nb, group, use_occ in variants:
            psnr, dt = eval_at(N, use_occ, Nb=Nb, group=group)
            row = {
                "N": N,
                "sampler": name,
                "psnr_half_res_test": round(psnr, 2),
                "frame_800_s": round(dt, 3),
            }
            print(row, flush=True)
            results["sweep"].append(row)

    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, f"occ_eval_sweep{TAG}.json"), "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"wrote benchmarks/occ_eval_sweep{TAG}.json")


if __name__ == "__main__":
    main()
