"""Two-phase pose refinement (TrainConfig.pose_freeze_at): wall vs
quality on a miscalibrated rig.

pose_opt rides the autodiff XLA path at ~5.5x the fused step
(benchmarks/poseapp_bench.json), but pose deltas converge early — so
the freeze bakes them into the ray dataset at 25% of the run and
finishes on the fused Pallas kernel. Four flagship runs on a blob
scene whose TRAIN poses are perturbed by ~0.02 rad / 0.05 units
(test poses stay clean, so test PSNR directly scores rig recovery):

  1. clean poses (oracle)     — calibration upper bound, fused wall
  2. perturbed, no pose_opt   — what miscalibration costs (the floor)
  3. perturbed + pose_opt     — recovery at full autodiff-path wall
  4. + pose_freeze_at 25%     — same recovery near the fused wall
  5. + pe_anneal_until 50%    — BARF coarse-to-fine: the recovery fix
                                (plain pose_opt stalls in full-frequency
                                PE gradient noise)
  6. + anneal 37.5% + freeze 37.5% — the full two-phase recipe: anneal
                                while refining, bake, finish fused

Writes benchmarks/pose_freeze_bench.json. Run on the TPU chip; walls
include compile + driver overhead (the freeze run pays one extra step
compile by design). Reuses $PF_SCENE if present.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from nerf_simple_tpu.config import TrainConfig
from nerf_simple_tpu.data.blender import load_blender
from nerf_simple_tpu.models import model_from_train_config
from nerf_simple_tpu.ops.rays import rays_for_poses
from nerf_simple_tpu.render.renderer import RenderSettings, render_rays_chunked
from nerf_simple_tpu.train.metrics import img_psnr
from nerf_simple_tpu.train.loop import train

ROOT = os.environ.get("PF_SCENE", "/tmp/pf_bench")
ITERS = int(os.environ.get("PF_ITERS", 4000))
FREEZE = int(os.environ.get("PF_FREEZE", ITERS // 4))
HW = int(os.environ.get("PF_H", 100))
DR, DT = 0.02, 0.05


def _rotmat(r):
    th = np.linalg.norm(r)
    if th < 1e-12:
        return np.eye(3)
    k = r / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def perturb(scene, seed=7):
    tj_path = os.path.join(scene, "transforms_train.json")
    tj = json.load(open(tj_path))
    rng = np.random.default_rng(seed)
    for fr in tj["frames"]:
        p = np.array(fr["transform_matrix"], np.float64)
        er = rng.normal(size=3)
        er *= DR / max(np.linalg.norm(er), 1e-9)
        et = rng.normal(size=3)
        et *= DT / max(np.linalg.norm(et), 1e-9)
        p[:3, :3] = _rotmat(er) @ p[:3, :3]
        p[:3, 3] += et
        fr["transform_matrix"] = p.tolist()
    json.dump(tj, open(tj_path, "w"))


def main():
    clean = os.path.join(ROOT, "clean/scene")
    pert = os.path.join(ROOT, "pert/scene")
    if not os.path.exists(clean):
        from nerf_simple_tpu.data.synthetic import write_blender_scene

        write_blender_scene(
            clean, n_train=12, n_val=2, n_test=2, H=HW, W=HW,
            train_jitter=3,
        )
        shutil.copytree(clean, pert)
        perturb(pert)

    CONFIGS = [
        ("clean poses (oracle)", clean, dict()),
        ("perturbed, no pose_opt", pert, dict()),
        (
            "perturbed + pose_opt (full run)",
            pert,
            dict(pose_opt=True, pose_warmup=ITERS // 20),
        ),
        (
            f"perturbed + pose_opt + freeze@{FREEZE}",
            pert,
            dict(
                pose_opt=True, pose_warmup=ITERS // 20,
                pose_freeze_at=FREEZE,
            ),
        ),
        # BARF coarse-to-fine annealing: the fix for the weak recovery
        # the rows above measure (full-frequency PE pose gradients are
        # noise; anneal lets the smooth octaves align the rig first)
        (
            f"perturbed + pose_opt + anneal@{ITERS // 2}",
            pert,
            dict(
                pose_opt=True, pose_warmup=ITERS // 20,
                pe_anneal_until=ITERS // 2,
            ),
        ),
        (
            f"perturbed + pose_opt + anneal@{3 * ITERS // 8} "
            f"+ freeze@{3 * ITERS // 8}",
            pert,
            dict(
                pose_opt=True, pose_warmup=ITERS // 20,
                pe_anneal_until=3 * ITERS // 8,
                pose_freeze_at=3 * ITERS // 8,
            ),
        ),
    ]

    only = os.environ.get("PF_ONLY", "")
    out_path = os.path.join(
        os.path.dirname(__file__), "..", "benchmarks",
        "pose_freeze_bench.json",
    )
    rows = []
    if only and os.path.exists(out_path):
        # partial re-run: keep previous rows for configs not selected
        rows = [
            r for r in json.load(open(out_path)) if only not in r["config"]
        ]
    for i, (name, scene, kw) in enumerate(CONFIGS):
        if only and only not in name:
            continue
        savepath = os.path.join(ROOT, f"models_{i}")
        shutil.rmtree(savepath, ignore_errors=True)
        cfg = TrainConfig(
            datapath=scene, savepath=savepath, exp_name="pf",
            Nf=128, batch_size=4096, num_iters=ITERS, steps_per_call=40,
            compute_dtype="bf16", backend="pallas",
            ckpt_loss=10**9, ckpt_images=10**9, ckpt_model=10**9,
            log_dir=os.path.join(ROOT, f"logs_{i}"), **kw,
        )
        t0 = time.time()
        state = train(cfg)
        wall = round(time.time() - t0, 1)
        params = (
            state.params["field"]
            if isinstance(state.params, dict) and "field" in state.params
            else state.params
        )
        model = model_from_train_config(cfg)
        data = load_blender(clean, half_res=False)
        test = data.splits["test"]
        test_rays = rays_for_poses(
            jnp.asarray(test.poses), data.H, data.W, data.f
        )
        settings = RenderSettings(
            N=128, tn=cfg.tn, tf=cfg.tf,
            compute_dtype=jnp.bfloat16, backend="pallas",
        )
        rgb, _ = render_rays_chunked(
            params, test_rays, jax.random.PRNGKey(1), settings, model,
            chunk=10240,
        )
        rgb = np.asarray(rgb).reshape(-1, data.H, data.W, 3)
        gts = np.asarray(test.images)
        psnrs = [
            round(float(img_psnr(gts[j : j + 1], rgb[j : j + 1])), 2)
            for j in range(len(gts))
        ]
        rows.append({"config": name, "wall_s": wall, "test_psnr": psnrs})
        print(rows[-1], flush=True)

    order = [n for n, _, _ in CONFIGS]
    rows.sort(key=lambda r: order.index(r["config"]) if r["config"] in order else 99)
    with open(out_path, "w") as fh:
        json.dump(rows, fh, indent=1)
    print("wrote benchmarks/pose_freeze_bench.json")


if __name__ == "__main__":
    main()
