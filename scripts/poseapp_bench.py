"""Step-time cost of the per-image trainable extras (pose_opt,
appearance_dim) at the bench shape (batch 4096 x Nf 128, bf16).

Both extras ride the Pallas 2-kernel custom-vjp path: the backward
kernel emits dL/dx (kernels/mlp.py::_input_grad_tile) for pose deltas
AND per-sample appearance-code gradients on the input-grad output's
rows 8..15 (FusedWeightsApp rail); XLA autodiff chains them through ray
generation / the code-table gather. Codes wider than 8 fall back to
XLA autodiff. The relevant comparisons:

  fused pallas baseline     <- the flagship fast path (1-kernel train step)
  xla autodiff baseline     <- the generic fallback path
  + pose_opt (xla/pallas)   <- se(3) deltas, autodiff vs input-grad kernel
  + appearance_dim 8 (both) <- per-ray code gather + color-head app rail
  + both (xla/pallas)       <- the real-capture recipe

Writes benchmarks/poseapp_bench.json. Scene content is irrelevant for
step timing (fixed shapes); reuses $PA_SCENE or generates a tiny one.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from nerf_simple_tpu.config import TrainConfig
from nerf_simple_tpu.data.blender import load_blender
from nerf_simple_tpu.data.dataset import RayDataset
from nerf_simple_tpu.models import model_from_train_config
from nerf_simple_tpu.train.step import build_train_step, make_train_state

SCENE = os.environ.get("PA_SCENE", "/tmp/pa_scene/scene")
ITERS = int(os.environ.get("PA_ITERS", 2000))
SPC = int(os.environ.get("PA_SPC", 40))

CONFIGS = [
    ("fused pallas (flagship fast path)", dict(backend="pallas")),
    ("xla autodiff", dict()),
    ("xla + pose_opt", dict(pose_opt=True, pose_warmup=100, backend="xla")),
    (
        "pallas + pose_opt (input-grad kernel)",
        dict(pose_opt=True, pose_warmup=100, backend="pallas"),
    ),
    (
        "pallas + pose_opt + anneal (in-kernel BARF windows)",
        dict(
            pose_opt=True, pose_warmup=100, backend="pallas",
            pe_anneal_until=1000,
        ),
    ),
    ("xla + appearance_dim 8", dict(appearance_dim=8)),
    (
        "pallas + appearance_dim 8 (code-grad kernel)",
        dict(appearance_dim=8, backend="pallas"),
    ),
    (
        "xla + pose_opt + appearance_dim 8 (real-capture recipe)",
        dict(pose_opt=True, pose_warmup=100, appearance_dim=8),
    ),
    (
        "pallas + pose_opt + appearance_dim 8 (real-capture recipe)",
        dict(pose_opt=True, pose_warmup=100, appearance_dim=8,
             backend="pallas"),
    ),
    # anti-aliased pose refinement (r5): the backward kernel emits
    # dL/d(mean, dir, variance) through the IPE damp chain
    # (_input_grad_tile_mip) — previously this composition silently
    # dropped to the XLA render path
    (
        "xla + mip + pose_opt",
        dict(pose_opt=True, pose_warmup=100, mip=True, backend="xla"),
    ),
    (
        "pallas + mip + pose_opt (IPE input-grad kernel)",
        dict(pose_opt=True, pose_warmup=100, mip=True, backend="pallas"),
    ),
]


def main():
    if not os.path.exists(SCENE):
        from nerf_simple_tpu.data.synthetic import write_blender_scene

        write_blender_scene(SCENE, n_train=8, n_val=2, n_test=2, H=64, W=64)
    data = load_blender(SCENE, half_res=False)
    rd = RayDataset.from_blender(data)
    only = os.environ.get("PA_ONLY", "")
    rows = []
    for name, kw in CONFIGS:
        if only and only not in name:
            continue
        cfg = TrainConfig(
            datapath=SCENE, Nf=128, batch_size=4096, num_iters=ITERS,
            steps_per_call=SPC, compute_dtype="bf16",
            ckpt_loss=10**9, ckpt_images=10**9, ckpt_model=10**9, **kw,
        )
        model = model_from_train_config(cfg)
        n_images = rd.split_size("train") // (data.H * data.W)
        aux_on = cfg.pose_opt or cfg.appearance_dim > 0
        state = make_train_state(
            jax.random.PRNGKey(0), cfg, model,
            n_images=n_images if aux_on else None,
        )
        step = build_train_step(
            cfg, model, donate=False, rays_per_image=data.H * data.W,
            base_radius=(
                2.0 / 12.0**0.5 / float(data.f) if cfg.mip else 0.0
            ),
        )
        rays, pixels = rd.rays["train"], rd.pixels["train"]
        key = jax.random.PRNGKey(0)
        state, losses = step(state, rays, pixels, jax.random.fold_in(key, 0))
        float(losses[-1])  # sync out the compile chunk
        t0 = time.time()
        n_chunks = ITERS // SPC
        for i in range(1, n_chunks):
            state, losses = step(
                state, rays, pixels, jax.random.fold_in(key, i)
            )
        float(losses[-1])
        wall = time.time() - t0
        ms = wall / max(ITERS - SPC, 1) * 1e3
        rows.append({"config": name, "ms_per_iter": round(ms, 2)})
        print(rows[-1], flush=True)

    out = os.path.join(os.path.dirname(__file__), "..", "benchmarks")
    path = os.path.join(out, "poseapp_bench.json")
    if only and os.path.exists(path):
        # partial re-measure (PA_ONLY filter): merge by config name
        with open(path) as fh:
            old = {r["config"]: r for r in json.load(fh)}
        old.update({r["config"]: r for r in rows})
        rows = [old[n] for n, _ in CONFIGS if n in old]
    base = next(
        r["ms_per_iter"] for r in rows if r["config"] == "xla autodiff"
    )
    for r in rows:
        r["vs_xla"] = round(r["ms_per_iter"] / base, 2)
    with open(path, "w") as fh:
        json.dump(rows, fh, indent=1)
    print("wrote benchmarks/poseapp_bench.json")


if __name__ == "__main__":
    main()
