"""Preset table on the hard-surface low-occupancy scene.

The canonical lego scene is unobtainable here (zero egress), so this is
the closest obtainable stand-in for its regime: sharp near-binary
surfaces, ~2% volume occupancy, large empty margins
(data/synthetic.py ``style="hard"``). Every preset trains at its
production config; quality is the held-out test PSNR under each
preset's own eval semantics (hierarchical rows render their
coarse->importance->fine path; others the reference N=128 stratified).

Writes benchmarks/hard_scene_bench.json. Run on the TPU chip.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench_common import run_one
from nerf_simple_tpu.config import TrainConfig
from nerf_simple_tpu.data.blender import load_blender
from nerf_simple_tpu.data.dataset import RayDataset

SCENE = "/tmp/hard_scene/scene"
OUT = os.path.join(os.path.dirname(__file__), "..", "benchmarks")
SPC = 100
BATCH = 4096


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

    base = dict(
        datapath=SCENE, batch_size=BATCH, num_iters=10_000,
        steps_per_call=SPC, backend="pallas", compute_dtype="bf16",
        ckpt_loss=10**9, ckpt_images=10**9, ckpt_model=10**9,
    )
    occ = dict(occupancy=True, occ_R=64, occ_Nb=32, occ_update_every=16,
               occ_aabb=2.0)
    rows = [
        run_one("flagship Nf=128 stratified", TrainConfig(Nf=128, **base), rd),
        run_one("occ preset Nf=64", TrainConfig(Nf=64, **occ, **base), rd),
        run_one("hierarchical Nc=64 Nf=192",
                TrainConfig(hierarchical=True, Nc=64, Nf=192, **base), rd),
        run_one("hierarchical+occ Nc=64 Nf=128",
                TrainConfig(hierarchical=True, Nc=64, Nf=128, **occ, **base),
                rd),
        run_one(
            "hashgrid TPU preset (exact fwd)",
            TrainConfig(
                model_family="hashgrid", hash_L=4, hash_F=8, hash_log2_T=14,
                hash_Nmax=128, hash_aabb=2.0, Nf=32, num_iters=4000,
                steps_per_call=20, backend="xla", compute_dtype="bf16",
                datapath=SCENE, batch_size=BATCH, occupancy=True, occ_R=64,
                occ_Nb=32, occ_update_every=16, occ_aabb=2.0,
                ckpt_loss=10**9, ckpt_images=10**9, ckpt_model=10**9,
            ),
            rd,
        ),
    ]
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "hard_scene_bench.json"), "w") as fh:
        json.dump(rows, fh, indent=1)
    print("wrote benchmarks/hard_scene_bench.json")


if __name__ == "__main__":
    main()
