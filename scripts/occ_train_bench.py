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

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench_common import run_one
from nerf_simple_tpu.config import TrainConfig
from nerf_simple_tpu.data.blender import load_blender
from nerf_simple_tpu.data.dataset import RayDataset

SCENE = "/tmp/occ_sweep/scene"  # shared with occ_eval_sweep.py
OUT = os.path.join(os.path.dirname(__file__), "..", "benchmarks")
ITERS = 10_000
SPC = 100
BATCH = 4096


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
