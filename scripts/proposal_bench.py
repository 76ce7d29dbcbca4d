"""Proposal-sampling presets on the hard-surface scene.

Head-to-head against the hierarchical rows of hard_scene_bench.json:
the proposal scheme buys hierarchical-style learned sample placement
WITHOUT the second full NeRF — the coarse pass shrinks from Nc
256-wide evaluations to Np probes of a 4x64 density MLP, and the main
net evaluates Nf points instead of the Nc+Nf union. The question this
table answers: how much of hierarchical's PSNR does proposal keep, at
what fraction of its wall clock — i.e. who wins quality-per-second.

Writes benchmarks/proposal_bench.json. Run on the TPU chip (expects
the hard scene from hard_scene_bench.py at /tmp/hard_scene/scene).
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
        datapath=SCENE, batch_size=4096, num_iters=10_000,
        steps_per_call=100, backend="pallas", compute_dtype="bf16",
        ckpt_loss=10**9, ckpt_images=10**9, ckpt_model=10**9,
    )
    prop = dict(proposal=True, Np=64, prop_Lp=6, prop_D=4, prop_H=64)
    occ = dict(occupancy=True, occ_R=64, occ_Nb=32, occ_update_every=16,
               occ_aabb=2.0)
    rows = [
        # quality challenger: same main-field budget as the flagship,
        # learned placement (vs hierarchical Nc=64 Nf=192 at ~300 s)
        run_one("proposal Np=64 Nf=128", TrainConfig(Nf=128, **prop, **base),
                rd),
        # hierarchical's fine budget without its coarse NeRF
        run_one("proposal Np=64 Nf=192", TrainConfig(Nf=192, **prop, **base),
                rd),
        # speed point: occ grid places the Np probes, proposal refines
        run_one("proposal+occ Np=64 Nf=64",
                TrainConfig(Nf=64, **prop, **occ, **base), rd),
    ]
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "proposal_bench.json"), "w") as fh:
        json.dump(rows, fh, indent=1)
    print("wrote benchmarks/proposal_bench.json")


if __name__ == "__main__":
    main()
