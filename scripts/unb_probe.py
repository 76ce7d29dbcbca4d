"""One-off probe for the anti-aliased (mip x proposal) unbounded rows.

benchmarks/unbounded_bench.json shows the composition training at
1.06-1.08x the point recipe's wall but NOT generalizing (test 13-18 dB
vs 40.5-43.1). This probe varies the candidate knobs one at a time —
iteration budget (IPE damping slows high-frequency learning),
distortion weight (interval-form magnitude), proposal weight — and
prints a JSON row per run so the PERFORMANCE.md section can close the
question with numbers instead of guesses. Does NOT write benchmarks/.

Usage: python scripts/unb_probe.py ITERS DIST_W [PROP_W] [BLUR] [NP] [ANNEAL] [SPACE] [CONTRACT] [OPQ] [tag]
Reuses $UNB_SCENE (default /tmp/unb_scene_v3/scene) like unbounded_bench.
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
from nerf_simple_tpu.models import model_from_train_config
from nerf_simple_tpu.models.proposal import proposal_from_train_config
from nerf_simple_tpu.ops.rays import rays_for_poses
from nerf_simple_tpu.render.renderer import RenderSettings, render_rays_chunked
from nerf_simple_tpu.train.metrics import img_psnr
from nerf_simple_tpu.train.step import build_train_step, make_train_state

SCENE = os.environ.get("UNB_SCENE", "/tmp/unb_scene_v3/scene")


def main():
    iters = int(sys.argv[1])
    dist_w = float(sys.argv[2])
    prop_w = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    blur = float(sys.argv[4]) if len(sys.argv) > 4 else 0.01
    Np = int(sys.argv[5]) if len(sys.argv) > 5 else 64
    anneal = float(sys.argv[6]) if len(sys.argv) > 6 else 0.0
    space = sys.argv[7] if len(sys.argv) > 7 else "disparity"
    contract = bool(int(sys.argv[8])) if len(sys.argv) > 8 else True
    opq = bool(int(sys.argv[9])) if len(sys.argv) > 9 else False
    tag = sys.argv[10] if len(sys.argv) > 10 else ""
    data = load_blender(SCENE, half_res=False)
    rd = RayDataset.from_blender(data)
    cfg = TrainConfig(
        datapath=SCENE, Nf=128, batch_size=4096, num_iters=iters,
        steps_per_call=40, compute_dtype="bf16", backend="pallas",
        ckpt_loss=10**9, ckpt_images=10**9, ckpt_model=10**9,
        tn=1.0, tf=30.0, sampling_space=space, contract=contract,
        proposal=True, Np=Np, mip=True, resample_blur=blur,
        prop_anneal_frac=anneal, opaque_background=opq,
        distortion_loss_weight=dist_w, proposal_loss_weight=prop_w,
    )
    model = model_from_train_config(cfg)
    base_radius = 2.0 / 12.0**0.5 / float(data.f)
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

    settings = RenderSettings(
        N=128, N_prop=cfg.Np, mip=True, base_radius=base_radius,
        tn=cfg.tn, tf=cfg.tf, sampling_space=cfg.sampling_space,
        resample_blur=cfg.resample_blur,
        opaque_background=cfg.opaque_background,
        compute_dtype=jax.numpy.bfloat16, backend="pallas",
    )
    prop_model = proposal_from_train_config(cfg)

    def psnrs(split, n):
        sp = data.splits[split]
        rr = rays_for_poses(
            jax.numpy.asarray(sp.poses[:n]), data.H, data.W, data.f
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

    row = {
        "probe": tag
        or f"iters={iters} dist={dist_w} prop={prop_w} "
        f"blur={blur} Np={Np} anneal={anneal} {space} contract={contract}"
        f" opq={int(opq)}",
        "train_wall_s": wall,
        "test_psnr": psnrs("test", 4),
        "train_view_psnr": psnrs("train", 2),
    }
    print("PROBE " + json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
