"""Train OUR framework with the exact config of scripts/ref_compare/
ref_train.py (same scene, iterations, batch, Nf, lr schedule incl. the
hardcoded-5e-4 reference quirk) and evaluate test-split PSNR with eval
N=128 samples — the reference's render_image hardcodes N=128
(utils/rendering.py:102) regardless of the training Nf.

Writes <out_dir>/ours_<backend>_result.json.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("scene")
    ap.add_argument("out_dir")
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--Nf", type=int, default=64)
    ap.add_argument("--eval_idxs", type=str, default="0,1")
    ap.add_argument("--backend", type=str, default="pallas")
    ap.add_argument("--dtype", type=str, default="bf16")
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    from nerf_simple_tpu.config import TrainConfig
    from nerf_simple_tpu.data.blender import load_blender
    from nerf_simple_tpu.data.dataset import RayDataset
    from nerf_simple_tpu.models.nerf import NerfMLP
    from nerf_simple_tpu.render.renderer import RenderSettings, render_image
    from nerf_simple_tpu.train.loop import train
    from nerf_simple_tpu.train.metrics import img_mse, img_psnr

    tag = f"{args.backend}_{args.dtype}"
    cfg = TrainConfig(
        datapath=args.scene,
        savepath=args.out_dir,
        exp_name=f"ours_{tag}",
        lr_init=5e-4,
        lr_final=4e-4,
        Nf=args.Nf,
        num_iters=args.iters,
        ckpt_model=10**9,
        ckpt_loss=50,
        ckpt_images=10**9,
        batch_size=args.batch,
        half_res=True,
        val_idxs=(),
        num_train_imgs=-1,
        backend=args.backend,
        compute_dtype=args.dtype,
        steps_per_call=50,
        log_dir=os.path.join(args.out_dir, "logs"),
    )
    t0 = time.perf_counter()
    state = train(cfg)
    train_s = time.perf_counter() - t0

    # eval exactly like the reference: test split, N=128 samples, clip
    data = load_blender(args.scene, half_res=True)
    rd = RayDataset.from_blender(data)
    model = NerfMLP()
    settings = RenderSettings(N=128, backend=args.backend,
                              compute_dtype=cfg.render_dtype)
    psnrs = {}
    for idx in [int(i) for i in args.eval_idxs.split(",")]:
        rgb, _ = render_image(
            state.params, rd.rays["test"], rd.H, rd.W, idx,
            jax.random.PRNGKey(idx), settings, model, chunk=8192,
        )
        gt = np.asarray(rd.pixels["test"]).reshape(-1, rd.H, rd.W, 3)[
            idx : idx + 1
        ]
        psnrs[idx] = {
            "mse": float(img_mse(gt, rgb)),
            "psnr": float(img_psnr(gt, rgb)),
        }
        print(f"ours test im {idx}: mse={psnrs[idx]['mse']:.5f} "
              f"psnr={psnrs[idx]['psnr']:.2f}", flush=True)

    result = {
        "impl": f"nerf_simple_tpu ({args.backend}/{args.dtype}, 1x TPU v5e)",
        "scene": args.scene,
        "iters": args.iters,
        "batch": args.batch,
        "Nf": args.Nf,
        "train_seconds": round(train_s, 1),
        "test_psnr": psnrs,
        "mean_test_psnr": round(
            float(np.mean([v["psnr"] for v in psnrs.values()])), 3
        ),
    }
    with open(
        os.path.join(args.out_dir, f"ours_{tag}_result.json"), "w"
    ) as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
