"""Model-family head-to-head on the lego-scale procedural scene.

Trains one model family at the reference training protocol (batch 4096,
Nf 128, half-res eval at N=128 — configs/lego.yaml:6,12 +
utils/rendering.py:102 in the reference) and reports wall time +
test-split PSNR, so families can be compared at equal quality targets.

Usage:
  python scripts/family_compare.py <scene> <out_dir> --family hashgrid \
      --iters 2000
Writes <out_dir>/family_<family>_result.json.
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
    ap.add_argument("--family", default="hashgrid")
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--Nf", type=int, default=128)
    ap.add_argument("--eval_idxs", type=str, default="0,1")
    ap.add_argument("--dtype", type=str, default="bf16")
    ap.add_argument("--lr", type=float, default=0.0)  # 0 = family default
    ap.add_argument("--aabb", type=float, default=4.5)
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    from nerf_simple_tpu.config import TrainConfig
    from nerf_simple_tpu.data.blender import load_blender
    from nerf_simple_tpu.data.dataset import RayDataset
    from nerf_simple_tpu.models import model_from_train_config
    from nerf_simple_tpu.render.renderer import RenderSettings, render_image
    from nerf_simple_tpu.train.loop import train
    from nerf_simple_tpu.train.metrics import img_mse, img_psnr

    # per-family defaults: the fused Pallas train kernel exists for the
    # flagship MLP only (grid families run XLA — config.py rejects
    # pallas for them); decoder lr follows each family's paper defaults
    # (Instant-NGP trains everything at ~5e-3 with eps=1e-15; TensoRF
    # sec. 5 uses 1e-3 for the decoder and ~20x that for the factor
    # grids, which TrainConfig.cp_lr_grid supplies separately).
    lr = args.lr or {"hashgrid": 5e-3, "cpgrid": 1e-3}.get(
        args.family, 5e-4
    )
    cfg = TrainConfig(
        datapath=args.scene,
        savepath=args.out_dir,
        exp_name=f"family_{args.family}",
        lr_init=lr,
        lr_final=lr / 2,
        honor_lr_init=True,
        Nf=args.Nf,
        num_iters=args.iters,
        ckpt_model=10**9,
        ckpt_loss=200,
        ckpt_images=10**9,
        batch_size=args.batch,
        half_res=True,
        val_idxs=(),
        num_train_imgs=-1,
        model_family=args.family,
        hash_aabb=args.aabb,
        cp_aabb=args.aabb,
        backend="pallas" if args.family == "nerf" else "xla",
        compute_dtype=args.dtype,
        steps_per_call=100,
        log_dir=os.path.join(args.out_dir, "logs"),
    )
    t0 = time.perf_counter()
    state = train(cfg)
    train_s = time.perf_counter() - t0

    data = load_blender(args.scene, half_res=True)
    rd = RayDataset.from_blender(data)
    model = model_from_train_config(cfg)
    settings = RenderSettings(
        N=128, backend=cfg.backend, compute_dtype=cfg.render_dtype
    )
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
        print(f"{args.family} test im {idx}: mse={psnrs[idx]['mse']:.5f} "
              f"psnr={psnrs[idx]['psnr']:.2f}", flush=True)

    result = {
        "impl": f"nerf_simple_tpu family={args.family} "
                f"({cfg.backend}/{args.dtype}, 1x TPU v5e)",
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
        os.path.join(args.out_dir, f"family_{args.family}_result.json"), "w"
    ) as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
