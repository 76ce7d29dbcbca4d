"""Train the ACTUAL torch reference (/root/reference) on a given scene, CPU.

Real-data substitute harness (VERDICT.md item 1): network egress is blocked
in this environment (DNS resolution fails for every host; see
docs/PERFORMANCE.md "Real-data blocker"), so instead of the canonical
nerf_synthetic lego scene we train BOTH implementations — the reference
(imported from /root/reference, unmodified, .cuda() no-op'd) and ours — on
the identical procedural Blender-format scene at identical config, and
compare test-split PSNR at equal iteration count.

Usage:
  python scripts/ref_compare/ref_train.py <scene_dir> <out_dir> \
      [--iters N] [--batch B] [--Nf N] [--eval_idxs 0,1,2,3]

Writes <out_dir>/ref_result.json with per-view test PSNR + train wall time.
No reference code is copied; the reference modules are imported read-only.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import torch

REF = "/root/reference"

# .cuda() -> identity (no GPU in this container); same shim as
# tests/test_reference_parity.py
torch.Tensor.cuda = lambda self, *a, **k: self
torch.nn.Module.cuda = lambda self, *a, **k: self

# natsort is not installed in this image; the reference only uses
# natsort_keygen(alg=ns.IGNORECASE) as a filename sort key
# (/root/reference/utils/dataload.py:34) — shim the equivalent.
import re as _re  # noqa: E402
import types as _types  # noqa: E402

_ns_mod = _types.ModuleType("natsort")
_ns_mod.ns = _types.SimpleNamespace(IGNORECASE=1)
_ns_mod.natsort_keygen = lambda alg=0: (
    lambda s: [
        int(t) if t.isdigit() else t.lower()
        for t in _re.split(r"(\d+)", str(s))
    ]
)
sys.modules["natsort"] = _ns_mod

sys.path.insert(0, REF)
import importlib.util as _ilu  # noqa: E402

_spec = _ilu.spec_from_file_location("ref_train_mod", os.path.join(REF, "train.py"))
ref_train_mod = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(ref_train_mod)
from utils.dataload import RayGenerator  # noqa: E402
from utils.nets import Nerf  # noqa: E402
from utils.rendering import render_image  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("scene")
    ap.add_argument("out_dir")
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--Nf", type=int, default=64)
    ap.add_argument("--eval_idxs", type=str, default="0,1")
    ap.add_argument("--half_res", action="store_true", default=True)
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    torch.manual_seed(0)
    params = {
        "datapath": args.scene,
        "savepath": args.out_dir,
        "exp_name": "ref",
        "lr_init": 5e-4,
        "lr_final": 4e-4,
        "Nf": args.Nf,
        "num_iters": args.iters,
        "ckpt_model": 10**9,
        "ckpt_loss": 50,
        "ckpt_images": 10**9,
        "batch_size": args.batch,
        "half_res": args.half_res,
        "val_idxs": [],  # skip in-loop image renders (CPU cost)
        # -1 = use every image per split; the procedural scene has exactly
        # 25 train images but only 2 val/test, so a positive num_imgs
        # (which truncates ALL splits, dataload.py:55-61) would IndexError
        "num_train_imgs": -1,
    }
    t0 = time.perf_counter()
    ref_train_mod.train(params)
    train_s = time.perf_counter() - t0

    # evaluate: test-split PSNR with the reference's own render_image
    pth = sorted(
        os.listdir(os.path.join(args.out_dir, "ref")),
        key=lambda n: os.path.getmtime(os.path.join(args.out_dir, "ref", n)),
    )[-1]
    net = Nerf()
    net.load_state_dict(
        torch.load(os.path.join(args.out_dir, "ref", pth), map_location="cpu")
    )
    rg = RayGenerator(args.scene, args.half_res, -1)
    psnrs = {}
    with torch.no_grad():
        for idx in [int(i) for i in args.eval_idxs.split(",")]:
            # batch must divide H*W: the reference's render_image drops
            # remainder rays (rendering.py:100) and its reshape would fail
            rgb, depth, gt = render_image(
                net, rg, batch_size=8000, im_idx=idx, im_set="test"
            )
            mse = float(ref_train_mod.img_mse(gt, rgb))
            psnr = float(ref_train_mod.img_psnr(gt, rgb))
            psnrs[idx] = {"mse": mse, "psnr": psnr}
            print(f"ref test im {idx}: mse={mse:.5f} psnr={psnr:.2f}", flush=True)

    result = {
        "impl": "reference (torch CPU, 1 core)",
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
    with open(os.path.join(args.out_dir, "ref_result.json"), "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
