"""Real-dataset validation harness — armed and waiting for data.

The canonical NeRF datasets are unobtainable in this environment (zero
network egress — verified in docs/PERFORMANCE.md "Head-to-head"), so
the repo's quality numbers come from procedural scenes. THIS script is
the one-command path to the real-data tables the moment a dataset is
mounted: it probes ``--data_root`` for the standard layouts, trains
every applicable preset through the PRODUCTION CLI drivers
(train.train / evaluate.test — no bench-only shortcuts), and emits the
lego / fern / multiscale-lego PSNR tables.

Usage:
  make validate-real                      # probes ./data, full presets
  python scripts/validate_real.py --data_root /mnt/datasets
  python scripts/validate_real.py --tiny  # smoke scale (fixture tests)

Expected layouts under --data_root (scripts/download_data.sh fetches
them when egress exists):
  nerf_synthetic/lego/transforms_{train,val,test}.json + PNGs
  nerf_llff_data/fern/poses_bounds.npy + images/
Writes benchmarks/real_validation.json and prints a markdown table.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = os.path.join(os.path.dirname(__file__), "..", "benchmarks")

# scene probe file -> list of (row name, preset yaml, train overrides,
# test overrides). Presets are the repo's tuned configs; only paths and
# output dirs are overridden, so this validates exactly what a user
# would run.
LEGO = "nerf_synthetic/lego"
FERN = "nerf_llff_data/fern"
ROWS = [
    (LEGO, "transforms_train.json", "lego flagship (pallas bf16)",
     "configs/lego.yaml", {}, {}),
    (LEGO, "transforms_train.json", "lego occupancy preset",
     "configs/lego_occ.yaml", {}, {}),
    (LEGO, "transforms_train.json", "lego cpgrid preset",
     "configs/lego_cpgrid.yaml", {}, {}),
    (LEGO, "transforms_train.json", "lego hashgrid preset",
     "configs/lego_hashgrid.yaml", {}, {}),
    (LEGO, "transforms_train.json", "multiscale lego (mip pyramid)",
     "configs/lego_mip.yaml", {"mip_multiscale": True}, {}),
    (FERN, "poses_bounds.npy", "fern LLFF/NDC",
     "configs/llff_fern.yaml", {}, {}),
]

_PSNR_RE = re.compile(
    r"im (\d+): mse=([\d.eE+-]+) psnr=([\d.]+)(?: ssim=([\d.]+))?"
)


def run_row(name, preset, scene_dir, workdir, train_over, test_over,
            tiny=False):
    import yaml

    from nerf_simple_tpu.evaluate import test as test_cli
    from nerf_simple_tpu.train.loop import train as train_cli

    with open(preset) as fh:
        params = yaml.safe_load(fh)
    tp = params.pop("test_params")
    params.update(train_over)
    tp.update(test_over)
    params["datapath"] = tp["datapath"] = scene_dir
    params["savepath"] = os.path.join(workdir, "models")
    tp["loadpath"] = os.path.join(workdir, "models", params["exp_name"])
    tp["savepath"] = os.path.join(workdir, "results")
    params["log_dir"] = os.path.join(workdir, "logs")
    params.setdefault("val_idxs", [])
    params["ckpt_images"] = 10**9  # no mid-train renders in validation
    tp["animation"] = False
    if tiny:
        params.update(
            num_iters=20, batch_size=256, Nf=8, Nc=4, Np=8,
            steps_per_call=10, ckpt_loss=10**9, ckpt_model=10**9,
            num_train_imgs=2, backend="xla", compute_dtype="f32",
            occ_R=8, mip_levels=1,
        )
        tp.update(batch_size=1024, im_idxs=[0], Nf=8)

    train_cli(dict(params))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        test_cli(dict(tp))
    printed = buf.getvalue()
    sys.stdout.write(printed)
    views = []
    for m in _PSNR_RE.finditer(printed):
        views.append(
            {
                "im": int(m.group(1)),
                "mse": float(m.group(2)),
                "psnr": float(m.group(3)),
                **({"ssim": float(m.group(4))} if m.group(4) else {}),
            }
        )
    assert views, f"evaluate.test printed no PSNR lines for {name}"
    mean = sum(v["psnr"] for v in views) / len(views)
    return {
        "row": name,
        "preset": preset,
        "iters": params["num_iters"],
        "views": views,
        "mean_psnr": round(mean, 2),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", default="data")
    ap.add_argument("--workdir", default="/tmp/validate_real")
    ap.add_argument(
        "--tiny", action="store_true",
        help="smoke scale (20 iters, tiny nets) — the fixture-test mode",
    )
    ap.add_argument(
        "--only", default="",
        help="substring filter on row names (e.g. 'cpgrid')",
    )
    ap.add_argument(
        "--out", default=os.path.join(OUT, "real_validation.json")
    )
    args = ap.parse_args(argv)

    repo = os.path.join(os.path.dirname(__file__), "..")
    results, skipped = [], []
    for rel, probe, name, preset, t_over, e_over in ROWS:
        if args.only and args.only not in name:
            continue
        scene = os.path.join(args.data_root, rel)
        if not os.path.exists(os.path.join(scene, probe)):
            skipped.append((name, scene))
            continue
        wd = os.path.join(
            args.workdir, re.sub(r"[^a-z0-9]+", "_", name.lower())
        )
        os.makedirs(wd, exist_ok=True)
        print(f"=== {name} ({scene}) ===", flush=True)
        results.append(
            run_row(
                name, os.path.join(repo, preset), scene, wd,
                t_over, e_over, tiny=args.tiny,
            )
        )

    for name, scene in skipped:
        print(f"skipped {name!r}: no dataset at {scene}")
    if results:
        os.makedirs(OUT, exist_ok=True)
        with open(args.out, "w") as fh:
            json.dump({"tiny": args.tiny, "rows": results}, fh, indent=1)
        print(f"\nwrote {args.out}\n")
        print("| preset | iters | mean test PSNR |")
        print("|---|---|---|")
        for r in results:
            print(f"| {r['row']} | {r['iters']} | {r['mean_psnr']} dB |")
    elif not skipped:
        print("no rows matched --only filter")
    else:
        print(
            "\nNo datasets found. Mount them under --data_root (see "
            "scripts/download_data.sh) and re-run."
        )
    return results


if __name__ == "__main__":
    main()
