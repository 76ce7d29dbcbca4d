"""CP-grid family benchmark: step-time matrix + convergence curves.

Closes the loop on the family's design thesis (models/cpgrid.py): the
hash family is capped by the TPU gather op-rate (~5 ns/row — measured,
docs/PERFORMANCE.md "Hash-grid family"), while CP line interpolation is
hat-basis MATMULS with dense MXU table gradients. This script measures
whether matmul-grids actually beat gather-grids end-to-end on v5e:

- ``steptime``: ms/iter at batch 4096 for the preset and ablations
  (sample count, rank, level count), plus a same-session flagship
  reference row — the apples-to-apples counterpart of the hash family's
  step-time matrix.
- ``smooth`` / ``hard``: held-out PSNR vs training wall on the
  elevation-jittered procedural scene (the hashgrid_bench fixture, so
  curves align with benchmarks/hashgrid_bench.json) and on the
  hard-surface low-occupancy scene (the hard_scene_bench fixture).

Writes/merges benchmarks/cpgrid_bench.json. Run on the TPU chip:
  python scripts/cpgrid_bench.py steptime
  python scripts/cpgrid_bench.py smooth
  python scripts/cpgrid_bench.py hard
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

from nerf_simple_tpu.config import TrainConfig
from nerf_simple_tpu.data.blender import load_blender
from nerf_simple_tpu.data.dataset import RayDataset
from nerf_simple_tpu.data.synthetic import write_blender_scene
from nerf_simple_tpu.models import model_from_train_config
from nerf_simple_tpu.train.step import build_train_step, make_train_state

OUT = os.path.join(os.path.dirname(__file__), "..", "benchmarks")
SMOOTH_SCENE = "/tmp/hash_bench/scene"  # hashgrid_bench fixture (shared)
HARD_SCENE = "/tmp/hard_scene/scene"  # hard_scene_bench fixture (shared)
BATCH = 4096


def _merge(key: str, value) -> None:
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, "cpgrid_bench.json")
    merged = {}
    if os.path.exists(path):
        with open(path) as fh:
            merged = json.load(fh)
    merged[key] = value
    with open(path, "w") as fh:
        json.dump(merged, fh, indent=1)
    print(f"merged {key!r} into benchmarks/cpgrid_bench.json")


def measure_steptime(cfg: TrainConfig, n_iters: int = 600) -> float:
    """Steady-state ms/iter on synthetic HBM-resident rays (the sampler
    draws from them exactly like a real dataset; geometry content does
    not affect step time)."""
    model = model_from_train_config(cfg)
    key = jax.random.PRNGKey(0)
    rays = jax.random.normal(jax.random.PRNGKey(1), (131072, 6))
    pixels = jax.random.uniform(jax.random.PRNGKey(2), (131072, 3))
    state = make_train_state(key, cfg, model)
    step_fn = build_train_step(cfg, model, donate=False)
    state, losses = step_fn(state, rays, pixels, jax.random.fold_in(key, 0))
    float(losses[-1])  # compile + warmup outside the timed window
    n_calls = max(2, n_iters // cfg.steps_per_call)
    t0 = time.time()
    for i in range(1, 1 + n_calls):
        state, losses = step_fn(state, rays, pixels, jax.random.fold_in(key, i))
    float(losses[-1])  # one sync at the end (tunnel enqueue is ~50 ms)
    return (time.time() - t0) * 1000.0 / (n_calls * cfg.steps_per_call)


def steptime_matrix() -> None:
    base = dict(
        datapath="bench", batch_size=BATCH, num_iters=10_000,
        steps_per_call=100, ckpt_loss=10**9, ckpt_images=10**9,
        ckpt_model=10**9, honor_lr_init=True, lr_init=1e-3, lr_final=1e-4,
    )
    cp = dict(model_family="cpgrid", backend="xla", compute_dtype="bf16")
    rows = []

    def add(name, cfg):
        ms = measure_steptime(cfg)
        rows.append({"config": name, "ms_per_iter": round(ms, 1)})
        print(rows[-1], flush=True)

    add("cpgrid preset Rs=(64,256) C=32/96 Nf=128",
        TrainConfig(Nf=128, **cp, **base))
    add("cpgrid Nf=32", TrainConfig(Nf=32, **cp, **base))
    add("cpgrid single-level Rs=(256,) Nf=128",
        TrainConfig(Nf=128, cp_Rs=(256,), **cp, **base))
    add("cpgrid low-rank C=16/48 Nf=128",
        TrainConfig(Nf=128, cp_Cs=16, cp_Ca=48, **cp, **base))
    add("cpgrid f32 Nf=128",
        TrainConfig(Nf=128, model_family="cpgrid", backend="xla",
                    compute_dtype="f32", **base))
    # same-session references: the flagship fused kernel and the hash
    # family's TPU preset (its PERFORMANCE numbers were a different
    # session; hashgrid needs spc<=20 — see config warning)
    add("flagship MLP (pallas bf16) Nf=128",
        TrainConfig(Nf=128, backend="pallas", compute_dtype="bf16", **base))
    hash_base = dict(base, steps_per_call=10)
    add("hashgrid TPU preset (L=4 F=8 occ Nf=32, exact fwd)",
        TrainConfig(Nf=32, model_family="hashgrid", backend="xla",
                    compute_dtype="f32", hash_L=4, hash_F=8,
                    occupancy=True, occ_R=64, occ_Nb=64, **hash_base))
    _merge("steptime_batch4096", rows)


def convergence(which: str) -> None:
    from hashgrid_bench import run_family  # same harness, curves align

    scene = SMOOTH_SCENE if which == "smooth" else HARD_SCENE
    style = "blobs" if which == "smooth" else "hard"
    if not os.path.exists(scene):
        os.makedirs(os.path.dirname(scene), exist_ok=True)
        write_blender_scene(
            scene, n_train=25, n_val=2, n_test=2, H=400, W=400,
            train_jitter=3, style=style,
        )
    data = load_blender(scene, half_res=True)
    rd = RayDataset.from_blender(data)
    cfg = TrainConfig(
        datapath=scene, batch_size=BATCH, model_family="cpgrid",
        backend="xla", compute_dtype="bf16", honor_lr_init=True,
        lr_init=1e-3, lr_final=1e-4, Nf=128, num_iters=4000,
        steps_per_call=50, ckpt_loss=10**9, ckpt_images=10**9,
        ckpt_model=10**9,
    )
    res = run_family(cfg, rd, (100, 250, 500, 1000, 2000, 4000))
    _merge(which, res)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "steptime"
    if which == "steptime":
        steptime_matrix()
    else:
        convergence(which)
