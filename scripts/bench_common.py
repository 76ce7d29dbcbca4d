"""Shared train-and-score harness for the benchmark scripts.

One definition of the timed chunk loop, steady-wall estimate, and
held-out PSNR eval (hierarchical presets render their own
coarse->importance->fine path; everything else the reference N=128
stratified setting) so occ_train_bench.py and hard_scene_bench.py
cannot drift apart.
"""

from __future__ import annotations

import time

import jax
import numpy as np

from nerf_simple_tpu.config import TrainConfig
from nerf_simple_tpu.models import model_from_train_config
from nerf_simple_tpu.render.renderer import RenderSettings, render_rays_chunked
from nerf_simple_tpu.train.metrics import img_psnr
from nerf_simple_tpu.train.step import build_train_step, make_train_state


def run_one(name: str, cfg: TrainConfig, rd, n_eval_views: int = 2) -> dict:
    """Train cfg to cfg.num_iters on rd's train split; return a result
    row with steady-state wall (compile chunk excluded) and held-out
    test PSNR."""
    model = model_from_train_config(cfg)
    key = jax.random.PRNGKey(0)
    state = make_train_state(key, cfg, model)
    step_fn = build_train_step(cfg, model, donate=False)
    rays, pixels = rd.rays["train"], rd.pixels["train"]
    state, losses = step_fn(state, rays, pixels, jax.random.fold_in(key, 0))
    float(losses[-1])  # compile + first chunk outside the timed window
    t0 = time.time()
    n_chunks = cfg.num_iters // cfg.steps_per_call
    for i in range(1, n_chunks):
        state, losses = step_fn(state, rays, pixels, jax.random.fold_in(key, i))
    final_loss = float(losses[-1])
    steady_s = time.time() - t0
    iters_timed = (n_chunks - 1) * cfg.steps_per_call
    rays_per_sec = cfg.batch_size * iters_timed / max(steady_s, 1e-9)

    # hierarchical/proposal nets evaluate on their OWN path: the fine net
    # trains on surface-concentrated samples, so a plain stratified eval
    # is off-distribution for it
    es = RenderSettings(
        N=128,
        N_coarse=cfg.Nc if cfg.hierarchical else 0,
        N_prop=cfg.Np if cfg.proposal else 0,
        compute_dtype=cfg.render_dtype,
        backend=cfg.backend,
    )
    prop_model = None
    if cfg.proposal:
        from nerf_simple_tpu.models.proposal import proposal_from_train_config

        prop_model = proposal_from_train_config(cfg)
    n = rd.H * rd.W
    psnrs = []
    for ti in range(n_eval_views):
        test_rays = rd.rays["test"][ti * n : (ti + 1) * n]
        gt = np.asarray(rd.pixels["test"][ti * n : (ti + 1) * n]).reshape(
            1, rd.H, rd.W, 3
        )
        rgb, _ = render_rays_chunked(
            state.params, test_rays, jax.random.PRNGKey(1), es, model,
            prop_model=prop_model,
        )
        psnrs.append(
            float(img_psnr(gt, np.asarray(rgb).reshape(1, rd.H, rd.W, 3)))
        )
    row = {
        "config": name,
        "Nf": cfg.Nf,
        "occupancy": cfg.occupancy,
        "hierarchical": cfg.hierarchical,
        "proposal": cfg.proposal,
        "iters": cfg.num_iters,
        "steady_wall_s_full_run_est": round(
            steady_s * n_chunks / max(n_chunks - 1, 1), 1
        ),
        "rays_per_sec": round(rays_per_sec),
        "final_loss": final_loss,
        "test_psnr": [round(p, 2) for p in psnrs],
    }
    print(row, flush=True)
    return row
