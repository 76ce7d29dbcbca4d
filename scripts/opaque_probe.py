"""Hypothesis probe: does an opaque tail on the INTERVAL compositing
path (mip-NeRF 360's `opaque_background` — extend the last frustum to
infinity, exactly the point path's 1e10 tail absorber) fix the
anti-aliased unbounded collapse (train 38 dB / test 13 dB,
benchmarks/unbounded_bench.json)?

Monkeypatches ops/volume's three interval functions BEFORE building the
XLA train step, so the whole mip x proposal composition (compositing,
proposal histogram, distortion with point-form tail exclusion) sees the
opaque tail. Throwaway — the real knob lands in config if this works.

Usage: python scripts/opaque_probe.py ITERS [DIST_W]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import nerf_simple_tpu.ops.volume as volume
from nerf_simple_tpu.ops.volume import CompositeOut, _distortion_core

SCENE = os.environ.get("UNB_SCENE", "/tmp/unb_scene_v3/scene")


def _patch():
    def composite_intervals(rgb_sigma, t_edges, t_mids, unit_dirs):
        deltas = t_edges[:, 1:] - t_edges[:, :-1]
        deltas = deltas.at[:, -1].set(1e10)
        deltas = deltas * jnp.linalg.norm(unit_dirs, axis=-1, keepdims=True)
        sigma = rgb_sigma[..., 3]
        alpha = 1.0 - jnp.exp(-jax.nn.softplus(sigma) * deltas)
        log_trans = jnp.log(jnp.maximum(1.0 - alpha, 1e-10))
        excl = jnp.cumsum(log_trans, axis=-1) - log_trans
        weights = alpha * jnp.exp(excl)
        rgb = jnp.sum(weights[..., None] * rgb_sigma[..., :3], axis=1)
        depth = jnp.sum(weights * t_mids, axis=-1)
        acc = jnp.sum(weights, axis=-1)
        disp = 1.0 / jnp.maximum(1e-10, depth / jnp.maximum(acc, 1e-10))
        return CompositeOut(rgb, disp, alpha, acc, weights, depth)

    def weights_from_sigma_intervals(sigma, edges, unit_dirs):
        deltas = edges[:, 1:] - edges[:, :-1]
        deltas = deltas.at[:, -1].set(1e10)
        deltas = deltas * jnp.linalg.norm(unit_dirs, axis=-1, keepdims=True)
        alpha = 1.0 - jnp.exp(-jax.nn.softplus(sigma) * deltas)
        log_trans = jnp.log(jnp.maximum(1.0 - alpha, 1e-10))
        excl = jnp.cumsum(log_trans, axis=-1) - log_trans
        return alpha * jnp.exp(excl)

    def distortion_loss_intervals(weights, edges):
        # tail now artificial -> excluded like the point form
        m = 0.5 * (edges[:, 1:] + edges[:, :-1])
        delta = edges[:, 1:] - edges[:, :-1]
        return _distortion_core(
            weights[:, :-1], m[:, :-1], delta[:, :-1]
        )

    volume.composite_intervals = composite_intervals
    volume.weights_from_sigma_intervals = weights_from_sigma_intervals
    volume.distortion_loss_intervals = distortion_loss_intervals


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    dist_w = float(sys.argv[2]) if len(sys.argv) > 2 else 0.01
    _patch()

    from nerf_simple_tpu.config import TrainConfig
    from nerf_simple_tpu.data.blender import load_blender
    from nerf_simple_tpu.data.dataset import RayDataset
    from nerf_simple_tpu.models import model_from_train_config
    from nerf_simple_tpu.models.proposal import proposal_from_train_config
    from nerf_simple_tpu.ops.rays import rays_for_poses
    from nerf_simple_tpu.render.renderer import (
        RenderSettings,
        render_rays_chunked,
    )
    from nerf_simple_tpu.train.metrics import img_psnr
    from nerf_simple_tpu.train.step import build_train_step, make_train_state

    if not os.path.exists(SCENE):
        from nerf_simple_tpu.data.synthetic import write_blender_scene

        write_blender_scene(
            SCENE, n_train=100, n_val=2, n_test=4, H=200, W=200,
            train_jitter=3, style="unbounded", camera_r_range=(3.0, 6.0),
        )
    data = load_blender(SCENE, half_res=False)
    rd = RayDataset.from_blender(data)
    cfg = TrainConfig(
        datapath=SCENE, Nf=128, batch_size=4096, num_iters=iters,
        steps_per_call=40, compute_dtype="bf16", backend="xla",
        ckpt_loss=10**9, ckpt_images=10**9, ckpt_model=10**9,
        tn=1.0, tf=30.0, sampling_space="disparity", contract=True,
        proposal=True, Np=64, mip=True, distortion_loss_weight=dist_w,
    )
    model = model_from_train_config(cfg)
    base_radius = 2.0 / 12.0**0.5 / float(data.f)
    state = make_train_state(jax.random.PRNGKey(0), cfg, model)
    step = build_train_step(cfg, model, donate=False, base_radius=base_radius)
    rays, pixels = rd.rays["train"], rd.pixels["train"]
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    for i in range(iters // cfg.steps_per_call):
        state, losses = step(state, rays, pixels, jax.random.fold_in(key, i))
    float(losses[-1])
    wall = round(time.time() - t0, 1)

    settings = RenderSettings(
        N=128, N_prop=cfg.Np, mip=True, base_radius=base_radius,
        tn=cfg.tn, tf=cfg.tf, sampling_space=cfg.sampling_space,
        compute_dtype=jnp.bfloat16, backend="xla",
    )
    prop_model = proposal_from_train_config(cfg)

    def psnrs(split, n):
        sp = data.splits[split]
        rr = rays_for_poses(
            jnp.asarray(sp.poses[:n]), data.H, data.W, data.f
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
        "probe": f"opaque_tail iters={iters} dist={dist_w} xla",
        "train_wall_s": wall,
        "test_psnr": psnrs("test", 4),
        "train_view_psnr": psnrs("train", 2),
    }
    print("PROBE " + json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
