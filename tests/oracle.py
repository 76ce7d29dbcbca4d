"""Float64 numpy oracle: the reference's math re-derived from its documented
behavior (SURVEY.md §2 component table), used as the golden model for parity
tests. Pure numpy, no torch, no JAX.
"""

from __future__ import annotations

import numpy as np


def gamma_np(x: np.ndarray, L: int) -> np.ndarray:
    """Per-channel [sin(2^i x), cos(2^i x)] interleaved by frequency
    (reference utils/xyz.py:6-14 behavior)."""
    outs = []
    for c in range(x.shape[-1]):
        xc = x[..., c : c + 1]
        per = []
        for i in range(L):
            per.append(np.sin(2.0**i * xc))
            per.append(np.cos(2.0**i * xc))
        outs.append(np.concatenate(per, axis=-1))
    return np.concatenate(outs, axis=-1)


def positional_encoder_np(vec: np.ndarray, Lp=10, Ld=4):
    xyz, d = vec[..., :3], vec[..., 3:]
    posx = np.concatenate([xyz, gamma_np(xyz, Lp)], axis=-1)
    posd = np.concatenate([d, gamma_np(d, Ld)], axis=-1)
    return posx, posd


def camera_ray_dirs_np(H: int, W: int, f: float) -> np.ndarray:
    """ray(r, c) = ((c - W//2)/f, -(r - H//2)/f, -1), row-major
    (reference utils/xyz.py:38-52 behavior)."""
    out = np.zeros((H, W, 3))
    for r in range(H):
        for c in range(W):
            out[r, c] = [(c - W // 2) / f, -(r - H // 2) / f, -1.0]
    return out.reshape(H * W, 3)


def spherical_to_pose_np(r, theta_deg, phi_deg):
    th, ph = np.radians(theta_deg), np.radians(phi_deg)
    trans = np.eye(4)
    trans[2, 3] = r
    tm = np.array(
        [
            [1, 0, 0, 0],
            [0, np.cos(th), np.sin(th), 0],
            [0, -np.sin(th), np.cos(th), 0],
            [0, 0, 0, 1],
        ]
    )
    pm = np.array(
        [
            [np.cos(ph), np.sin(ph), 0, 0],
            [-np.sin(ph), np.cos(ph), 0, 0],
            [0, 0, 1, 0],
            [0, 0, 0, 1],
        ]
    )
    return pm @ tm @ trans


def softplus_np(x):
    return np.logaddexp(0.0, x)


def composite_np(rgb_sigma: np.ndarray, ts: np.ndarray, unit_dirs: np.ndarray):
    """Reference volume_render behavior (utils/rendering.py:47-85) with an
    explicit python cumprod loop — deliberately naive."""
    B, N, _ = rgb_sigma.shape
    deltas = np.concatenate(
        [ts[:, 1:] - ts[:, :-1], np.full((B, 1), 1e10)], axis=-1
    )
    deltas = deltas * np.linalg.norm(unit_dirs, axis=-1, keepdims=True)
    sigma = rgb_sigma[..., 3]
    alpha = 1.0 - np.exp(-softplus_np(sigma) * deltas)
    weights = np.zeros_like(alpha)
    for b in range(B):
        T = 1.0
        for i in range(N):
            weights[b, i] = alpha[b, i] * T
            T = T * (1.0 - alpha[b, i] + 1e-10)
    rgb = np.sum(weights[..., None] * rgb_sigma[..., :3], axis=1)
    depth = np.sum(weights * ts, axis=-1)
    acc = np.sum(weights, axis=-1)
    disp = 1.0 / np.maximum(1e-10, depth / acc)
    return rgb, disp, alpha, acc, weights, depth


def mlp_forward_np(params, v: np.ndarray, Lp=10, Ld=4):
    """Reference Nerf.forward behavior (utils/nets.py:34-43) on a params
    pytree of numpy arrays keyed like models/nerf.py."""

    def dense(name, x):
        return x @ np.asarray(params[name]["w"]) + np.asarray(params[name]["b"])

    relu = lambda x: np.maximum(x, 0.0)
    posx, posd = positional_encoder_np(v, Lp, Ld)
    h = posx
    for name in ["trunk0", "trunk1", "trunk2", "trunk3", "trunk4"]:
        h = relu(dense(name, h))
    h = relu(dense("skip", np.concatenate([h, posx], axis=-1)))
    for name in ["post0", "post1"]:
        h = relu(dense(name, h))
    sigma = dense("sigma", h)
    feat = dense("feature", h)
    hc = relu(dense("color0", np.concatenate([feat, posd], axis=-1)))
    color = dense("color1", hc)
    return np.concatenate([color, sigma], axis=-1)


def render_rays_np(params, rays: np.ndarray, ts: np.ndarray, Lp=10, Ld=4):
    """Reference render_nerf behavior (utils/rendering.py:13-45) at given
    sample distances ts: unnormalized-dir sample placement, post-hoc dir
    normalization, MLP, compositing."""
    origins, dirs = rays[:, :3], rays[:, 3:]
    locs = origins[:, None, :] + dirs[:, None, :] * ts[..., None]
    unit = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    B, N = ts.shape
    q = np.concatenate(
        [locs, np.broadcast_to(unit[:, None, :], locs.shape)], axis=-1
    ).reshape(B * N, 6)
    out = mlp_forward_np(params, q, Lp, Ld).reshape(B, N, 4)
    return composite_np(out, ts, unit)
