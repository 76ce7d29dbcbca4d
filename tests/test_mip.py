"""Mip-NeRF cone casting: IPE encoder, frustum moments, interval
compositing, and the end-to-end mip train/render paths.

All closed forms are checked against independent numerical oracles:
Gauss-Hermite quadrature for the integrated encoding, Monte-Carlo
frustum sampling for the Gaussian moments, a literal python loop for
interval compositing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_simple_tpu.config import TestConfig, TrainConfig
from nerf_simple_tpu.models.nerf import NerfMLP, init_nerf_params
from nerf_simple_tpu.ops.encoding import gamma, gamma_ipe
from nerf_simple_tpu.ops.sampling import conical_gaussian
from nerf_simple_tpu.ops.volume import composite_intervals


def test_gamma_ipe_zero_variance_recovers_gamma(rng):
    x = rng.normal(0, 2, (16, 3)).astype(np.float32)
    a = gamma_ipe(jnp.asarray(x), jnp.zeros_like(jnp.asarray(x)), L=6)
    b = gamma(jnp.asarray(x), L=6)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gamma_ipe_matches_gauss_hermite_quadrature(rng):
    """E[sin/cos(2^i x)] under x ~ N(m, v) — the closed form is exact;
    64-node Gauss-Hermite integration must agree to float precision."""
    # variance/frequency kept inside Gauss-Hermite-64's accurate regime
    # (the 64-node rule itself aliases once f*sqrt(2v) >~ 10; the closed
    # form is exact everywhere — the limit here is the ORACLE's)
    m = rng.normal(0, 2, (8, 3)).astype(np.float64)
    v = rng.uniform(0.0, 0.2, (8, 3)).astype(np.float64)
    L = 4
    got = np.asarray(
        gamma_ipe(jnp.asarray(m, jnp.float32), jnp.asarray(v, jnp.float32), L)
    )
    nodes, wts = np.polynomial.hermite.hermgauss(64)
    # E[f(x)] = 1/sqrt(pi) * sum_i w_i f(m + sqrt(2 v) n_i)
    want = np.zeros((8, 3, L, 2))
    for i in range(L):
        f = 2.0**i
        xs = m[..., None] + np.sqrt(2 * v)[..., None] * nodes  # (8,3,64)
        want[..., i, 0] = (np.sin(f * xs) * wts).sum(-1) / np.sqrt(np.pi)
        want[..., i, 1] = (np.cos(f * xs) * wts).sum(-1) / np.sqrt(np.pi)
    np.testing.assert_allclose(got, want.reshape(8, 3 * 2 * L), atol=1e-4)


def test_gamma_ipe_damps_high_frequencies(rng):
    """With nonzero variance the high-octave features shrink toward 0 —
    the anti-aliasing mechanism itself."""
    m = jnp.asarray(rng.normal(0, 2, (32, 3)), jnp.float32)
    v = jnp.full_like(m, 0.25)
    enc = np.asarray(gamma_ipe(m, v, L=8)).reshape(32, 3, 8, 2)
    mags = np.abs(enc).mean(axis=(0, 1, 3))  # per-octave mean magnitude
    assert mags[-1] < 1e-4  # 4^7 * 0.25 / 2 ~ 2048 -> e^-2048
    assert mags[0] > 0.3  # low octave barely damped


def test_conical_gaussian_matches_monte_carlo(rng):
    """Frustum mean/variance vs 400k uniform-in-solid samples."""
    o = np.array([0.3, -0.2, 0.1])
    d = np.array([0.4, -0.5, -1.2])  # unnormalized, like the rays
    t0, t1, r = 2.3, 2.9, 0.02
    rays = jnp.asarray(np.concatenate([o, d])[None], jnp.float32)
    edges = jnp.asarray([[t0, t1]], jnp.float32)
    mean, var, t_mid = conical_gaussian(rays, edges, r)

    n = 400_000
    u = rng.uniform(size=n)
    # p(t) ~ area(t) ~ t^2 -> inverse-CDF of t^3
    t = (t0**3 + u * (t1**3 - t0**3)) ** (1.0 / 3.0)
    dn = d / np.linalg.norm(d)
    e1 = np.cross(dn, [0.0, 0.0, 1.0])
    e1 /= np.linalg.norm(e1)
    e2 = np.cross(dn, e1)
    rho = r * t * np.sqrt(rng.uniform(size=n))
    th = rng.uniform(0, 2 * np.pi, n)
    pts = (
        o
        + d * t[:, None]
        + e1 * (rho * np.cos(th))[:, None]
        + e2 * (rho * np.sin(th))[:, None]
    )
    np.testing.assert_allclose(
        np.asarray(mean)[0, 0], pts.mean(0), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(var)[0, 0], pts.var(0), rtol=0.02, atol=1e-7
    )
    # mu_t is the along-ray first moment in t units
    np.testing.assert_allclose(float(t_mid[0, 0]), t.mean(), rtol=1e-3)


def test_composite_intervals_matches_loop_oracle(rng):
    B, N = 8, 16
    rgb_sigma = rng.normal(0, 2, (B, N, 4)).astype(np.float32)
    edges = np.sort(rng.uniform(2, 6, (B, N + 1)), -1).astype(np.float32)
    mids = 0.5 * (edges[:, 1:] + edges[:, :-1])
    dirs = rng.normal(size=(B, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    out = composite_intervals(
        jnp.asarray(rgb_sigma), jnp.asarray(edges), jnp.asarray(mids),
        jnp.asarray(dirs),
    )
    # literal loop in float64
    sp = lambda x: np.log1p(np.exp(-np.abs(x))) + np.maximum(x, 0)
    for b in range(B):
        T = 1.0
        rgb = np.zeros(3)
        acc = depth = 0.0
        for i in range(N):
            delta = float(edges[b, i + 1] - edges[b, i])
            a = 1.0 - np.exp(-sp(float(rgb_sigma[b, i, 3])) * delta)
            w = a * T
            rgb += w * rgb_sigma[b, i, :3].astype(np.float64)
            depth += w * mids[b, i]
            acc += w
            T *= 1.0 - a
        np.testing.assert_allclose(np.asarray(out.rgb)[b], rgb, atol=1e-4)
        np.testing.assert_allclose(float(out.acc[b]), acc, atol=1e-5)
        np.testing.assert_allclose(
            float(out.depth[b]), depth, atol=1e-4
        )
    assert (np.asarray(out.acc) <= 1 + 1e-5).all()


def test_config_mip_exclusions():
    with pytest.raises(ValueError, match="mip=True is incompatible"):
        TrainConfig(datapath="x", mip=True, hierarchical=True)
    with pytest.raises(ValueError, match="mip=True is incompatible"):
        TrainConfig(datapath="x", mip=True, occupancy=True)
    with pytest.raises(ValueError, match="mip=True is incompatible"):
        TrainConfig(datapath="x", mip=True, model_family="hashgrid")
    with pytest.raises(ValueError, match="cone-cast eval"):
        TestConfig(loadpath="x", datapath="x", mip=True, Nc=8)
    from nerf_simple_tpu.train.step import build_train_step

    with pytest.raises(ValueError, match="base_radius"):
        build_train_step(TrainConfig(datapath="x", mip=True))


def test_mip_render_shapes_and_antialias_effect(rng):
    """Cone-cast render runs; widening the cone changes the output (the
    IPE features the MLP sees genuinely depend on footprint)."""
    from nerf_simple_tpu.render.renderer import RenderSettings, render_rays

    model = NerfMLP(Lp=6, Ld=2, H=32)
    params = init_nerf_params(jax.random.PRNGKey(0), model)
    rays = jnp.asarray(
        np.concatenate(
            [rng.normal(0, 0.1, (16, 3)), rng.normal(size=(16, 3))], -1
        ),
        jnp.float32,
    )
    key = jax.random.PRNGKey(1)
    narrow = render_rays(
        params, rays, key,
        RenderSettings(N=16, mip=True, base_radius=1e-4), model,
    )
    wide = render_rays(
        params, rays, key,
        RenderSettings(N=16, mip=True, base_radius=0.3), model,
    )
    assert narrow.rgb.shape == (16, 3) and narrow.weights.shape == (16, 16)
    assert np.isfinite(np.asarray(narrow.rgb)).all()
    assert np.abs(np.asarray(wide.rgb) - np.asarray(narrow.rgb)).max() > 1e-4


@pytest.mark.slow
def test_mip_train_learns_and_eval_renders(tmp_path):
    """Driver e2e: mip training converges on the tiny scene and the eval
    CLI renders a cone-cast frame from the checkpoint."""
    import os

    from nerf_simple_tpu.data.synthetic import write_blender_scene
    from nerf_simple_tpu.evaluate import test as run_eval
    from nerf_simple_tpu.train.loop import train

    root = str(tmp_path)
    scene = os.path.join(root, "scene")
    write_blender_scene(scene, n_train=4, n_val=1, n_test=1, H=24, W=24)
    state = train(
        TrainConfig(
            datapath=scene,
            savepath=os.path.join(root, "models"),
            exp_name="mip",
            Nf=16,
            mip=True,
            net_Lp=6,
            net_Ld=2,
            net_H=32,
            num_iters=60,
            batch_size=128,
            steps_per_call=20,
            half_res=False,
            ckpt_loss=1000,
            ckpt_images=10**9,
            ckpt_model=10**9,
            log_dir=os.path.join(root, "logs"),
        )
    )
    assert int(state.step) == 60
    run_eval(
        TestConfig(
            loadpath=os.path.join(root, "models", "mip"),
            datapath=scene,
            savepath=os.path.join(root, "results"),
            exp_name="mip",
            batch_size=576,
            half_res=False,
            im_set="test",
            im_idxs=(0,),
            animation=False,
            N_samples=16,
            mip=True,
        )
    )
    assert os.path.exists(os.path.join(root, "results", "mip", "rgb_0.png"))
