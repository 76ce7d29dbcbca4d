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


def test_cylinder_moments_match_monte_carlo(rng):
    """NDC cylinder Gaussian (mip-NeRF cylinder_to_gaussian) vs 400k
    uniform-in-cylinder samples."""
    from nerf_simple_tpu.ops.sampling import conical_gaussian

    o = np.array([0.1, -0.3, 0.2])
    d = np.array([0.5, -0.2, -1.1])
    t0, t1, r = 0.2, 0.55, 0.03
    rays = jnp.asarray(np.concatenate([o, d])[None], jnp.float32)
    edges = jnp.asarray([[t0, t1]], jnp.float32)
    mean, var, t_mid = conical_gaussian(rays, edges, r, shape="cylinder")

    n = 400_000
    t = rng.uniform(t0, t1, n)  # uniform along axis for a cylinder
    dn = d / np.linalg.norm(d)
    e1 = np.cross(dn, [0.0, 0.0, 1.0])
    e1 /= np.linalg.norm(e1)
    e2 = np.cross(dn, e1)
    rho = r * np.sqrt(rng.uniform(size=n))  # radius constant in t
    th = rng.uniform(0, 2 * np.pi, n)
    pts = (
        o
        + d * t[:, None]
        + e1 * (rho * np.cos(th))[:, None]
        + e2 * (rho * np.sin(th))[:, None]
    )
    np.testing.assert_allclose(np.asarray(mean)[0, 0], pts.mean(0), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(var)[0, 0], pts.var(0), rtol=0.02, atol=1e-8
    )
    np.testing.assert_allclose(float(t_mid[0, 0]), t.mean(), rtol=1e-3)


def test_mip_ray_radii_recovers_pinhole_scalar():
    """On an ideal pinhole grid, direction neighbor-spacing radii equal
    the drivers' scalar 2/sqrt(12)/f everywhere."""
    from nerf_simple_tpu.ops.rays import mip_ray_radii, rays_for_poses

    H, W, f = 12, 16, 40.0
    pose = jnp.eye(4)[None]
    rays = rays_for_poses(pose, H, W, f)
    radii = np.asarray(mip_ray_radii(rays, H, W, use_origins=False))
    np.testing.assert_allclose(
        radii, 2.0 / np.sqrt(12.0) / f, rtol=1e-5
    )


def test_mip_serving_exclusivity_and_normals_col_tolerance(rng):
    """Review pins: (a) RenderServer rejects mip+occupancy/proposal
    (cone casting draws its own edges — previously crashed or silently
    dropped mip at request time); (b) render_normals_chunked tolerates
    the 8-column mip rays (it renders point samples; extra columns must
    be stripped, not consumed as direction components)."""
    from nerf_simple_tpu.render.renderer import (
        RenderSettings,
        render_normals_chunked,
    )
    from nerf_simple_tpu.serve import RenderServer

    model = NerfMLP(Lp=2, Ld=2, H=32)
    params = init_nerf_params(jax.random.PRNGKey(0), model)
    with pytest.raises(ValueError, match="mip serving excludes"):
        RenderServer(
            params, 8, 8, 10.0,
            RenderSettings(N=4, mip=True, base_radius=0.01),
            model, warmup=False, occupancy=True,
        )

    rays8 = jnp.asarray(
        np.concatenate(
            [
                rng.normal(0, 0.1, (8, 3)),
                rng.normal(size=(8, 3)),
                rng.uniform(0.01, 0.1, (8, 1)),
                np.ones((8, 1)),
            ],
            -1,
        ),
        jnp.float32,
    )
    nrm = render_normals_chunked(
        params, rays8, jax.random.PRNGKey(1),
        RenderSettings(N=4, mip=True, base_radius=0.01), model, chunk=8,
    )
    assert nrm.shape == (8, 3) and np.isfinite(np.asarray(nrm)).all()


def test_multiscale_rejects_nondivisible_resolution():
    """H/W not divisible by the coarsest pyramid scale would silently
    shear coarse-scale rays off the INTER_AREA block centers."""
    from nerf_simple_tpu.data.blender import BlenderData, BlenderSplit
    from nerf_simple_tpu.data.dataset import multiscale_train_arrays

    split = BlenderSplit(
        images=np.zeros((1, 100, 100, 3), np.float32),
        poses=np.eye(4)[None].astype(np.float32),
    )
    data = BlenderData(splits={"train": split}, H=100, W=100, f=50.0)
    with pytest.raises(ValueError, match="divisible"):
        multiscale_train_arrays(data, 0.01)


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


def test_fused_mip_forward_matches_nerf_apply_mip(rng):
    """The fused kernel's in-kernel IPE encoder (Sv spread matmul +
    exp damp; kernels/mlp.py mip=True) must reproduce the XLA
    nerf_apply_mip forward bitwise-close (f32, interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu

    from nerf_simple_tpu.kernels.mlp import fused_mlp_forward, pack_weights
    from nerf_simple_tpu.models.nerf import nerf_apply_mip

    model = NerfMLP(Lp=6, Ld=2, H=32)
    params = init_nerf_params(jax.random.PRNGKey(0), model)
    rows = 128
    mean = rng.normal(0, 1, (rows, 3)).astype(np.float32)
    var = rng.uniform(0, 0.3, (rows, 3)).astype(np.float32)
    dirs = rng.normal(size=(rows, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    want = np.asarray(
        nerf_apply_mip(
            params, jnp.asarray(mean), jnp.asarray(var), jnp.asarray(dirs),
            model,
        )
    )

    x16 = np.zeros((16, rows), np.float32)
    x16[0:3] = mean.T
    x16[3:6] = dirs.T
    x16[11:14] = var.T
    wts = pack_weights(params, model=model)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            fused_mlp_forward(
                wts, jnp.asarray(x16), 128, jnp.float32, model, True
            )
        )
    np.testing.assert_allclose(got[:4].T, want, atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_fused_mip_train_step_matches_xla_loss_and_grads(rng):
    """pallas+mip build_train_step core vs the XLA autodiff mip loss:
    identical edges -> matching loss and parameter gradients (f32,
    interpret mode). Covers the interval compositing (finite deltas, no
    1e10 tail) and the damped-posx backward in one go."""
    from jax.experimental.pallas import tpu as pltpu

    from nerf_simple_tpu.kernels.mlp import fused_train_step, pack_weights
    from nerf_simple_tpu.models.nerf import nerf_apply_mip
    from nerf_simple_tpu.ops.sampling import stratified_ts

    B, N, tile = 8, 16, 128
    base_radius = 0.05
    model = NerfMLP(Lp=6, Ld=2, H=32)
    params = init_nerf_params(jax.random.PRNGKey(0), model)
    rays = jnp.asarray(
        np.concatenate(
            [rng.normal(0, 0.1, (B, 3)), rng.normal(size=(B, 3))], -1
        ),
        jnp.float32,
    )
    gt = jnp.asarray(rng.uniform(0, 1, (B, 3)), jnp.float32)
    edges = stratified_ts(jax.random.PRNGKey(1), B, N + 1, 2.0, 6.0)

    def xla_loss(p):
        mean, var, t_mids = conical_gaussian(rays, edges, base_radius)
        unit = rays[:, 3:] / jnp.linalg.norm(
            rays[:, 3:], axis=-1, keepdims=True
        )
        out = nerf_apply_mip(
            p,
            mean.reshape(B * N, 3),
            var.reshape(B * N, 3),
            jnp.broadcast_to(unit[:, None, :], (B, N, 3)).reshape(B * N, 3),
            model,
        ).reshape(B, N, 4)
        comp = composite_intervals(out, edges, t_mids, unit)
        return jnp.mean((comp.rgb - gt) ** 2)

    ref_loss, ref_grads = jax.value_and_grad(xla_loss)(params)

    from nerf_simple_tpu.ops.sampling import frustum_moments

    oT, dT = rays[:, :3].T, rays[:, 3:].T
    n2 = jnp.sum(dT * dT, axis=0, keepdims=True)
    unitT = dT / jnp.sqrt(n2)
    t0, t1 = edges[:, :-1], edges[:, 1:]
    mu_t, sig_t2, sig_r2 = frustum_moments(t0, t1, base_radius)
    meanT = oT[:, :, None] + dT[:, :, None] * mu_t[None]
    d2T = dT * dT
    varT = (
        sig_t2[None] * d2T[:, :, None]
        + sig_r2[None] * (1.0 - d2T / n2)[:, :, None]
    )
    x16 = jnp.concatenate(
        [
            meanT,
            jnp.broadcast_to(unitT[:, :, None], (3, B, N)),
            (t1 - t0)[None],
            jnp.zeros((1, B, N)),
            jnp.broadcast_to(gt.T[:, :, None], (3, B, N)),
            varT,
            jnp.ones((1, B, N)),  # row 14: per-ray loss weight
            jnp.zeros((1, B, N)),
        ],
        axis=0,
    ).reshape(16, B * N)

    def kern(p):
        wts, vjp_fn = jax.vjp(
            lambda pp: pack_weights(pp, model=model), p
        )
        loss, dwts = fused_train_step(
            wts, x16, N, tile, jnp.float32, model=model, mip=True
        )
        return loss, vjp_fn(dwts)[0]

    with pltpu.force_tpu_interpret_mode():
        k_loss, k_grads = kern(params)

    np.testing.assert_allclose(float(k_loss), float(ref_loss), rtol=1e-4)
    for layer in ref_grads:
        for kk in ("w", "b"):
            np.testing.assert_allclose(
                np.asarray(k_grads[layer][kk]),
                np.asarray(ref_grads[layer][kk]),
                atol=1e-5,
                rtol=2e-3,
                err_msg=f"{layer}/{kk}",
            )


def test_mip_render_pallas_matches_xla(rng):
    """render_rays(mip) with backend='pallas' (fused IPE forward + XLA
    interval compositing) vs backend='xla': identical rgb/depth (f32,
    interpret mode, same key -> same edges)."""
    from jax.experimental.pallas import tpu as pltpu

    from nerf_simple_tpu.render.renderer import RenderSettings, render_rays

    model = NerfMLP(Lp=6, Ld=2, H=32)
    params = init_nerf_params(jax.random.PRNGKey(0), model)
    B = 8
    rays = jnp.asarray(
        np.concatenate(
            [rng.normal(0, 0.1, (B, 3)), rng.normal(size=(B, 3))], -1
        ),
        jnp.float32,
    )
    key = jax.random.PRNGKey(3)
    sx = RenderSettings(N=16, mip=True, base_radius=0.04, backend="xla")
    sp = RenderSettings(N=16, mip=True, base_radius=0.04, backend="pallas")
    a = render_rays(params, rays, key, sx, model)
    with pltpu.force_tpu_interpret_mode():
        b = render_rays(params, rays, key, sp, model)
    np.testing.assert_allclose(
        np.asarray(a.rgb), np.asarray(b.rgb), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(a.depth), np.asarray(b.depth), atol=1e-5, rtol=1e-5
    )


def test_resample_edges_tracks_weight_histogram(rng):
    """Inverse-CDF fine edges: sorted, in-bounds, and the per-interval
    draw counts match the dilated+padded histogram's expected counts."""
    from nerf_simple_tpu.ops.sampling import resample_edges

    B, N, Nf = 4, 16, 4096
    edges = jnp.broadcast_to(jnp.linspace(2.0, 6.0, N + 1), (B, N + 1))
    w = np.zeros((B, N), np.float32)
    w[:, 5] = 10.0  # one dominant interval
    w[:, 11] = 5.0
    out = np.asarray(
        resample_edges(
            jax.random.PRNGKey(0), edges, jnp.asarray(w), Nf, blur=0.01
        )
    )
    assert out.shape == (B, Nf + 1)
    assert (np.diff(out, axis=-1) >= 0).all()
    assert (out >= 2.0 - 1e-5).all() and (out <= 6.0 + 1e-5).all()
    # expected mass after the paper's 2-tap max dilation + padding
    wpad = np.concatenate([w[:, :1], w, w[:, -1:]], -1)
    wmax = np.maximum(wpad[:, :-1], wpad[:, 1:])
    wd = 0.5 * (wmax[:, :-1] + wmax[:, 1:]) + 0.01
    pdf = wd / wd.sum(-1, keepdims=True)
    grid = np.asarray(edges[0])
    for b in range(B):
        counts, _ = np.histogram(out[b], bins=grid)
        np.testing.assert_allclose(
            counts / (Nf + 1), pdf[b], atol=0.02
        )


def test_mip_two_level_render_runs_and_differs(rng):
    """mip_levels=2 resamples the fine pass onto the coarse histogram —
    output shape unchanged, values differ from single-level."""
    from nerf_simple_tpu.render.renderer import RenderSettings, render_rays

    model = NerfMLP(Lp=6, Ld=2, H=32)
    params = init_nerf_params(jax.random.PRNGKey(0), model)
    rays = jnp.asarray(
        np.concatenate(
            [rng.normal(0, 0.1, (8, 3)), rng.normal(size=(8, 3))], -1
        ),
        jnp.float32,
    )
    key = jax.random.PRNGKey(1)
    s1 = RenderSettings(N=16, mip=True, base_radius=0.05)
    s2 = RenderSettings(N=16, mip=True, base_radius=0.05, mip_levels=2)
    a = render_rays(params, rays, key, s1, model)
    b = render_rays(params, rays, key, s2, model)
    assert b.rgb.shape == (8, 3) and b.weights.shape == (8, 16)
    assert np.isfinite(np.asarray(b.rgb)).all()
    assert np.abs(np.asarray(a.rgb) - np.asarray(b.rgb)).max() > 1e-6


@pytest.mark.slow
def test_fused_two_level_mip_matches_xla_loss_and_grads(rng):
    """pallas mip_levels=2 core (two fused passes, shared packed
    weights, kernel-weights resampling) vs the XLA autodiff two-level
    loss: same key stream -> matching loss and gradients (f32,
    interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu

    from nerf_simple_tpu.train.step import build_train_step, make_train_state

    B = 8
    model_kw = dict(net_Lp=6, net_Ld=2, net_H=32)
    base = dict(
        datapath="x", Nf=16, mip=True, mip_levels=2, batch_size=B,
        steps_per_call=1, num_iters=1, ckpt_loss=10**9,
        ckpt_images=10**9, ckpt_model=10**9, **model_kw,
    )
    from nerf_simple_tpu.models import model_from_train_config

    rng_np = np.random.default_rng(7)
    rays = jnp.asarray(
        np.concatenate(
            [rng_np.normal(0, 0.1, (64, 3)), rng_np.normal(size=(64, 3))],
            -1,
        ),
        jnp.float32,
    )
    pixels = jnp.asarray(rng_np.uniform(0, 1, (64, 3)), jnp.float32)
    key = jax.random.PRNGKey(9)

    losses = {}
    states = {}
    for backend in ("xla", "pallas"):
        cfg = TrainConfig(backend=backend, **base)
        model = model_from_train_config(cfg)
        state = make_train_state(jax.random.PRNGKey(0), cfg, model)
        step = build_train_step(cfg, model, donate=False, base_radius=0.05)
        ctx = (
            pltpu.force_tpu_interpret_mode()
            if backend == "pallas"
            else jax.default_matmul_precision("highest")
        )
        with ctx:
            states[backend], losses[backend] = step(state, rays, pixels, key)
    np.testing.assert_allclose(
        np.asarray(losses["pallas"]),
        np.asarray(losses["xla"]),
        rtol=2e-4,
        atol=1e-6,
    )
    # one optimizer step from identical grads -> near-identical params
    a = states["xla"].params["trunk0"]["w"]
    b = states["pallas"].params["trunk0"]["w"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_multiscale_train_arrays_layout():
    """Pyramid union: row counts per scale, per-ray radii s*base, area
    weights proportional to s^2 with mean 1, block-center ray alignment
    at scale 2 (the mean of a 2x2 full-res dir block)."""
    from nerf_simple_tpu.data.dataset import (
        RayDataset,
        multiscale_train_arrays,
    )
    from nerf_simple_tpu.data.synthetic import write_blender_scene
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        scene = os.path.join(td, "scene")
        write_blender_scene(scene, n_train=2, n_val=1, n_test=1, H=16, W=16)
        from nerf_simple_tpu.data.blender import load_blender

        data = load_blender(scene, half_res=False)
    base = 0.01
    rays8, pixels = multiscale_train_arrays(data, base)
    P, HW = 2, 16 * 16
    n_expect = P * (HW + HW // 4 + HW // 16 + HW // 64)
    assert rays8.shape == (n_expect, 8)
    assert pixels.shape == (n_expect, 3)
    r = np.asarray(rays8)
    # per-scale blocks in order 1, 2, 4, 8
    ofs = 0
    for s in (1, 2, 4, 8):
        n_s = P * HW // (s * s)
        blk = r[ofs : ofs + n_s]
        np.testing.assert_allclose(blk[:, 6], s * base, rtol=1e-6)
        ofs += n_s
    w = r[:, 7]
    np.testing.assert_allclose(w.mean(), 1.0, rtol=1e-5)
    # area weighting: scale-8 rays weigh 64x scale-1 rays
    np.testing.assert_allclose(w[-1] / w[0], 64.0, rtol=1e-5)
    # alignment: the first scale-2 ray dir is the mean of the first
    # full-res 2x2 block's dirs (linear map of the block-center coord)
    full = r[: P * HW, 3:6].reshape(P, 16, 16, 3)
    half = r[P * HW : P * HW + P * HW // 4, 3:6].reshape(P, 8, 8, 3)
    np.testing.assert_allclose(
        half[0, 0, 0], full[0, :2, :2].mean((0, 1)), atol=1e-6
    )


@pytest.mark.slow
def test_multiscale_fused_matches_xla(rng):
    """8-column rays (per-ray radius + footprint loss weight): the fused
    kernel's weighted loss (x16 row 14) must match the XLA weighted MSE,
    gradients included (via one optimizer step)."""
    from jax.experimental.pallas import tpu as pltpu

    from nerf_simple_tpu.models import model_from_train_config
    from nerf_simple_tpu.train.step import build_train_step, make_train_state

    base = dict(
        datapath="x", Nf=16, mip=True, mip_multiscale=True, batch_size=8,
        steps_per_call=1, num_iters=1, net_Lp=6, net_Ld=2, net_H=32,
        ckpt_loss=10**9, ckpt_images=10**9, ckpt_model=10**9,
    )
    rng_np = np.random.default_rng(11)
    n = 64
    rays6 = np.concatenate(
        [rng_np.normal(0, 0.1, (n, 3)), rng_np.normal(size=(n, 3))], -1
    )
    radii = rng_np.uniform(0.01, 0.3, (n, 1))
    lw = rng_np.uniform(0.2, 4.0, (n, 1))
    rays8 = jnp.asarray(
        np.concatenate([rays6, radii, lw], -1), jnp.float32
    )
    pixels = jnp.asarray(rng_np.uniform(0, 1, (n, 3)), jnp.float32)
    key = jax.random.PRNGKey(13)

    losses = {}
    states = {}
    for backend in ("xla", "pallas"):
        cfg = TrainConfig(backend=backend, **base)
        model = model_from_train_config(cfg)
        state = make_train_state(jax.random.PRNGKey(0), cfg, model)
        step = build_train_step(cfg, model, donate=False, base_radius=0.05)
        ctx = (
            pltpu.force_tpu_interpret_mode()
            if backend == "pallas"
            else jax.default_matmul_precision("highest")
        )
        with ctx:
            states[backend], losses[backend] = step(
                state, rays8, pixels, key
            )
    np.testing.assert_allclose(
        np.asarray(losses["pallas"]),
        np.asarray(losses["xla"]),
        rtol=2e-4,
        atol=1e-6,
    )
    # gradient parity, not just loss parity: the weighted-loss cotangent
    # (2 * scale * w_r * err) feeds every dW — one optimizer step from
    # identical grads must yield near-identical params
    a = states["xla"].params["trunk0"]["w"]
    b = states["pallas"].params["trunk0"]["w"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


@pytest.mark.slow
def test_multiscale_train_driver(tmp_path):
    """train() with mip_multiscale: the loop builds the pyramid ray pool
    (8-col rays) and the scanned step consumes it; loss decreases."""
    import os

    from nerf_simple_tpu.data.synthetic import write_blender_scene
    from nerf_simple_tpu.train.loop import train

    root = str(tmp_path)
    scene = os.path.join(root, "scene")
    write_blender_scene(scene, n_train=4, n_val=1, n_test=1, H=24, W=24)
    state = train(
        TrainConfig(
            datapath=scene,
            savepath=os.path.join(root, "models"),
            exp_name="ms",
            Nf=16,
            mip=True,
            mip_multiscale=True,
            net_Lp=6,
            net_Ld=2,
            net_H=32,
            num_iters=40,
            batch_size=128,
            steps_per_call=20,
            half_res=False,
            ckpt_loss=1000,
            ckpt_images=10**9,
            ckpt_model=10**9,
            log_dir=os.path.join(root, "logs"),
        )
    )
    assert int(state.step) == 40


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


@pytest.mark.slow
def test_multiscale_two_level_combo(rng):
    """mip_multiscale + mip_levels=2: both fused passes consume the
    8-column rays (per-ray radius + weight) and losses stay finite."""
    from jax.experimental.pallas import tpu as pltpu

    from nerf_simple_tpu.models import model_from_train_config
    from nerf_simple_tpu.train.step import build_train_step, make_train_state

    cfg = TrainConfig(
        datapath="x", Nf=16, mip=True, mip_levels=2, mip_multiscale=True,
        backend="pallas", batch_size=8, steps_per_call=1, num_iters=1,
        net_Lp=4, net_Ld=2, net_H=32,
        ckpt_loss=10**9, ckpt_images=10**9, ckpt_model=10**9,
    )
    model = model_from_train_config(cfg)
    state = make_train_state(jax.random.PRNGKey(0), cfg, model)
    step = build_train_step(cfg, model, donate=False, base_radius=0.05)
    rng_np = np.random.default_rng(5)
    rays8 = jnp.asarray(
        np.concatenate(
            [
                rng_np.normal(0, 0.1, (32, 3)),
                rng_np.normal(size=(32, 3)),
                rng_np.uniform(0.01, 0.2, (32, 1)),
                rng_np.uniform(0.5, 2.0, (32, 1)),
            ],
            -1,
        ),
        jnp.float32,
    )
    pixels = jnp.asarray(rng_np.uniform(0, 1, (32, 3)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        state, losses = step(state, rays8, pixels, jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(losses)).all()


@pytest.mark.slow
@pytest.mark.parametrize("contract", [False, True])
def test_fused_mip_input_grads_match_autodiff(rng, contract):
    """Anti-aliased pose refinement seam: fused_mlp(mip=True,
    want_dx=True) must emit dL/d(mean), dL/d(dir), dL/d(variance)
    matching XLA autodiff of nerf_apply_mip — through the IPE damp
    chain and (with contract) the coupled linearized-Gaussian warp
    Jacobian, where the variance transform also depends on the MEAN
    (kernels/mlp.py::_input_grad_tile_mip). Tested through jax.grad of
    the custom VJP so the routing into x16 rows 0..5/11..13 is
    exercised end to end."""
    from jax.experimental.pallas import tpu as pltpu

    from nerf_simple_tpu.kernels.mlp import fused_mlp, pack_weights
    from nerf_simple_tpu.models.nerf import nerf_apply_mip

    R = 128  # one kernel tile
    model = NerfMLP(Lp=4, Ld=2, H=32, contract=contract)
    params = init_nerf_params(jax.random.PRNGKey(0), model)
    # means straddle the unit ball so BOTH contraction branches run
    mean = jnp.asarray(rng.normal(0, 1.2, (R, 3)), jnp.float32)
    var = jnp.asarray(rng.uniform(0.001, 0.05, (R, 3)), jnp.float32)
    d = rng.normal(size=(R, 3))
    dirs = jnp.asarray(d / np.linalg.norm(d, -1, keepdims=True), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(R, 4)), jnp.float32)

    def xla_loss(mean, var, dirs):
        out = nerf_apply_mip(params, mean, var, dirs, model)
        return jnp.sum(out * cot)

    ref = jax.grad(xla_loss, argnums=(0, 1, 2))(mean, var, dirs)

    wts = pack_weights(params, model=model)

    def kern_loss(mean, var, dirs):
        x16 = jnp.concatenate(
            [
                mean.T,
                dirs.T,
                jnp.zeros((5, R), jnp.float32),
                var.T,
                jnp.zeros((2, R), jnp.float32),
            ],
            axis=0,
        )
        out = fused_mlp(wts, x16, 128, jnp.float32, model, True, True)
        # kernel output rows: 0..2 rgb, 3 sigma
        return jnp.sum(out[:4].T * cot)

    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(kern_loss, argnums=(0, 1, 2))(mean, var, dirs)

    for name, r, g in zip(("mean", "var", "dir"), ref, got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=2e-4, rtol=2e-3,
            err_msg=f"d/d({name}) [contract={contract}]",
        )
