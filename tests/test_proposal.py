"""Proposal-network sampling (mip-NeRF 360 scheme): unit + step tests.

Covers models/proposal.py, ops/volume.py::{weights_from_sigma,
interlevel_loss}, the render_rays_proposal path, and the fused-vs-XLA
train-core agreement. The scheme is additive — the reference stubs
hierarchical sampling (utils/nets.py:45-48); proposal replaces its
coarse NeRF with a tiny density MLP at ~1/30th of the FLOPs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_simple_tpu.config import TestConfig, TrainConfig
from nerf_simple_tpu.models.nerf import NerfMLP
from nerf_simple_tpu.models.proposal import (
    ProposalMLP,
    infer_proposal_arch,
    init_proposal_params,
    proposal_weights,
)
from nerf_simple_tpu.ops.volume import (
    composite,
    interlevel_loss,
    weights_from_sigma,
)


def _rand_rays(rng, B):
    rays = np.concatenate(
        [rng.normal(0, 0.1, (B, 3)), rng.normal(size=(B, 3))], -1
    )
    return jnp.asarray(rays, jnp.float32)


def test_weights_from_sigma_matches_composite(rng):
    """The color-free weights slice must equal composite().weights
    bit-for-bit given the same sigma/ts/dirs."""
    B, N = 16, 24
    rgb_sigma = rng.normal(0, 2, size=(B, N, 4)).astype(np.float32)
    ts = np.sort(rng.uniform(2, 6, size=(B, N)), axis=-1).astype(np.float32)
    dirs = rng.normal(size=(B, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    full = composite(jnp.asarray(rgb_sigma), jnp.asarray(ts), jnp.asarray(dirs))
    w = weights_from_sigma(
        jnp.asarray(rgb_sigma[..., 3]), jnp.asarray(ts), jnp.asarray(dirs)
    )
    np.testing.assert_array_equal(np.asarray(w), np.asarray(full.weights))


def _interlevel_np(w, ts, wp, tsp, eps=1e-4):
    """Literal per-ray double-loop oracle for the interlevel bound."""
    B, N = w.shape
    Np = tsp.shape[1]
    total = 0.0
    for b in range(B):
        mids = 0.5 * (tsp[b, 1:] + tsp[b, :-1])
        bound = np.zeros(Np)
        for i in range(N - 1):  # tail sample excluded
            bound[int(np.sum(mids <= ts[b, i]))] += w[b, i]
        excess = np.maximum(bound - wp[b], 0.0)
        total += float(np.sum(excess**2 / (wp[b] + eps)))
    return total / B


def test_interlevel_matches_loop_oracle(rng):
    B, N, Np = 8, 24, 10
    w = rng.uniform(0, 0.2, (B, N)).astype(np.float32)
    ts = np.sort(rng.uniform(2, 6, (B, N)), -1).astype(np.float32)
    tsp = np.sort(rng.uniform(2, 6, (B, Np)), -1).astype(np.float32)
    wp = rng.uniform(0, 0.2, (B, Np)).astype(np.float32)
    got = float(
        interlevel_loss(
            jnp.asarray(w), jnp.asarray(ts), jnp.asarray(wp), jnp.asarray(tsp)
        )
    )
    want = _interlevel_np(
        w.astype(np.float64), ts, wp.astype(np.float64), tsp
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_interlevel_zero_when_proposal_covers(rng):
    """A proposal whose per-bin mass upper-bounds the main field's is not
    penalized (one-sided bound: over-coverage is free)."""
    B, N, Np = 4, 16, 6
    w = rng.uniform(0, 0.2, (B, N)).astype(np.float32)
    ts = np.sort(rng.uniform(2, 6, (B, N)), -1).astype(np.float32)
    tsp = np.sort(rng.uniform(2, 6, (B, Np)), -1).astype(np.float32)
    # wp := exact binned mass (+ margin) -> zero under-coverage
    wp = np.zeros((B, Np), np.float32)
    for b in range(B):
        mids = 0.5 * (tsp[b, 1:] + tsp[b, :-1])
        for i in range(N - 1):
            wp[b, int(np.sum(mids <= ts[b, i]))] += w[b, i]
    wp += 0.01
    loss = float(
        interlevel_loss(
            jnp.asarray(w), jnp.asarray(ts), jnp.asarray(wp), jnp.asarray(tsp)
        )
    )
    assert loss == 0.0
    # halving the proposal mass must be penalized
    loss2 = float(
        interlevel_loss(
            jnp.asarray(w), jnp.asarray(ts), jnp.asarray(wp / 4),
            jnp.asarray(tsp),
        )
    )
    assert loss2 > 0.0


def test_interlevel_grad_pushes_proposal_up(rng):
    """d loss / d wp <= 0 everywhere: more proposal mass never increases
    the bound penalty (the loss only trains the proposal to cover)."""
    B, N, Np = 4, 16, 6
    w = jnp.asarray(rng.uniform(0, 0.2, (B, N)), jnp.float32)
    ts = jnp.asarray(np.sort(rng.uniform(2, 6, (B, N)), -1), jnp.float32)
    tsp = jnp.asarray(np.sort(rng.uniform(2, 6, (B, Np)), -1), jnp.float32)
    wp = jnp.asarray(rng.uniform(0, 0.05, (B, Np)), jnp.float32)
    g = jax.grad(lambda x: interlevel_loss(w, ts, x, tsp))(wp)
    assert np.asarray(g).max() <= 1e-8
    assert np.asarray(g).min() < 0  # some bins genuinely under-covered


def test_infer_proposal_arch_roundtrip():
    m = ProposalMLP(Lp=5, D=3, H=48)
    params = init_proposal_params(jax.random.PRNGKey(0), m)
    assert infer_proposal_arch(params) == m


def test_proposal_weights_shape_and_range(rng):
    m = ProposalMLP(Lp=4, D=2, H=32)
    params = init_proposal_params(jax.random.PRNGKey(0), m)
    rays = _rand_rays(rng, 8)
    ts = jnp.asarray(np.sort(rng.uniform(2, 6, (8, 12)), -1), jnp.float32)
    w = proposal_weights(params, rays, ts, m)
    assert w.shape == (8, 12)
    wn = np.asarray(w)
    assert (wn >= 0).all() and (wn.sum(-1) <= 1 + 1e-5).all()


def test_config_rejects_proposal_plus_hierarchical():
    with pytest.raises(ValueError, match="alternative sampling"):
        TrainConfig(datapath="x", proposal=True, hierarchical=True)
    with pytest.raises(ValueError, match="alternative samplers"):
        TestConfig(loadpath="x", datapath="x", Np=8, Nc=8)


def test_render_rays_proposal_shapes(rng):
    from nerf_simple_tpu.render.renderer import (
        RenderSettings,
        render_rays_proposal,
    )

    model = NerfMLP(Lp=4, Ld=2, H=32)
    pm = ProposalMLP(Lp=4, D=2, H=32)
    from nerf_simple_tpu.models.nerf import init_nerf_params

    params = {
        "prop": init_proposal_params(jax.random.PRNGKey(0), pm),
        "fine": init_nerf_params(jax.random.PRNGKey(1), model),
    }
    rays = _rand_rays(rng, 8)
    s = RenderSettings(N=16, N_prop=8)
    out, (tsp, wp, tsf) = render_rays_proposal(
        params, rays, jax.random.PRNGKey(2), s, model, pm, return_aux=True
    )
    assert out.rgb.shape == (8, 3)
    assert tsp.shape == (8, 8) and wp.shape == (8, 8) and tsf.shape == (8, 16)
    assert np.isfinite(np.asarray(out.rgb)).all()
    # fine samples drawn from the proposal support stay in [tn, tf]
    tsf_n = np.asarray(tsf)
    assert (np.diff(tsf_n, axis=-1) >= 0).all()
    assert tsf_n.min() >= s.tn - 1e-5 and tsf_n.max() <= s.tf + 1e-5


def test_proposal_chunked_render(rng):
    from nerf_simple_tpu.models.nerf import init_nerf_params
    from nerf_simple_tpu.render.renderer import (
        RenderSettings,
        render_rays_chunked,
    )

    model = NerfMLP(Lp=4, Ld=2, H=32)
    pm = ProposalMLP(Lp=4, D=2, H=32)
    params = {
        "prop": init_proposal_params(jax.random.PRNGKey(0), pm),
        "fine": init_nerf_params(jax.random.PRNGKey(1), model),
    }
    rays = _rand_rays(rng, 100)
    s = RenderSettings(N=16, N_prop=8)
    rgb, disp = render_rays_chunked(
        params, rays, jax.random.PRNGKey(2), s, model, chunk=64, prop_model=pm
    )
    assert rgb.shape == (100, 3) and disp.shape == (100,)
    assert np.isfinite(np.asarray(rgb)).all()


@pytest.mark.slow
def test_proposal_train_step_runs_and_learns(tiny_scene_prop):
    rays, pixels = tiny_scene_prop
    from nerf_simple_tpu.train.step import build_train_step, make_train_state

    cfg = TrainConfig(
        datapath="x", Nf=16, proposal=True, Np=8, prop_Lp=4, prop_D=2,
        prop_H=32, num_iters=60, batch_size=128, steps_per_call=10,
        ckpt_loss=10**9, ckpt_images=10**9, ckpt_model=10**9,
    )
    model = NerfMLP(Lp=4, Ld=2, H=32)
    state = make_train_state(jax.random.PRNGKey(0), cfg, model)
    assert set(state.params) == {"prop", "fine"}
    p0 = jax.device_get(state.params)
    step = build_train_step(cfg, model, donate=False)
    key = jax.random.PRNGKey(1)

    from nerf_simple_tpu.models.proposal import proposal_from_train_config
    from nerf_simple_tpu.ops.volume import interlevel_loss
    from nerf_simple_tpu.render.renderer import (
        RenderSettings,
        render_rays_proposal,
    )

    s = RenderSettings(N=cfg.Nf, N_prop=cfg.Np)
    pm = proposal_from_train_config(cfg)

    @jax.jit
    def decompose(params):
        """(mse, interlevel) on a fixed held-out ray batch."""
        k = jax.random.PRNGKey(5)
        idx = jax.random.randint(k, (128,), 0, rays.shape[0])
        out, (tsp, wp, tsf) = render_rays_proposal(
            params, rays[idx], k, s, model, pm, return_aux=True
        )
        mse = jnp.mean((out.rgb - pixels[idx]) ** 2)
        return mse, interlevel_loss(
            jax.lax.stop_gradient(out.weights), tsf, wp, tsp
        )

    mse0, il0 = (float(x) for x in decompose(state.params))
    first = None
    for _ in range(6):
        state, losses = step(state, rays, pixels, key)
        if first is None:
            first = np.asarray(losses)
    last = np.asarray(losses)
    assert int(state.step) == 60
    assert np.isfinite(first).all() and np.isfinite(last).all()
    mse1, il1 = (float(x) for x in decompose(state.params))
    # the rendering objective learns fast; the interlevel distillation
    # converges slowly (the two fields co-evolve) but must not diverge
    assert mse1 < 0.6 * mse0, (mse0, mse1)
    assert il1 < 1.1 * il0, (il0, il1)
    # BOTH nets actually receive gradients
    for group in ("prop", "fine"):
        delta = max(
            float(np.abs(np.asarray(a) - np.asarray(b)).max())
            for a, b in zip(
                jax.tree.leaves(p0[group]),
                jax.tree.leaves(jax.device_get(state.params[group])),
            )
        )
        assert delta > 1e-6, f"{group} params never updated"


@pytest.fixture(scope="module")
def tiny_scene_prop(tmp_path_factory):
    from nerf_simple_tpu.data.blender import load_blender
    from nerf_simple_tpu.data.dataset import RayDataset
    from nerf_simple_tpu.data.synthetic import write_blender_scene

    d = str(tmp_path_factory.mktemp("scene_prop"))
    write_blender_scene(d, n_train=4, n_val=1, n_test=1, H=24, W=24)
    rd = RayDataset.from_blender(load_blender(d, half_res=False))
    return rd.rays["train"], rd.pixels["train"]


@pytest.mark.slow
def test_proposal_fused_matches_xla():
    """The fused (Pallas main-field) proposal core must agree with the
    generic autodiff path: same loss, near-identical post-step params."""
    from jax.experimental.pallas import tpu as pltpu

    from nerf_simple_tpu.train.step import build_train_step, make_train_state

    rng = np.random.default_rng(7)
    rays = _rand_rays(rng, 8)
    pixels = jnp.asarray(rng.uniform(0, 1, (8, 3)), jnp.float32)
    key = jax.random.PRNGKey(3)

    def run(backend):
        cfg = TrainConfig(
            datapath="x", Nf=16, proposal=True, Np=8, prop_Lp=4, prop_D=2,
            prop_H=32, num_iters=100, batch_size=8, steps_per_call=1,
            backend=backend, compute_dtype="f32",
            ckpt_loss=10**9, ckpt_images=10**9, ckpt_model=10**9,
        )
        model = NerfMLP(Lp=4, Ld=2, H=32)
        state = make_train_state(jax.random.PRNGKey(0), cfg, model)
        step = build_train_step(cfg, model, donate=False)
        state, losses = step(state, rays, pixels, key)
        return float(losses[0]), jax.device_get(state.params)

    loss_gen, params_gen = run("xla")
    with pltpu.force_tpu_interpret_mode():
        loss_fused, params_fused = run("pallas")

    np.testing.assert_allclose(loss_fused, loss_gen, rtol=1e-4)
    for group in ("prop", "fine"):
        for layer in params_gen[group]:
            for kk in ("w", "b"):
                np.testing.assert_allclose(
                    np.asarray(params_fused[group][layer][kk]),
                    np.asarray(params_gen[group][layer][kk]),
                    atol=5e-5,
                    rtol=2e-3,
                    err_msg=f"{group}/{layer}/{kk}",
                )


@pytest.mark.slow
def test_proposal_e2e_train_then_eval(tmp_path):
    """Full driver pass: proposal training writes a {prop, fine}
    checkpoint; the eval CLI renders with Np > 0 proposal-guided
    sampling from it (arch recovered from weight shapes alone)."""
    import os

    from nerf_simple_tpu.data.synthetic import write_blender_scene
    from nerf_simple_tpu.evaluate import test as run_eval
    from nerf_simple_tpu.train.loop import train

    root = str(tmp_path)
    scene = os.path.join(root, "scene")
    write_blender_scene(scene, n_train=3, n_val=1, n_test=1, H=20, W=20)
    train(
        TrainConfig(
            datapath=scene,
            savepath=os.path.join(root, "models"),
            exp_name="prop",
            Nf=8,
            proposal=True,
            Np=8,
            prop_Lp=4,
            prop_D=2,
            prop_H=32,
            net_Lp=4,
            net_Ld=2,
            net_H=32,
            num_iters=20,
            batch_size=64,
            steps_per_call=10,
            half_res=False,
            ckpt_loss=1000,
            ckpt_images=10**9,
            ckpt_model=10**9,
            log_dir=os.path.join(root, "logs"),
        )
    )
    run_eval(
        TestConfig(
            loadpath=os.path.join(root, "models", "prop"),
            datapath=scene,
            savepath=os.path.join(root, "results"),
            exp_name="prop",
            batch_size=512,
            half_res=False,
            im_set="test",
            im_idxs=(0,),
            animation=False,
            N_samples=8,
            Np=8,
        )
    )
    assert os.path.exists(os.path.join(root, "results", "prop", "rgb_0.png"))
