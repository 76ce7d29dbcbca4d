"""mip x proposal composition — the published mip-NeRF 360 model.

Proposal-placed interval EDGES + IPE cone frustums + interval-form
interlevel/distortion losses (Barron et al. 2022). No reference
analogue (the reference stubs even plain hierarchical sampling,
utils/nets.py:45-48); this is capability-completeness of the repo's
own unbounded-scene recipe. Covers ops/volume.py::
{weights_from_sigma_intervals, interlevel_loss_intervals,
distortion_loss_intervals}, models/proposal.py::
proposal_weights_intervals, ops/sampling.py::resample_edges(det=True),
renderer.py::render_rays_proposal under settings.mip, and the train
step composition.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_simple_tpu.config import TrainConfig
from nerf_simple_tpu.models.nerf import NerfMLP, init_nerf_params
from nerf_simple_tpu.models.proposal import (
    ProposalMLP,
    init_proposal_params,
    proposal_weights_intervals,
)
from nerf_simple_tpu.ops.volume import (
    composite_intervals,
    distortion_loss_intervals,
    interlevel_loss_intervals,
    weights_from_sigma_intervals,
)


@pytest.fixture(scope="module")
def tiny_scene_prop(tmp_path_factory):
    from nerf_simple_tpu.data.blender import load_blender
    from nerf_simple_tpu.data.dataset import RayDataset
    from nerf_simple_tpu.data.synthetic import write_blender_scene

    d = str(tmp_path_factory.mktemp("scene_mip_prop"))
    write_blender_scene(d, n_train=4, n_val=1, n_test=1, H=24, W=24)
    rd = RayDataset.from_blender(load_blender(d, half_res=False))
    return rd.rays["train"], rd.pixels["train"]


def _rand_rays(rng, B):
    rays = np.concatenate(
        [rng.normal(0, 0.1, (B, 3)), rng.normal(size=(B, 3))], -1
    )
    return jnp.asarray(rays, jnp.float32)


def _sorted_edges(rng, B, N, lo=2.0, hi=6.0):
    e = np.sort(rng.uniform(lo, hi, size=(B, N + 1)), axis=-1)
    return jnp.asarray(e, jnp.float32)


def test_weights_from_sigma_intervals_matches_composite(rng):
    """The color-free interval weights must equal
    composite_intervals().weights bit-for-bit for the same density."""
    B, N = 16, 24
    rgb_sigma = rng.normal(0, 2, size=(B, N, 4)).astype(np.float32)
    edges = _sorted_edges(rng, B, N)
    mids = 0.5 * (edges[:, 1:] + edges[:, :-1])
    dirs = rng.normal(size=(B, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    full = composite_intervals(
        jnp.asarray(rgb_sigma), edges, mids, jnp.asarray(dirs)
    )
    w = weights_from_sigma_intervals(
        jnp.asarray(rgb_sigma[..., 3]), edges, jnp.asarray(dirs)
    )
    np.testing.assert_array_equal(np.asarray(w), np.asarray(full.weights))


def test_interlevel_intervals_zero_when_covered(rng):
    """A proposal histogram that upper-bounds the fine mass in every
    probe bin incurs zero loss (only under-coverage is penalized)."""
    B, N, Np = 8, 32, 8
    edges_p = jnp.broadcast_to(
        jnp.linspace(2.0, 6.0, Np + 1), (B, Np + 1)
    ).astype(jnp.float32)
    edges_f = _sorted_edges(rng, B, N)
    mids_f = 0.5 * (edges_f[:, 1:] + edges_f[:, :-1])
    w_f = jnp.asarray(
        rng.uniform(0, 0.01, size=(B, N)).astype(np.float32)
    )
    w_p = jnp.full((B, Np), 1.0, jnp.float32)  # covers everything
    loss = interlevel_loss_intervals(w_f, mids_f, w_p, edges_p)
    assert float(loss) == 0.0


def test_interlevel_intervals_matches_loop_oracle(rng):
    """Literal per-ray double-loop oracle, f64."""
    B, N, Np = 6, 20, 5
    edges_p = np.sort(rng.uniform(2, 6, size=(B, Np + 1)), axis=-1)
    edges_f = np.sort(rng.uniform(2, 6, size=(B, N + 1)), axis=-1)
    mids_f = 0.5 * (edges_f[:, 1:] + edges_f[:, :-1])
    w_f = rng.uniform(0, 0.3, size=(B, N))
    w_p = rng.uniform(0, 0.2, size=(B, Np))
    total = 0.0
    for b in range(B):
        interior = edges_p[b, 1:-1]
        bound = np.zeros(Np)
        for i in range(N):  # NO tail exclusion in the interval form
            j = int(np.sum(interior <= mids_f[b, i]))
            bound[j] += w_f[b, i]
        excess = np.maximum(bound - w_p[b], 0.0)
        total += np.sum(excess**2 / (w_p[b] + 1e-4))
    want = total / B
    got = float(
        interlevel_loss_intervals(
            jnp.asarray(w_f, jnp.float32),
            jnp.asarray(mids_f, jnp.float32),
            jnp.asarray(w_p, jnp.float32),
            jnp.asarray(edges_p, jnp.float32),
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_distortion_intervals_matches_naive_quadratic(rng):
    """O(N) cumsum form == the literal O(N^2) eqn. 15 double sum."""
    B, N = 5, 24
    edges = np.sort(rng.uniform(2, 6, size=(B, N + 1)), axis=-1)
    w = rng.uniform(0, 0.2, size=(B, N))
    m = 0.5 * (edges[:, 1:] + edges[:, :-1])
    d = edges[:, 1:] - edges[:, :-1]
    naive = np.mean(
        np.sum(
            w[:, :, None] * w[:, None, :] * np.abs(m[:, :, None] - m[:, None, :]),
            axis=(1, 2),
        )
        + np.sum(w * w * d, axis=-1) / 3.0
    )
    got = float(
        distortion_loss_intervals(
            jnp.asarray(w, jnp.float32), jnp.asarray(edges, jnp.float32)
        )
    )
    np.testing.assert_allclose(got, naive, rtol=1e-5)


def test_distortion_intervals_prefers_concentrated(rng):
    B, N = 4, 32
    edges = jnp.broadcast_to(
        jnp.linspace(2.0, 6.0, N + 1), (B, N + 1)
    ).astype(jnp.float32)
    spread = jnp.full((B, N), 1.0 / N, jnp.float32)
    conc = jnp.zeros((B, N), jnp.float32).at[:, N // 2].set(1.0)
    assert float(distortion_loss_intervals(conc, edges)) < float(
        distortion_loss_intervals(spread, edges)
    )


def test_resample_edges_det_quantiles(rng):
    """det=True: deterministic, sorted, inside the support, and tracking
    the histogram (more edges where the weight is)."""
    from nerf_simple_tpu.ops.sampling import resample_edges

    B, N = 8, 16
    edges = jnp.broadcast_to(
        jnp.linspace(2.0, 6.0, N + 1), (B, N + 1)
    ).astype(jnp.float32)
    w = jnp.zeros((B, N), jnp.float32).at[:, 3].set(1.0)
    a = resample_edges(jax.random.PRNGKey(0), edges, w, 32, det=True)
    b = resample_edges(jax.random.PRNGKey(7), edges, w, 32, det=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    a = np.asarray(a)
    assert a.shape == (B, 33)
    assert (np.diff(a, axis=-1) >= 0).all()
    assert a.min() >= 2.0 - 1e-5 and a.max() <= 6.0 + 1e-5
    # most resampled edges land inside the hot bin's neighborhood
    lo, hi = 2.0 + 3 * 0.25, 2.0 + 4 * 0.25
    frac = ((a >= lo - 0.3) & (a <= hi + 0.3)).mean()
    assert frac > 0.5, frac


def test_resample_blur_floor_fraction(rng):
    """Quantify the exploration floor the ``blur`` knob controls: with a
    converged (concentrated) histogram, blur=0.01 over 64 bins scatters
    a double-digit fraction of fine edges uniformly along the ray, while
    blur=1e-4 keeps nearly all of them at the histogram mode. This scale
    gap (vs importance_ts's 1e-5 point floor) is why the unbounded
    anti-aliased recipe sets TrainConfig.resample_blur low (see
    docs/PERFORMANCE.md anti-aliased-360 notes)."""
    from nerf_simple_tpu.ops.sampling import resample_edges

    B, Np = 16, 64
    edges = jnp.broadcast_to(
        jnp.linspace(1.0, 30.0, Np + 1), (B, Np + 1)
    ).astype(jnp.float32)
    # converged proposal: all mass in bins 20-21
    w = jnp.zeros((B, Np), jnp.float32).at[:, 20:22].set(0.5)
    lo = 1.0 + 18 * 29.0 / Np  # dilation spreads to bins 19-22
    hi = 1.0 + 24 * 29.0 / Np

    def outside_frac(blur):
        a = np.asarray(
            resample_edges(jax.random.PRNGKey(3), edges, w, 128, blur=blur)
        )
        return ((a < lo) | (a > hi)).mean()

    assert outside_frac(0.01) > 0.15, outside_frac(0.01)
    assert outside_frac(1e-4) < 0.02, outside_frac(1e-4)


def test_resample_blur_config_plumbing():
    """resample_blur: validation rejects negatives; the knob reaches the
    det eval path (different blur -> different proposal-placed edges)."""
    with pytest.raises(ValueError, match="resample_blur"):
        TrainConfig(datapath="x", resample_blur=-0.1)
    from nerf_simple_tpu.models.proposal import init_proposal_params
    from nerf_simple_tpu.render.renderer import (
        RenderSettings,
        render_rays_proposal,
    )

    pm = ProposalMLP(Lp=4, D=2, H=32)
    model = NerfMLP()
    params = {
        "prop": init_proposal_params(jax.random.PRNGKey(0), pm),
        "fine": init_nerf_params(jax.random.PRNGKey(1), model),
    }
    rays = _rand_rays(np.random.default_rng(5), 8)
    outs = {}
    for blur in (0.01, 0.0):
        s = RenderSettings(
            N=16, N_prop=8, mip=True, base_radius=0.01,
            resample_blur=blur,
        )
        out, (_, _, edges_f) = render_rays_proposal(
            params, rays, jax.random.PRNGKey(2), s, model,
            prop_model=pm, det_fine=True, return_aux=True,
        )
        outs[blur] = np.asarray(edges_f)
    assert not np.allclose(outs[0.01], outs[0.0])


def test_anneal_weights_ramp(rng):
    """Placement anneal: a=0 -> uniform histogram (early training
    ignores the proposal), a=1 -> identity, None -> no-op; zero bins
    stay finite at every exponent."""
    from nerf_simple_tpu.ops.sampling import anneal_weights

    w = jnp.asarray(
        np.array([[0.0, 0.6, 0.3, 0.0], [0.25, 0.25, 0.25, 0.25]]),
        jnp.float32,
    )
    assert anneal_weights(w, None) is w
    a0 = np.asarray(anneal_weights(w, jnp.float32(0.0)))
    np.testing.assert_allclose(a0, np.ones_like(a0))  # uniform
    a1 = np.asarray(anneal_weights(w, jnp.float32(1.0)))
    np.testing.assert_allclose(a1[0, 1:3], [0.6, 0.3], rtol=1e-6)
    half = np.asarray(anneal_weights(w, jnp.float32(0.5)))
    assert np.isfinite(half).all()
    # sharpening is monotone: ratios contract toward 1 as a drops
    assert half[0, 1] / half[0, 2] < a1[0, 1] / a1[0, 2]


def test_prop_anneal_config_and_placement():
    """prop_anneal_frac: validation (range + needs proposal) and the
    live behavior — at step 0 the annealed mip x proposal step places
    edges as if the histogram were uniform, so two different random
    proposal inits yield IDENTICAL fine-edge streams; far past the
    ramp the proposal histogram drives placement again."""
    with pytest.raises(ValueError, match="prop_anneal_frac"):
        TrainConfig(datapath="x", prop_anneal_frac=1.5, proposal=True)
    with pytest.raises(ValueError, match="prop_anneal_frac"):
        TrainConfig(datapath="x", prop_anneal_frac=0.5)
    from nerf_simple_tpu.ops.sampling import anneal_weights, resample_edges

    B, Np = 4, 16
    edges = jnp.broadcast_to(
        jnp.linspace(1.0, 30.0, Np + 1), (B, Np + 1)
    ).astype(jnp.float32)
    w1 = jax.random.uniform(jax.random.PRNGKey(0), (B, Np))
    w2 = jax.random.uniform(jax.random.PRNGKey(9), (B, Np))
    k = jax.random.PRNGKey(3)
    e1 = resample_edges(k, edges, anneal_weights(w1, jnp.float32(0.0)), 32)
    e2 = resample_edges(k, edges, anneal_weights(w2, jnp.float32(0.0)), 32)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), rtol=1e-6)
    f1 = resample_edges(k, edges, anneal_weights(w1, jnp.float32(1.0)), 32)
    assert not np.allclose(np.asarray(f1), np.asarray(e1))


def test_prop_anneal_step_runs_and_matches_backends(tiny_scene_prop):
    """The annealed composition runs through build_train_step on BOTH
    backends with matching losses (the anneal exponent is traced from
    the step counter inside the scanned program)."""
    from nerf_simple_tpu.train.step import build_train_step, make_train_state

    rays, pixels = tiny_scene_prop
    rays, pixels = rays[:256], pixels[:256]
    losses = {}
    for backend in ("xla", "pallas"):
        cfg = TrainConfig(
            datapath="x", Nf=32, Np=16, batch_size=64, num_iters=8,
            steps_per_call=4, backend=backend, proposal=True, mip=True,
            prop_anneal_frac=0.5, distortion_loss_weight=0.01,
            tn=1.0, tf=30.0, sampling_space="disparity", contract=True,
        )
        from nerf_simple_tpu.models import model_from_train_config

        model = model_from_train_config(cfg)
        state = make_train_state(jax.random.PRNGKey(0), cfg, model)
        step = build_train_step(
            cfg, model, donate=False, base_radius=2e-3
        )
        if backend == "pallas":
            from jax.experimental.pallas import tpu as pltpu

            with pltpu.force_tpu_interpret_mode():
                state, ls = step(state, rays, pixels, jax.random.PRNGKey(2))
                losses[backend] = np.asarray(ls)
        else:
            state, ls = step(state, rays, pixels, jax.random.PRNGKey(2))
            losses[backend] = np.asarray(ls)
        assert int(state.step) == 4
        assert np.isfinite(losses[backend]).all()
    np.testing.assert_allclose(
        losses["pallas"], losses["xla"], rtol=2e-3, atol=2e-4
    )


def test_proposal_weights_intervals_props(rng):
    """Shape/range + differentiability wrt proposal params + mip-column
    tolerance (8-col rays: radius/weight columns ignored)."""
    pm = ProposalMLP(Lp=4, D=2, H=32)
    params = init_proposal_params(jax.random.PRNGKey(0), pm)
    B, Np = 12, 8
    rays = _rand_rays(rng, B)
    edges = _sorted_edges(rng, B, Np)
    w = proposal_weights_intervals(params, rays, edges, pm)
    assert w.shape == (B, Np)
    w = np.asarray(w)
    assert (w >= 0).all() and (w.sum(-1) <= 1.0 + 1e-5).all()
    rays8 = jnp.concatenate(
        [rays, jnp.full((B, 1), 0.01), jnp.ones((B, 1))], axis=-1
    )
    w8 = proposal_weights_intervals(params, rays8, edges, pm)
    np.testing.assert_array_equal(np.asarray(w8), w)
    g = jax.grad(
        lambda p: jnp.sum(proposal_weights_intervals(p, rays, edges, pm))
    )(params)
    assert all(
        np.isfinite(np.asarray(leaf)).all() for leaf in jax.tree.leaves(g)
    )
    assert max(
        float(np.abs(np.asarray(leaf)).max()) for leaf in jax.tree.leaves(g)
    ) > 0


def test_config_mip_proposal_composition():
    """mip x proposal (+distortion) is now a legal composition; the
    redundant/contradictory combos still raise."""
    cfg = TrainConfig(
        datapath="x", mip=True, proposal=True, Np=8,
        distortion_loss_weight=0.01,
    )
    assert cfg.mip and cfg.proposal
    # plain mip + distortion is legal too (interval-form regularizer)
    TrainConfig(datapath="x", mip=True, distortion_loss_weight=0.01)
    with pytest.raises(ValueError, match="mip_levels=2 and proposal"):
        TrainConfig(datapath="x", mip=True, mip_levels=2, proposal=True)
    with pytest.raises(ValueError, match="mip=True is incompatible"):
        TrainConfig(datapath="x", mip=True, proposal=True, occupancy=True)
    with pytest.raises(ValueError, match="mip_levels=2"):
        TrainConfig(
            datapath="x", mip=True, mip_levels=2,
            distortion_loss_weight=0.01,
        )


def test_test_config_mip_proposal_eval():
    """Eval side: mip x Np (proposal-placed cone casting) is legal;
    the point-resampling schemes still exclude mip."""
    from nerf_simple_tpu.config import TestConfig

    kw = dict(loadpath="m", datapath="x", savepath="s", exp_name="e")
    cfg = TestConfig(mip=True, Np=8, **kw)
    assert cfg.mip and cfg.Np == 8
    with pytest.raises(ValueError, match="Nc/occupancy"):
        TestConfig(mip=True, Nc=8, **kw)
    with pytest.raises(ValueError, match="Nc/occupancy"):
        TestConfig(mip=True, occupancy=True, **kw)
    with pytest.raises(ValueError, match="mip_levels=2 and Np"):
        TestConfig(mip=True, mip_levels=2, Np=8, **kw)


def test_render_rays_proposal_mip_shapes_and_aux(rng):
    from nerf_simple_tpu.render.renderer import (
        RenderSettings,
        render_rays_proposal,
    )

    model = NerfMLP(Lp=4, Ld=2, H=32)
    pm = ProposalMLP(Lp=4, D=2, H=32)
    params = {
        "fine": init_nerf_params(jax.random.PRNGKey(0), model),
        "prop": init_proposal_params(jax.random.PRNGKey(1), pm),
    }
    B, N, Np = 8, 16, 6
    rays = _rand_rays(rng, B)
    s = RenderSettings(N=N, N_prop=Np, mip=True, base_radius=0.01)
    out, (edges_p, w_prop, edges_f) = render_rays_proposal(
        params, rays, jax.random.PRNGKey(2), s, model, pm, return_aux=True
    )
    assert out.rgb.shape == (B, 3) and out.weights.shape == (B, N)
    assert edges_p.shape == (B, Np + 1)
    assert w_prop.shape == (B, Np)
    assert edges_f.shape == (B, N + 1)
    assert (np.diff(np.asarray(edges_f), axis=-1) >= 0).all()
    assert np.isfinite(np.asarray(out.rgb)).all()
    # det eval path is deterministic
    o1 = render_rays_proposal(
        params, rays, jax.random.PRNGKey(3), s, model, pm, det_fine=True
    )
    o2 = render_rays_proposal(
        params, rays, jax.random.PRNGKey(9), s, model, pm, det_fine=True
    )
    np.testing.assert_array_equal(np.asarray(o1.rgb), np.asarray(o2.rgb))


@pytest.mark.slow
def test_mip_proposal_train_step_runs_and_learns(tiny_scene_prop):
    """The full 360 composition (mip + proposal + distortion) trains:
    loss finite and the MSE on a held-out batch drops; both nets get
    gradients."""
    rays, pixels = tiny_scene_prop
    from nerf_simple_tpu.train.step import build_train_step, make_train_state

    cfg = TrainConfig(
        datapath="x", Nf=16, mip=True, proposal=True,
        Np=8, prop_Lp=4, prop_D=2, prop_H=32,
        distortion_loss_weight=0.001,
        num_iters=120, batch_size=128, steps_per_call=10,
        ckpt_loss=10**9, ckpt_images=10**9, ckpt_model=10**9,
    )
    model = NerfMLP(Lp=4, Ld=2, H=32)
    state = make_train_state(jax.random.PRNGKey(0), cfg, model)
    p0 = jax.device_get(state.params)
    step = build_train_step(cfg, model, donate=False, base_radius=0.02)
    key = jax.random.PRNGKey(1)
    first = None
    # IPE cone casting converges slower than point sampling at equal
    # iters (the integrated encoder low-passes early gradients), so
    # this composition gets 120 iters where test_proposal uses 60
    for _ in range(12):
        state, losses = step(state, rays, pixels, key)
        if first is None:
            first = np.asarray(losses)
    last = np.asarray(losses)
    assert np.isfinite(first).all() and np.isfinite(last).all()
    assert last[-1] < 0.7 * first[0], (first[0], last[-1])
    for group in ("prop", "fine"):
        delta = max(
            float(np.abs(np.asarray(a) - np.asarray(b)).max())
            for a, b in zip(
                jax.tree.leaves(p0[group]),
                jax.tree.leaves(jax.device_get(state.params)[group]),
            )
        )
        assert delta > 1e-6, (group, delta)


def test_mip_proposal_chunked_render(rng):
    """Eval path: chunked full-image render through the proposal+mip
    branch produces finite clipped rgb/disp at the right shapes."""
    from nerf_simple_tpu.render.renderer import (
        RenderSettings,
        render_rays_chunked,
    )

    model = NerfMLP(Lp=4, Ld=2, H=32)
    pm = ProposalMLP(Lp=4, D=2, H=32)
    params = {
        "fine": init_nerf_params(jax.random.PRNGKey(0), model),
        "prop": init_proposal_params(jax.random.PRNGKey(1), pm),
    }
    rays = _rand_rays(rng, 40)
    s = RenderSettings(N=16, N_prop=6, mip=True, base_radius=0.01)
    rgb, disp = render_rays_chunked(
        params, rays, jax.random.PRNGKey(2), s, model, chunk=16,
        prop_model=pm,
    )
    assert rgb.shape == (40, 3) and disp.shape == (40,)
    rgb = np.asarray(rgb)
    assert np.isfinite(rgb).all() and rgb.min() >= 0 and rgb.max() <= 1


@pytest.mark.slow
@pytest.mark.parametrize("space", ["linear", "disparity"])
def test_fused_interval_distortion_matches_xla(space):
    """The in-kernel INTERVAL-form distortion rail (mip=True + dist):
    fused_train_step must reproduce the XLA pipeline's loss AND
    parameter gradients for mse + w * distortion_loss_intervals(
    weights, s_norm(edges)) — s-space midpoints, true s-space widths,
    no tail drop — in both s-normalizations. This is the seam that
    keeps mip(+proposal)+distortion on the single fused kernel
    (kernels/mlp.py::_composite_grad_block mip branch; the t0 edges
    ride x16 row 7)."""
    from jax.experimental.pallas import tpu as pltpu

    from nerf_simple_tpu.kernels.mlp import fused_train_step, pack_weights
    from nerf_simple_tpu.models.nerf import nerf_apply_mip
    from nerf_simple_tpu.ops.sampling import (
        frustum_gaussians_T,
        stratified_ts_spaced,
    )

    B, N, tile = 8, 16, 128
    tn, tf, lam = 2.0, 6.0, 0.05
    base_radius = 0.05
    rng = np.random.default_rng(11)
    model = NerfMLP(Lp=6, Ld=2, H=32)
    params = init_nerf_params(jax.random.PRNGKey(0), model)
    rays = jnp.asarray(
        np.concatenate(
            [rng.normal(0, 0.1, (B, 3)), rng.normal(size=(B, 3))], -1
        ),
        jnp.float32,
    )
    gt = jnp.asarray(rng.uniform(0, 1, (B, 3)), jnp.float32)
    edges = stratified_ts_spaced(
        jax.random.PRNGKey(1), B, N + 1, tn, tf, jnp.float32, space
    )

    def s_norm(t):
        if space == "disparity":
            return (1.0 / tn - 1.0 / jnp.maximum(t, 1e-10)) / (
                1.0 / tn - 1.0 / tf
            )
        return (t - tn) / (tf - tn)

    meanT, unitT, varT, t_mids = frustum_gaussians_T(
        rays, edges, base_radius, "cone"
    )

    def xla_loss(p):
        unit = unitT.T
        out = nerf_apply_mip(
            p,
            meanT.reshape(3, B * N).T,
            varT.reshape(3, B * N).T,
            jnp.broadcast_to(unit[:, None, :], (B, N, 3)).reshape(B * N, 3),
            model,
        ).reshape(B, N, 4)
        comp = composite_intervals(out, edges, t_mids, unit)
        return jnp.mean((comp.rgb - gt) ** 2) + lam * (
            distortion_loss_intervals(comp.weights, s_norm(edges))
        )

    ref_loss, ref_grads = jax.value_and_grad(xla_loss)(params)

    t0, t1 = edges[:, :-1], edges[:, 1:]
    x16 = jnp.concatenate(
        [
            meanT,
            jnp.broadcast_to(unitT[:, :, None], (3, B, N)),
            (t1 - t0)[None],
            t0[None],  # row 7: near edges for the interval dist rail
            jnp.broadcast_to(gt.T[:, :, None], (3, B, N)),
            varT,
            jnp.ones((1, B, N)),
            jnp.zeros((1, B, N)),
        ],
        axis=0,
    ).reshape(16, B * N)

    def kern(p):
        wts, vjp_fn = jax.vjp(lambda pp: pack_weights(pp, model=model), p)
        loss, dwts = fused_train_step(
            wts, x16, N, tile, jnp.float32, model=model, mip=True,
            dist=(lam, tn, tf, space == "disparity"),
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
                err_msg=f"{layer}/{kk} [{space}]",
            )


@pytest.mark.slow
def test_fused_mip_proposal_step_matches_xla():
    """End-to-end: the fused mip x proposal core (proposal-placed
    edges -> single fused IPE train kernel with the interval distortion
    rail -> interval interlevel distillation) matches the autodiff XLA
    step's losses over multiple scanned iterations — step 2's agreement
    certifies step 1's gradients for BOTH param groups."""
    from jax.experimental.pallas import tpu as pltpu

    from nerf_simple_tpu.train.step import build_train_step, make_train_state

    rng = np.random.default_rng(7)
    n_rays = 256
    rays = jnp.asarray(
        np.concatenate(
            [rng.normal(0, 0.1, (n_rays, 3)), rng.normal(size=(n_rays, 3))],
            -1,
        ),
        jnp.float32,
    )
    pixels = jnp.asarray(rng.uniform(0, 1, (n_rays, 3)), jnp.float32)

    def run(backend):
        cfg = TrainConfig(
            datapath="x", Nf=16, mip=True, proposal=True, Np=8,
            prop_Lp=4, prop_D=2, prop_H=32,
            distortion_loss_weight=0.01, num_iters=2,
            batch_size=64, steps_per_call=2, backend=backend,
            compute_dtype="f32",
            ckpt_loss=10**9, ckpt_images=10**9, ckpt_model=10**9,
        )
        model = NerfMLP(Lp=4, Ld=2, H=32)
        state = make_train_state(jax.random.PRNGKey(0), cfg, model)
        step = build_train_step(cfg, model, donate=False, base_radius=0.02)
        _, losses = step(state, rays, pixels, jax.random.PRNGKey(3))
        return np.asarray(losses)

    l_x = run("xla")
    with pltpu.force_tpu_interpret_mode():
        l_p = run("pallas")
    np.testing.assert_allclose(l_p, l_x, rtol=2e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# opaque_background (mip-NeRF 360's opaque background): the last frustum
# becomes the point path's 1e10 boundary absorber. Root cause + measured
# necessity for unbounded scenes: docs/PERFORMANCE.md "Mip x proposal".
# ---------------------------------------------------------------------------


def test_opaque_tail_composite_semantics(rng):
    """With opaque_tail the last interval absorbs ALL leftover
    transmittance (acc == 1), every non-tail weight is untouched, and
    depth keeps the finite interval midpoints (the absorber is a
    boundary condition, not geometry at t0 + 1e10)."""
    B, N = 8, 16
    edges = _sorted_edges(rng, B, N)
    mids = 0.5 * (edges[:, 1:] + edges[:, :-1])
    rs = jnp.asarray(rng.normal(size=(B, N, 4)), jnp.float32)
    dirs = jnp.asarray(rng.normal(size=(B, 3)), jnp.float32)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    open_out = composite_intervals(rs, edges, mids, dirs)
    opq = composite_intervals(rs, edges, mids, dirs, opaque_tail=True)

    np.testing.assert_allclose(np.asarray(opq.acc), 1.0, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(opq.weights[:, :-1]),
        np.asarray(open_out.weights[:, :-1]),
        rtol=1e-6,
    )
    # tail weight = exactly the leftover transmittance of the open form
    np.testing.assert_allclose(
        np.asarray(opq.weights[:, -1]),
        np.asarray(1.0 - jnp.sum(open_out.weights[:, :-1], axis=-1)),
        atol=1e-5,
    )
    assert np.all(np.isfinite(np.asarray(opq.depth)))
    assert np.all(np.asarray(opq.depth) <= np.asarray(edges[:, -1]) + 1e-3)


def test_opaque_tail_weights_from_sigma_matches_composite(rng):
    """Color-free slice agrees with the full composite under the flag."""
    B, N = 4, 8
    edges = _sorted_edges(rng, B, N)
    mids = 0.5 * (edges[:, 1:] + edges[:, :-1])
    sig = jnp.asarray(rng.normal(size=(B, N)), jnp.float32)
    rs = jnp.concatenate(
        [jnp.zeros((B, N, 3), jnp.float32), sig[..., None]], -1
    )
    dirs = jnp.asarray(rng.normal(size=(B, 3)), jnp.float32)
    w = weights_from_sigma_intervals(sig, edges, dirs, opaque_tail=True)
    out = composite_intervals(rs, edges, mids, dirs, opaque_tail=True)
    np.testing.assert_allclose(np.asarray(w), np.asarray(out.weights), rtol=1e-6)


def test_opaque_tail_losses_exclude_tail(rng):
    """Distortion/interlevel drop the artificial tail interval exactly
    like the point form's tail sample: perturbing ONLY the tail weight
    changes neither loss when opaque_tail=True (but does when False)."""
    B, N, Np = 4, 16, 8
    edges = _sorted_edges(rng, B, N)
    mids = 0.5 * (edges[:, 1:] + edges[:, :-1])
    edges_p = _sorted_edges(rng, B, Np)
    w = jnp.asarray(rng.uniform(0, 0.1, size=(B, N)), jnp.float32)
    w_prop = jnp.asarray(rng.uniform(0, 0.1, size=(B, Np)), jnp.float32)
    w2 = w.at[:, -1].add(0.7)

    d1 = distortion_loss_intervals(w, edges, opaque_tail=True)
    d2 = distortion_loss_intervals(w2, edges, opaque_tail=True)
    np.testing.assert_allclose(float(d1), float(d2), rtol=1e-6)
    assert abs(
        float(distortion_loss_intervals(w, edges))
        - float(distortion_loss_intervals(w2, edges))
    ) > 1e-4

    i1 = interlevel_loss_intervals(w, mids, w_prop, edges_p, opaque_tail=True)
    i2 = interlevel_loss_intervals(w2, mids, w_prop, edges_p, opaque_tail=True)
    np.testing.assert_allclose(float(i1), float(i2), rtol=1e-6)
    assert abs(
        float(interlevel_loss_intervals(w, mids, w_prop, edges_p))
        - float(interlevel_loss_intervals(w2, mids, w_prop, edges_p))
    ) > 1e-6


def test_opaque_background_config_validation():
    """The knob modifies interval compositing only: mip required; rides
    TrainConfig -> RenderSettings in the train step and TestConfig for
    eval parity with the checkpoint."""
    from nerf_simple_tpu.config import TestConfig

    with pytest.raises(ValueError, match="opaque_background"):
        TrainConfig(datapath="x", opaque_background=True)
    cfg = TrainConfig(
        datapath="x", mip=True, proposal=True, Np=8, opaque_background=True
    )
    assert cfg.opaque_background
    tc = TestConfig(
        datapath="x", loadpath="y", mip=True, opaque_background=True
    )
    assert tc.opaque_background


def test_fused_mip_proposal_opaque_matches_xla():
    """xla-vs-pallas loss agreement for the anti-aliased 360 recipe WITH
    the opaque background (the colmap360 anti-aliased configuration):
    certifies the kernel's opaque-tail compositing delta, the dist-rail
    tail exclusion, and the interlevel tail exclusion in one scanned
    2-step run."""
    from jax.experimental.pallas import tpu as pltpu

    from nerf_simple_tpu.train.step import build_train_step, make_train_state

    rng = np.random.default_rng(11)
    n_rays = 256
    rays = jnp.asarray(
        np.concatenate(
            [rng.normal(0, 0.1, (n_rays, 3)), rng.normal(size=(n_rays, 3))],
            -1,
        ),
        jnp.float32,
    )
    pixels = jnp.asarray(rng.uniform(0, 1, (n_rays, 3)), jnp.float32)

    def run(backend):
        cfg = TrainConfig(
            datapath="x", Nf=16, mip=True, proposal=True, Np=8,
            prop_Lp=4, prop_D=2, prop_H=32, opaque_background=True,
            distortion_loss_weight=0.01, num_iters=2,
            batch_size=64, steps_per_call=2, backend=backend,
            compute_dtype="f32",
            ckpt_loss=10**9, ckpt_images=10**9, ckpt_model=10**9,
        )
        model = NerfMLP(Lp=4, Ld=2, H=32)
        state = make_train_state(jax.random.PRNGKey(0), cfg, model)
        step = build_train_step(cfg, model, donate=False, base_radius=0.02)
        _, losses = step(state, rays, pixels, jax.random.PRNGKey(3))
        return np.asarray(losses)

    l_x = run("xla")
    with pltpu.force_tpu_interpret_mode():
        l_p = run("pallas")
    np.testing.assert_allclose(l_p, l_x, rtol=2e-4, atol=1e-6)
