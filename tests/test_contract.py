"""Mip-NeRF 360 unbounded-scene support: scene contraction (model-level
field) + disparity-space stratified sampling.

Reference scope note: the torch reference (UCSD-Comp-Imaging/Nerf-Simple)
is bounded-Blender-only; this is an additive capability
(ops/encoding.py::scene_contraction, Barron et al. 2022 eqn. 10).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_simple_tpu.config import TrainConfig
from nerf_simple_tpu.models.nerf import NerfMLP, init_nerf_params
from nerf_simple_tpu.ops.encoding import scene_contraction


def test_scene_contraction_properties(rng):
    x = jnp.asarray(rng.normal(0, 5, (512, 3)), jnp.float32)
    y = np.asarray(scene_contraction(x))
    n_in = np.linalg.norm(np.asarray(x), axis=-1)
    n_out = np.linalg.norm(y, axis=-1)
    # identity inside the unit ball
    inside = n_in <= 1.0
    np.testing.assert_array_equal(y[inside], np.asarray(x)[inside])
    # everything lands strictly inside radius 2
    assert (n_out < 2.0).all()
    # radially monotone: larger input norm -> larger output norm
    order = np.argsort(n_in)
    assert (np.diff(n_out[order]) > -1e-6).all()
    # directions preserved
    d_in = np.asarray(x) / n_in[:, None]
    d_out = y / np.maximum(n_out, 1e-10)[:, None]
    np.testing.assert_allclose(d_out, d_in, atol=1e-5)
    # C0 at the boundary: ||x|| = 1 maps to itself
    unit = jnp.asarray(d_in[:8], jnp.float32)
    np.testing.assert_allclose(
        np.asarray(scene_contraction(unit)), np.asarray(unit), atol=1e-6
    )
    # a VERY far point approaches (but never reaches) radius 2
    far = scene_contraction(jnp.asarray([[1e6, 0.0, 0.0]]))
    np.testing.assert_allclose(float(far[0, 0]), 2.0, atol=1e-4)


def test_disparity_sampling_uniform_in_inverse_depth():
    from nerf_simple_tpu.ops.sampling import stratified_ts_spaced

    tn, tf, N = 1.0, 100.0, 64
    ts = np.asarray(
        stratified_ts_spaced(
            jax.random.PRNGKey(0), 256, N, tn, tf, space="disparity"
        )
    )
    assert ts.shape == (256, N)
    assert (np.diff(ts, axis=-1) > 0).all()  # ascending
    assert (ts >= tn - 1e-5).all() and (ts <= tf + 1e-3).all()
    # bin k's samples live in the k-th uniform bin of 1/t
    inv = 1.0 / ts
    edges = (1.0 / tn) + np.arange(N + 1) / N * (1.0 / tf - 1.0 / tn)
    for k in (0, N // 2, N - 1):
        assert (inv[:, k] <= edges[k] + 1e-6).all()
        assert (inv[:, k] >= edges[k + 1] - 1e-6).all()
    # linear spacing for comparison: first bin is ~1.5 units wide, while
    # disparity packs ~half the samples inside t < 2*tn
    assert (ts[:, N // 2] < 2 * tn + 0.1).all()


def test_contract_fused_matches_xla(rng):
    """NerfMLP(contract=True): the in-kernel contraction (elementwise on
    rows 0..2) must match the XLA model-boundary contraction — loss
    parity through a full train step (f32, interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu

    from nerf_simple_tpu.models import model_from_train_config
    from nerf_simple_tpu.train.step import build_train_step, make_train_state

    base = dict(
        datapath="x", Nf=16, contract=True, sampling_space="disparity",
        tn=0.5, tf=50.0, batch_size=8, steps_per_call=1, num_iters=1,
        net_Lp=6, net_Ld=2, net_H=32,
        ckpt_loss=10**9, ckpt_images=10**9, ckpt_model=10**9,
    )
    rng_np = np.random.default_rng(3)
    rays = jnp.asarray(
        np.concatenate(
            [rng_np.normal(0, 0.1, (64, 3)), rng_np.normal(size=(64, 3))],
            -1,
        ),
        jnp.float32,
    )
    pixels = jnp.asarray(rng_np.uniform(0, 1, (64, 3)), jnp.float32)
    key = jax.random.PRNGKey(7)
    losses = {}
    for backend in ("xla", "pallas"):
        cfg = TrainConfig(backend=backend, **base)
        model = model_from_train_config(cfg)
        assert model.contract
        state = make_train_state(jax.random.PRNGKey(0), cfg, model)
        step = build_train_step(cfg, model, donate=False)
        ctx = (
            pltpu.force_tpu_interpret_mode()
            if backend == "pallas"
            else jax.default_matmul_precision("highest")
        )
        with ctx:
            _, losses[backend] = step(state, rays, pixels, key)
    np.testing.assert_allclose(
        np.asarray(losses["pallas"]),
        np.asarray(losses["xla"]),
        rtol=2e-4,
        atol=1e-6,
    )


def test_contract_sidecar_roundtrip(tmp_path):
    """contract rides the model.json sidecar for BOTH families, so eval
    rebuilds the warped field without any TestConfig knob."""
    from nerf_simple_tpu.models import model_from_meta, model_meta
    from nerf_simple_tpu.models.hashgrid import HashGridModel
    from nerf_simple_tpu.train.checkpoint import (
        load_model_meta,
        save_model_meta,
    )

    for model in (
        NerfMLP(Lp=6, Ld=2, H=32, contract=True),
        HashGridModel(L=2, F=2, log2_T=8, aabb=2.0, contract=True),
    ):
        assert model_from_meta(model_meta(model)) == model
        d = str(tmp_path / type(model).__name__)
        save_model_meta(d, model)
        assert load_model_meta(d) == model


def test_contract_changes_field_only_outside_unit_ball(rng):
    """nerf_apply with contract flips: outputs identical for queries
    inside the unit ball, different outside (the warp is the identity
    inside)."""
    from nerf_simple_tpu.models.nerf import nerf_apply

    m0 = NerfMLP(Lp=4, Ld=2, H=32)
    m1 = NerfMLP(Lp=4, Ld=2, H=32, contract=True)
    params = init_nerf_params(jax.random.PRNGKey(0), m0)
    dirs = rng.normal(size=(32, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    near = np.concatenate([rng.uniform(-0.5, 0.5, (32, 3)), dirs], -1)
    far = np.concatenate([rng.uniform(2, 8, (32, 3)), dirs], -1)
    for q, should_match in ((near, True), (far, False)):
        a = np.asarray(nerf_apply(params, jnp.asarray(q, jnp.float32), m0))
        b = np.asarray(nerf_apply(params, jnp.asarray(q, jnp.float32), m1))
        if should_match:
            np.testing.assert_array_equal(a, b)
        else:
            assert np.abs(a - b).max() > 1e-4


def test_config_contract_validation():
    # mip + contract composes (linearized Gaussian warp)
    TrainConfig(datapath="x", contract=True, mip=True)
    with pytest.raises(ValueError, match="sampling_space"):
        TrainConfig(datapath="x", sampling_space="bogus")
    with pytest.raises(ValueError, match="NDC"):
        TrainConfig(datapath="x", contract=True, dataset="llff", ndc=True)
    # contracted non-NDC LLFF (real 360 captures via COLMAP) is allowed
    TrainConfig(datapath="x", contract=True, dataset="llff", ndc=False)


@pytest.mark.slow
def test_unbounded_scene_trains_and_evals(tmp_path):
    """e2e: contract + disparity sampling through the train loop and the
    eval driver (sidecar carries contract; eval needs no extra knob).
    The blob scene's content sits at radius ~1-2 — outside the unit
    ball, so the warp is genuinely active."""
    import os

    from nerf_simple_tpu.config import TestConfig
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
            exp_name="unb",
            Nf=16,
            contract=True,
            sampling_space="disparity",
            tn=0.5,
            tf=30.0,
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
            loadpath=os.path.join(root, "models", "unb"),
            datapath=scene,
            savepath=os.path.join(root, "results"),
            exp_name="unb",
            batch_size=576,
            half_res=False,
            im_set="test",
            im_idxs=(0,),
            animation=False,
            N_samples=16,
            sampling_space="disparity",
            tn=0.5,
            tf=30.0,
        )
    )
    assert os.path.exists(os.path.join(root, "results", "unb", "rgb_0.png"))


def test_contract_hierarchical_trains(rng):
    """contract + hierarchical: the two-net inverse-CDF scheme over a
    contracted field (both nets carry the model-level warp)."""
    from nerf_simple_tpu.models import model_from_train_config
    from nerf_simple_tpu.train.step import build_train_step, make_train_state

    cfg = TrainConfig(
        datapath="x", Nf=8, Nc=4, hierarchical=True, contract=True,
        sampling_space="disparity", tn=0.5, tf=50.0, batch_size=32,
        steps_per_call=2, num_iters=4, net_Lp=4, net_Ld=2, net_H=32,
        ckpt_loss=10**9, ckpt_images=10**9, ckpt_model=10**9,
    )
    model = model_from_train_config(cfg)
    state = make_train_state(jax.random.PRNGKey(0), cfg, model)
    step = build_train_step(cfg, model, donate=False)
    rays = jnp.asarray(
        np.concatenate(
            [rng.normal(0, 0.1, (128, 3)), rng.normal(size=(128, 3))], -1
        ),
        jnp.float32,
    )
    pixels = jnp.asarray(rng.uniform(0, 1, (128, 3)), jnp.float32)
    state, losses = step(state, rays, pixels, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(losses)).all()


def test_disparity_validation_gaps():
    """tn=0 would divide by zero in the 1/t bins; NDC already warps to
    disparity and its t-range starts at 0 — both rejected upfront."""
    from nerf_simple_tpu.config import TestConfig

    with pytest.raises(ValueError, match="tn > 0"):
        TrainConfig(datapath="x", sampling_space="disparity", tn=0.0)
    with pytest.raises(ValueError, match="redundant"):
        TrainConfig(
            datapath="x", sampling_space="disparity", dataset="llff",
            ndc=True,
        )
    with pytest.raises(ValueError, match="tn > 0"):
        TestConfig(
            loadpath="x", datapath="x", sampling_space="disparity", tn=0.0
        )


def test_contract_gaussian_matches_monte_carlo(rng):
    """Linearized Gaussian contraction vs 300k-sample Monte Carlo: for
    small variances (the frustum regime) the Jacobian propagation must
    track the empirical contracted mean/variance."""
    from nerf_simple_tpu.ops.encoding import contract_gaussian

    means = np.array([[3.0, -1.0, 2.0], [0.2, 0.1, -0.3], [0.0, 5.0, 0.0]])
    varis = np.array(
        [[0.02, 0.01, 0.015], [0.001, 0.002, 0.001], [0.01, 0.03, 0.02]]
    )
    m_out, v_out = contract_gaussian(
        jnp.asarray(means, jnp.float32), jnp.asarray(varis, jnp.float32)
    )
    n = 300_000
    for i in range(3):
        pts = means[i] + rng.normal(size=(n, 3)) * np.sqrt(varis[i])
        con = np.asarray(scene_contraction(jnp.asarray(pts, jnp.float32)))
        # linearization error is O(var); tolerances sized accordingly
        np.testing.assert_allclose(
            np.asarray(m_out)[i], con.mean(0), atol=5e-3
        )
        np.testing.assert_allclose(
            np.asarray(v_out)[i], con.var(0), rtol=0.15, atol=2e-5
        )
    # inside the unit ball (row 1): exact identity
    np.testing.assert_allclose(np.asarray(m_out)[1], means[1], atol=1e-7)
    np.testing.assert_allclose(np.asarray(v_out)[1], varis[1], rtol=1e-6)


@pytest.mark.slow
def test_mip_contract_fused_matches_xla(rng):
    """mip + contract: the in-kernel Gaussian contraction must match the
    XLA contract_gaussian path — train-step loss parity (f32,
    interpret)."""
    from jax.experimental.pallas import tpu as pltpu

    from nerf_simple_tpu.models import model_from_train_config
    from nerf_simple_tpu.train.step import build_train_step, make_train_state

    base = dict(
        datapath="x", Nf=16, mip=True, contract=True,
        sampling_space="disparity", tn=0.5, tf=50.0, batch_size=8,
        steps_per_call=1, num_iters=1, net_Lp=6, net_Ld=2, net_H=32,
        ckpt_loss=10**9, ckpt_images=10**9, ckpt_model=10**9,
    )
    rng_np = np.random.default_rng(21)
    rays = jnp.asarray(
        np.concatenate(
            [rng_np.normal(0, 0.1, (64, 3)), rng_np.normal(size=(64, 3))],
            -1,
        ),
        jnp.float32,
    )
    pixels = jnp.asarray(rng_np.uniform(0, 1, (64, 3)), jnp.float32)
    key = jax.random.PRNGKey(23)
    losses = {}
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
            _, losses[backend] = step(state, rays, pixels, key)
    np.testing.assert_allclose(
        np.asarray(losses["pallas"]),
        np.asarray(losses["xla"]),
        rtol=2e-4,
        atol=1e-6,
    )


def test_distortion_s_space_tames_far_disparity_bins():
    """A perfectly sharp FAR surface under disparity spacing: in raw t
    its bin alone spans tens of units and the distortion self term
    w^2*delta/3 is order-1+ — the s-space normalization (train/step.py::
    _s_norm, mip-NeRF 360 eqn. 15) bounds it by the 1/N bin width."""
    from nerf_simple_tpu.ops.sampling import stratified_ts_spaced
    from nerf_simple_tpu.ops.volume import distortion_loss

    B, N, tn, tf = 16, 64, 0.5, 100.0
    ts = stratified_ts_spaced(
        jax.random.PRNGKey(0), B, N, tn, tf, space="disparity"
    )
    # all weight on the farthest NON-TAIL sample (a single opaque far
    # surface; distortion_loss excludes the tail bin itself) — under
    # disparity spacing that bin spans ~10 t-units
    w = (jnp.arange(N) == N - 2).astype(jnp.float32)
    w = jnp.broadcast_to(w, (B, N))
    raw = float(distortion_loss(w, ts))
    s = (1.0 / tn - 1.0 / ts) / (1.0 / tn - 1.0 / tf)
    snorm = float(distortion_loss(w, s))
    assert raw > 1.0, raw  # the failure mode the fix removes
    assert snorm < 0.02, snorm  # bounded by the ~1/N s-space bin width


@pytest.mark.slow
def test_full_360_recipe_e2e(tmp_path):
    """The complete colmap360.yaml recipe shape through the real
    drivers: contract + disparity + proposal + distortion trained
    together, then proposal-guided eval from the checkpoint (sidecar
    recovers contract; Np in test_params recovers the proposal arch).
    Benchmark context: on the radius-varied unbounded fixture this
    combination is the ONLY one that generalizes to novel views
    (benchmarks/unbounded_bench.json) — pin that it stays wired."""
    import os

    from nerf_simple_tpu.config import TestConfig
    from nerf_simple_tpu.data.synthetic import write_blender_scene
    from nerf_simple_tpu.evaluate import test as run_eval
    from nerf_simple_tpu.train.loop import train

    root = str(tmp_path)
    scene = os.path.join(root, "scene")
    write_blender_scene(scene, n_train=3, n_val=1, n_test=1, H=20, W=20)
    state = train(
        TrainConfig(
            datapath=scene,
            savepath=os.path.join(root, "models"),
            exp_name="full360",
            Nf=8,
            contract=True,
            sampling_space="disparity",
            tn=0.5,
            tf=30.0,
            proposal=True,
            Np=8,
            prop_Lp=4,
            prop_D=2,
            prop_H=32,
            distortion_loss_weight=0.01,
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
    assert int(state.step) == 20
    run_eval(
        TestConfig(
            loadpath=os.path.join(root, "models", "full360"),
            datapath=scene,
            savepath=os.path.join(root, "results"),
            exp_name="full360",
            batch_size=512,
            half_res=False,
            im_set="test",
            im_idxs=(0,),
            animation=False,
            N_samples=8,
            Np=8,
            sampling_space="disparity",
            tn=0.5,
            tf=30.0,
        )
    )
    assert os.path.exists(
        os.path.join(root, "results", "full360", "rgb_0.png")
    )
