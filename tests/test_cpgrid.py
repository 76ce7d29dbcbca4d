"""CP-grid model family (models/cpgrid.py): hat-basis interpolation
oracle, CP evaluation vs a float64 numpy re-derivation, apply contract,
gradient flow, the split-lr optimizer, train integration, and checkpoint
metadata.

Mirrors tests/test_hashgrid.py's strategy: the encoding is validated
against an independent float64 numpy oracle (multilinear interpolation of
each axis line, triple product, component sums), not against its own
implementation.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_simple_tpu.models.cpgrid import (
    CPGridModel,
    cp_encode,
    cpgrid_apply,
    hat_weights,
    init_cpgrid_params,
)


def _oracle_encode(params, x01, model):
    """float64 numpy re-derivation of the CP field query."""
    x01 = np.clip(np.asarray(x01, np.float64), 0.0, 1.0)
    B = x01.shape[0]
    sig = np.zeros((B, 1))
    app_parts = []
    for lvl, R in enumerate(model.Rs):
        lines = np.asarray(params[f"lines{lvl}"], np.float64)  # (3, V, C)
        prod = np.ones((B, model.C))
        for axis in range(3):
            u = x01[:, axis] * R
            e = np.stack(
                [
                    np.interp(u, np.arange(R + 1), lines[axis][:, c])
                    for c in range(model.C)
                ],
                axis=-1,
            )
            prod *= e
        sig += prod[:, : model.Cs].sum(-1, keepdims=True)
        app_parts.append(prod[:, model.Cs :])
    app = np.concatenate(app_parts, axis=-1)
    feat = app @ np.asarray(params["basis"], np.float64)
    return sig, feat


@pytest.fixture
def small_model():
    return CPGridModel(Rs=(4, 12), Cs=3, Ca=5, P=9, Ld=2, H=16, aabb=2.0)


def test_hat_weights_are_exact_linear_interp(rng):
    u = jnp.asarray(rng.random(33) * 8, jnp.float32)
    W = np.asarray(hat_weights(u, 9))
    # partition of unity, two adjacent nonzeros
    np.testing.assert_allclose(W.sum(1), 1.0, atol=1e-6)
    assert ((W > 0).sum(1) <= 2).all()
    tab = rng.standard_normal((9, 4)).astype(np.float32)
    got = W @ tab
    want = np.stack(
        [
            np.interp(np.asarray(u, np.float64), np.arange(9), tab[:, c])
            for c in range(4)
        ],
        axis=-1,
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_hat_weights_at_vertices(rng):
    """Integer coordinates put all weight on one vertex."""
    W = np.asarray(hat_weights(jnp.arange(9, dtype=jnp.float32), 9))
    np.testing.assert_allclose(W, np.eye(9), atol=1e-6)


def test_encode_matches_numpy_oracle(small_model, rng):
    params = init_cpgrid_params(jax.random.PRNGKey(0), small_model)
    x01 = jnp.asarray(rng.random((257, 3)), jnp.float32)
    sig, feat = cp_encode(params, x01, small_model)
    sig_w, feat_w = _oracle_encode(params, x01, small_model)
    np.testing.assert_allclose(np.asarray(sig), sig_w, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(feat), feat_w, rtol=2e-4, atol=2e-5)


def test_encode_clamps_out_of_aabb(small_model, rng):
    params = init_cpgrid_params(jax.random.PRNGKey(0), small_model)
    inside = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.5, 0.0]], jnp.float32)
    outside = jnp.asarray([[-3.0, -1.0, 7.7], [9.0, 0.5, -2.0]], jnp.float32)
    si, fi = cp_encode(params, inside, small_model)
    so, fo = cp_encode(params, outside, small_model)
    np.testing.assert_allclose(np.asarray(si), np.asarray(so), atol=1e-6)
    np.testing.assert_allclose(np.asarray(fi), np.asarray(fo), atol=1e-6)


def test_apply_contract_and_grads(small_model):
    """(B, 6) -> (B, 4) contract; gradients reach EVERY param leaf (no
    dead components)."""
    params = init_cpgrid_params(jax.random.PRNGKey(0), small_model)
    v = jax.random.normal(jax.random.PRNGKey(1), (64, 6))
    out = cpgrid_apply(params, v, small_model)
    assert out.shape == (64, 4)
    assert out.dtype == jnp.float32

    def loss(p):
        o = cpgrid_apply(p, v, small_model)
        # touch color AND sigma so both branches carry gradient
        return jnp.sum(o**2)

    grads = jax.grad(loss)(params)
    for path, g in jax.tree_util.tree_leaves_with_path(grads):
        assert float(jnp.abs(g).max()) > 0, f"dead gradient at {path}"


def test_sigma_independent_of_dirs(small_model):
    params = init_cpgrid_params(jax.random.PRNGKey(0), small_model)
    xyz = jax.random.normal(jax.random.PRNGKey(1), (32, 3))
    d1 = jax.random.normal(jax.random.PRNGKey(2), (32, 3))
    d2 = jax.random.normal(jax.random.PRNGKey(3), (32, 3))
    o1 = cpgrid_apply(params, jnp.concatenate([xyz, d1], -1), small_model)
    o2 = cpgrid_apply(params, jnp.concatenate([xyz, d2], -1), small_model)
    np.testing.assert_allclose(
        np.asarray(o1[:, 3]), np.asarray(o2[:, 3]), atol=1e-6
    )
    assert float(jnp.abs(o1[:, :3] - o2[:, :3]).max()) > 1e-4


def test_apply_bf16_close_to_f32(small_model):
    params = init_cpgrid_params(jax.random.PRNGKey(0), small_model)
    v = jax.random.normal(jax.random.PRNGKey(1), (128, 6))
    f32 = cpgrid_apply(params, v, small_model, compute_dtype=jnp.float32)
    bf16 = cpgrid_apply(params, v, small_model, compute_dtype=jnp.bfloat16)
    assert bf16.dtype == jnp.float32  # f32 out regardless of compute
    np.testing.assert_allclose(
        np.asarray(f32), np.asarray(bf16), rtol=0.1, atol=0.05
    )


def test_render_rays_with_cpgrid(small_model):
    """The family-agnostic render path works unchanged."""
    from nerf_simple_tpu.render.renderer import RenderSettings, render_rays

    params = init_cpgrid_params(jax.random.PRNGKey(0), small_model)
    o = jax.random.normal(jax.random.PRNGKey(1), (16, 3)) * 0.1
    d = jax.random.normal(jax.random.PRNGKey(2), (16, 3))
    rays = jnp.concatenate([o, d], axis=1)
    out = render_rays(
        params,
        rays,
        jax.random.PRNGKey(3),
        RenderSettings(N=8, backend="xla"),
        small_model,
    )
    assert out.rgb.shape == (16, 3)
    assert bool(jnp.all(jnp.isfinite(out.rgb)))


def test_split_lr_optimizer_labels(small_model):
    """Grid lines ride cp_lr_grid; basis/decoder the main schedule —
    verified through one update's magnitude ratio at equal gradients."""
    import optax

    from nerf_simple_tpu.config import TrainConfig
    from nerf_simple_tpu.train.step import make_optimizer

    cfg = TrainConfig(
        datapath="",
        model_family="cpgrid",
        backend="xla",
        honor_lr_init=True,
        lr_init=1e-3,
        lr_final=1e-3,
        cp_lr_grid=2e-2,
    )
    params = init_cpgrid_params(jax.random.PRNGKey(0), small_model)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    # Adam's first step is exactly -lr * sign-ish; ratio == lr ratio
    u_grid = float(jnp.abs(updates["lines0"]).mean())
    u_mlp = float(jnp.abs(updates["color0"]["w"]).mean())
    assert u_grid / u_mlp == pytest.approx(20.0, rel=0.05)
    u_basis = float(jnp.abs(updates["basis"]).mean())
    assert u_basis / u_mlp == pytest.approx(1.0, rel=0.05)


@pytest.mark.slow
def test_train_step_cpgrid_loss_decreases(small_model):
    """A few hundred steps on a fixed ray batch must fit it (grid
    families memorize fast — that is the family's whole point)."""
    from nerf_simple_tpu.config import TrainConfig
    from nerf_simple_tpu.train.step import build_train_step, make_train_state

    cfg = TrainConfig(
        datapath="",
        batch_size=256,
        Nf=16,
        num_iters=300,
        steps_per_call=100,
        lr_init=5e-3,
        lr_final=5e-3,
        honor_lr_init=True,
        model_family="cpgrid",
        backend="xla",
        seed=0,
    )
    key = jax.random.PRNGKey(0)
    state = make_train_state(key, cfg, small_model)
    step_fn = build_train_step(cfg, small_model, donate=False)

    k = jax.random.PRNGKey(7)
    o = jax.random.normal(jax.random.fold_in(k, 0), (512, 3)) * 0.1
    d = jax.random.normal(jax.random.fold_in(k, 1), (512, 3))
    rays = jnp.concatenate([o, d], axis=1)
    pixels = jax.nn.sigmoid(
        jax.random.normal(jax.random.fold_in(k, 2), (512, 3))
    )
    losses0 = None
    for c in range(3):
        state, losses = step_fn(state, rays, pixels, jax.random.fold_in(k, c))
        if losses0 is None:
            losses0 = float(losses[0])
    assert float(losses[-1]) < 0.5 * losses0, (losses0, float(losses[-1]))


def test_config_validation():
    from nerf_simple_tpu.config import TrainConfig

    with pytest.raises(ValueError, match="model_family"):
        TrainConfig(datapath="", model_family="tensorf")
    with pytest.raises(ValueError, match="pallas"):
        TrainConfig(datapath="", model_family="cpgrid", backend="pallas")
    with pytest.raises(ValueError, match="cp_Rs"):
        TrainConfig(
            datapath="", model_family="cpgrid", backend="xla", cp_Rs=()
        )
    with pytest.raises(ValueError, match="component"):
        TrainConfig(
            datapath="", model_family="cpgrid", backend="xla", cp_Cs=0
        )
    with pytest.raises(ValueError, match="mip"):
        TrainConfig(
            datapath="", model_family="cpgrid", backend="xla", mip=True
        )


def test_model_meta_roundtrip(tmp_path, small_model):
    import json

    from nerf_simple_tpu.models import model_from_meta, model_meta

    meta = json.loads(json.dumps(model_meta(small_model)))
    assert meta["family"] == "cpgrid"
    m2 = model_from_meta(meta)
    assert m2 == small_model
    assert isinstance(m2.Rs, tuple)  # json round-trips the tuple as a list


def test_model_from_train_config():
    from nerf_simple_tpu.config import TrainConfig
    from nerf_simple_tpu.models import model_from_train_config

    cfg = TrainConfig(
        datapath="",
        model_family="cpgrid",
        backend="xla",
        cp_Rs=[8, 32],  # YAML delivers lists
        cp_Cs=4,
        cp_Ca=8,
        cp_P=12,
        cp_H=24,
        cp_aabb=3.0,
        net_Ld=3,
        contract=True,
    )
    m = model_from_train_config(cfg)
    assert m == CPGridModel(
        Rs=(8, 32), Cs=4, Ca=8, P=12, Ld=3, H=24, aabb=3.0, contract=True
    )


def test_infer_model_fallback(small_model):
    """Defaults-shaped params infer back to the default model (with a
    sidecar warning); custom splits raise."""
    from nerf_simple_tpu.models import infer_model

    params = init_cpgrid_params(jax.random.PRNGKey(0), CPGridModel())
    with pytest.warns(UserWarning, match="sidecar"):
        m = infer_model(params)
    assert m == CPGridModel()

    custom = dataclasses.replace(CPGridModel(), Cs=64, Ca=64)
    params_c = init_cpgrid_params(jax.random.PRNGKey(0), custom)
    with pytest.raises(ValueError, match="split"):
        infer_model(params_c)


def test_npz_export_roundtrip_cpgrid(tmp_path, small_model):
    from nerf_simple_tpu.train.checkpoint import (
        export_params_npz,
        import_params_npz,
    )

    params = init_cpgrid_params(jax.random.PRNGKey(0), small_model)
    path = str(tmp_path / "cp.npz")
    export_params_npz(path, params)
    back = import_params_npz(path)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        params,
        back,
    )


@pytest.mark.slow
def test_hierarchical_cpgrid_render(small_model):
    """Coarse/fine with cpgrid fields through the family-agnostic path."""
    from nerf_simple_tpu.render.renderer import (
        RenderSettings,
        render_rays_hierarchical,
    )

    kc, kf = jax.random.split(jax.random.PRNGKey(0))
    params_c = init_cpgrid_params(kc, small_model)
    params_f = init_cpgrid_params(kf, small_model)
    o = jax.random.normal(jax.random.PRNGKey(1), (8, 3)) * 0.1
    d = jax.random.normal(jax.random.PRNGKey(2), (8, 3))
    rays = jnp.concatenate([o, d], axis=1)
    coarse, fine = render_rays_hierarchical(
        params_c,
        params_f,
        rays,
        jax.random.PRNGKey(3),
        RenderSettings(N=8, N_coarse=4, backend="xla"),
        small_model,
    )
    assert fine.rgb.shape == (8, 3)
    assert bool(jnp.all(jnp.isfinite(fine.rgb)))
