"""Hash-grid model family (models/hashgrid.py): encoding oracle, apply
contract, gradient flow, train integration, and checkpoint metadata.

The encoding is validated against an independent float64 numpy oracle
(same role as tests/oracle.py for the reference math): trilinear
interpolation over dense/hashed tables must match to f32 tolerance.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_simple_tpu.models.hashgrid import (
    HashGridModel,
    _PRIMES,
    hash_encode,
    hashgrid_apply,
    init_hashgrid_params,
)


def _oracle_encode(tables, x01, model):
    """float64 numpy re-derivation of the multiresolution hash encoding."""
    x01 = np.clip(np.asarray(x01, np.float64), 0.0, 1.0)
    B = x01.shape[0]
    out = np.zeros((B, model.L * model.F), np.float64)
    sizes, offsets = model.level_sizes(), model.level_offsets()
    for lvl, R in enumerate(model.resolutions()):
        xs = x01 * R
        x0 = np.clip(np.floor(xs), 0, R - 1).astype(np.int64)
        frac = xs - x0
        acc = np.zeros((B, model.F), np.float64)
        V = R + 1
        level_tab = np.asarray(tables, np.float64)[
            offsets[lvl] : offsets[lvl] + sizes[lvl]
        ]
        for c in range(8):
            off = np.array([(c >> d) & 1 for d in range(3)])
            corner = x0 + off
            if V**3 <= sizes[lvl]:
                idx = (corner[:, 0] * V + corner[:, 1]) * V + corner[:, 2]
            else:
                h = (
                    corner[:, 0].astype(np.uint64) * _PRIMES[0]
                    ^ corner[:, 1].astype(np.uint64) * _PRIMES[1]
                    ^ corner[:, 2].astype(np.uint64) * _PRIMES[2]
                )
                # uint32 wraparound semantics, then power-of-two mod
                idx = (h & 0xFFFFFFFF) % sizes[lvl]
            w = np.prod(np.where(off, frac, 1.0 - frac), axis=-1)
            acc += w[:, None] * level_tab[idx]
        out[:, lvl * model.F : (lvl + 1) * model.F] = acc
    return out


@pytest.fixture
def small_model():
    # mixes dense levels ((R+1)^3 <= T for R=4) and hashed levels (R=32)
    return HashGridModel(
        L=4, F=2, log2_T=9, N_min=4, N_max=32, H=32, geo_feat=7, aabb=2.0
    )


def test_encoding_matches_numpy_oracle(small_model, rng):
    tables = jnp.asarray(
        rng.standard_normal((small_model.total_rows, small_model.F)),
        jnp.float32,
    )
    x01 = jnp.asarray(rng.random((257, 3)), jnp.float32)
    got = hash_encode(tables, x01, small_model)
    want = _oracle_encode(tables, x01, small_model)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_encoding_exact_at_grid_vertices(small_model, rng):
    """At an exact vertex of a DENSE level the interpolation collapses to
    that vertex's table row (all trilinear weight on one corner)."""
    tables = jnp.asarray(
        rng.standard_normal((small_model.total_rows, small_model.F)),
        jnp.float32,
    )
    R = small_model.resolutions()[0]  # dense level: (R+1)^3 = 125 <= 128
    assert (R + 1) ** 3 <= small_model.level_sizes()[0]
    vi, vj, vk = 1, 3, 2  # an interior vertex
    x01 = jnp.array([[vi / R, vj / R, vk / R]], jnp.float32)
    got = np.asarray(hash_encode(tables, x01, small_model))[0, : small_model.F]
    V = R + 1
    # level 0 sits at offset 0 of the flat ragged table
    want = np.asarray(tables[(vi * V + vj) * V + vk])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_encoding_clamps_out_of_aabb(small_model, rng):
    tables = jnp.asarray(
        rng.standard_normal((small_model.total_rows, small_model.F)),
        jnp.float32,
    )
    inside = hash_encode(
        tables, jnp.array([[0.0, 1.0, 0.5]], jnp.float32), small_model
    )
    outside = hash_encode(
        tables, jnp.array([[-3.0, 7.0, 0.5]], jnp.float32), small_model
    )
    np.testing.assert_allclose(
        np.asarray(inside), np.asarray(outside), rtol=1e-6
    )


def test_apply_contract_and_grads(small_model):
    params = init_hashgrid_params(jax.random.PRNGKey(0), small_model)
    v = jax.random.normal(jax.random.PRNGKey(1), (64, 6))
    out = jax.jit(
        lambda p, v: hashgrid_apply(p, v, small_model)
    )(params, v)
    assert out.shape == (64, 4)
    assert out.dtype == jnp.float32
    assert bool(jnp.isfinite(out).all())

    g = jax.grad(
        lambda p: jnp.mean(hashgrid_apply(p, v, small_model) ** 2)
    )(params)
    # gradient reaches the tables (the scatter-add transpose of the
    # gather) and every head layer
    assert float(jnp.abs(g["tables"]).sum()) > 0
    for name in ("sigma0", "sigma1", "color0", "color1", "color2"):
        assert float(jnp.abs(g[name]["w"]).sum()) > 0


def test_apply_bf16_close_to_f32(small_model):
    params = init_hashgrid_params(jax.random.PRNGKey(0), small_model)
    v = jax.random.normal(jax.random.PRNGKey(1), (64, 6))
    f32 = hashgrid_apply(params, v, small_model, compute_dtype=jnp.float32)
    bf16 = hashgrid_apply(params, v, small_model, compute_dtype=jnp.bfloat16)
    assert bf16.dtype == jnp.float32  # f32 outputs either way
    np.testing.assert_allclose(
        np.asarray(f32), np.asarray(bf16), rtol=0.05, atol=0.05
    )


def test_render_rays_with_hashgrid(small_model):
    from nerf_simple_tpu.render.renderer import RenderSettings, render_rays

    params = init_hashgrid_params(jax.random.PRNGKey(0), small_model)
    o = jnp.zeros((32, 3))
    d = jax.random.normal(jax.random.PRNGKey(2), (32, 3))
    rays = jnp.concatenate([o, d], axis=1)
    out = render_rays(
        params, rays, jax.random.PRNGKey(3), RenderSettings(N=16), small_model
    )
    assert out.rgb.shape == (32, 3)
    assert bool(jnp.isfinite(out.rgb).all())
    assert bool(jnp.isfinite(out.disp).all())


@pytest.mark.slow
def test_train_step_hashgrid_loss_decreases(small_model):
    """A few hundred steps on a fixed ray batch must fit it (the hash
    tables memorize fast — that is the family's whole point)."""
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
        model_family="hashgrid",
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


def test_sampled_grad_preserves_level_totals(small_model, rng):
    """The one-corner stochastic table gradient contributes each query's
    g exactly once per level, so per-level COLUMN TOTALS of dT match the
    exact estimator to float tolerance (the stochasticity only moves
    mass between rows of a level)."""
    from nerf_simple_tpu.models.hashgrid import hash_encode

    exact = dataclasses.replace(small_model, grad_mode="exact")
    sampled = dataclasses.replace(small_model, grad_mode="sample")
    tables = jnp.asarray(
        rng.standard_normal((small_model.total_rows, small_model.F)),
        jnp.float32,
    )
    x01 = jnp.asarray(rng.random((1024, 3)), jnp.float32)
    gout = jnp.asarray(
        rng.standard_normal((1024, small_model.L * small_model.F)),
        jnp.float32,
    )

    def bwd(model):
        _, vjp = jax.vjp(lambda t: hash_encode(t, x01, model), tables)
        return vjp(gout)[0]

    dte, dts = bwd(exact), bwd(sampled)
    offs, sizes = small_model.level_offsets(), small_model.level_sizes()
    for lvl in range(small_model.L):
        te = np.asarray(dte[offs[lvl] : offs[lvl] + sizes[lvl]]).sum(0)
        ts = np.asarray(dts[offs[lvl] : offs[lvl] + sizes[lvl]]).sum(0)
        np.testing.assert_allclose(te, ts, rtol=1e-4, atol=1e-3)
    # and the distributions correlate strongly (unbiased estimator over
    # ~1K quasi-random positions)
    a, b = np.asarray(dte).ravel(), np.asarray(dts).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert cos > 0.5, cos


def test_config_validation():
    from nerf_simple_tpu.config import TrainConfig

    with pytest.raises(ValueError, match="model_family"):
        TrainConfig(datapath="", model_family="instantngp")
    with pytest.raises(ValueError, match="pallas"):
        TrainConfig(datapath="", model_family="hashgrid", backend="pallas")


def test_model_meta_roundtrip(tmp_path, small_model):
    from nerf_simple_tpu.train.checkpoint import (
        load_model_meta,
        save_model_meta,
    )

    save_model_meta(str(tmp_path), small_model)
    got = load_model_meta(str(tmp_path))
    assert got == small_model
    # and from a file path inside the dir (npz/ckpt sibling lookup)
    got2 = load_model_meta(str(tmp_path / "params_final.npz"))
    assert got2 == small_model


def test_model_from_train_config():
    from nerf_simple_tpu.config import TrainConfig
    from nerf_simple_tpu.models import NerfMLP, model_from_train_config

    cfg = TrainConfig(datapath="")
    assert model_from_train_config(cfg) == NerfMLP()
    cfg = TrainConfig(
        datapath="",
        model_family="hashgrid",
        hash_L=6,
        hash_aabb=2.5,
        net_Ld=3,
    )
    m = model_from_train_config(cfg)
    assert isinstance(m, HashGridModel)
    assert (m.L, m.aabb, m.Ld) == (6, 2.5, 3)


def test_npz_export_roundtrip_hashgrid(tmp_path, small_model):
    from nerf_simple_tpu.train.checkpoint import (
        export_params_npz,
        import_params_npz,
    )

    params = init_hashgrid_params(jax.random.PRNGKey(0), small_model)
    path = str(tmp_path / "p.npz")
    export_params_npz(path, params)
    back = import_params_npz(path)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        params,
        back,
    )


def test_infer_model_fallback(small_model):
    from nerf_simple_tpu.models import infer_model

    # params from a NON-default grid layout: statics are unrecoverable
    # from shapes, so without the model.json sidecar this must refuse
    # rather than silently rebuild a wrong model
    params = init_hashgrid_params(jax.random.PRNGKey(0), small_model)
    with pytest.raises(ValueError, match="model.json"):
        infer_model(params)

    # default-layout params fall back to the family defaults with a warning
    default_model = HashGridModel()
    params = init_hashgrid_params(jax.random.PRNGKey(0), default_model)
    with pytest.warns(UserWarning, match="model.json"):
        m = infer_model(params)
    assert m == default_model


@pytest.mark.slow
def test_hierarchical_hashgrid_render(small_model):
    from nerf_simple_tpu.render.renderer import (
        RenderSettings,
        render_rays_hierarchical,
    )

    kc, kf = jax.random.split(jax.random.PRNGKey(0))
    params_c = init_hashgrid_params(kc, small_model)
    params_f = init_hashgrid_params(kf, small_model)
    rays = jnp.concatenate(
        [jnp.zeros((16, 3)), jax.random.normal(jax.random.PRNGKey(2), (16, 3))],
        axis=1,
    )
    settings = RenderSettings(N=16, N_coarse=8)
    coarse, fine = render_rays_hierarchical(
        params_c, params_f, rays, jax.random.PRNGKey(3), settings, small_model
    )
    assert fine.rgb.shape == (16, 3)
    assert fine.weights.shape == (16, 24)  # Nc + N union
    assert bool(jnp.isfinite(fine.rgb).all())


def test_onecorner_forward_unbiased(small_model, rng):
    """E[one-corner encoding] = exact trilinear interpolation: over many
    quasi-random positions the mean discrepancy must be tiny relative to
    the per-query noise std."""
    from nerf_simple_tpu.models.hashgrid import (
        _hash_encode_exact,
        _hash_encode_onecorner,
    )

    tables = jnp.asarray(
        rng.standard_normal((small_model.total_rows, small_model.F)),
        jnp.float32,
    )
    x01 = jnp.asarray(rng.random((100000, 3)), jnp.float32)
    d = np.asarray(
        _hash_encode_onecorner(tables, x01, small_model)
        - _hash_encode_exact(tables, x01, small_model)
    )
    assert np.abs(d.mean(axis=0)).max() < 0.02  # bias << noise
    assert d.std() > 0.1  # it IS stochastic (not silently exact)


def test_onecorner_autodiff_scatters_one_row(small_model, rng):
    """The autodiff transpose of the one-corner forward scatters each
    query's cotangent into exactly one row per level — per-level column
    totals equal the cotangent totals (same invariant as grad_mode
    'sample')."""
    from nerf_simple_tpu.models.hashgrid import hash_encode

    model = dataclasses.replace(small_model, grad_mode="sample-fwd")
    tables = jnp.asarray(
        rng.standard_normal((small_model.total_rows, small_model.F)),
        jnp.float32,
    )
    x01 = jnp.asarray(rng.random((512, 3)), jnp.float32)
    g = jnp.asarray(
        rng.standard_normal((512, model.L * model.F)), jnp.float32
    )
    _, vjp = jax.vjp(lambda t: hash_encode(t, x01, model), tables)
    dT = np.asarray(vjp(g)[0])
    offs, sizes = model.level_offsets(), model.level_sizes()
    for lvl in range(model.L):
        got = dT[offs[lvl] : offs[lvl] + sizes[lvl]].sum(0)
        want = np.asarray(g[:, lvl * model.F : (lvl + 1) * model.F]).sum(0)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


@pytest.mark.slow
def test_hash_fwd_mode_training(small_model):
    """hash_fwd_mode: sample trains (loss decreases) while checkpoints
    record the EXACT-interpolation model for eval."""
    from nerf_simple_tpu.config import TrainConfig
    from nerf_simple_tpu.models import model_from_train_config
    from nerf_simple_tpu.train.step import build_train_step, make_train_state

    cfg = TrainConfig(
        datapath="", model_family="hashgrid", backend="xla",
        batch_size=256, Nf=16, num_iters=200, steps_per_call=20,
        honor_lr_init=True, lr_init=5e-3, lr_final=5e-4,
        hash_L=2, hash_F=2, hash_log2_T=8, hash_Nmin=4, hash_Nmax=8,
        hash_H=16, hash_fwd_mode="sample",
    )
    model = model_from_train_config(cfg)
    assert model.grad_mode != "sample-fwd"  # eval model stays exact
    key = jax.random.PRNGKey(0)
    state = make_train_state(key, cfg, model)
    step = build_train_step(cfg, model, donate=False)
    k = jax.random.PRNGKey(5)
    o = jax.random.normal(jax.random.fold_in(k, 0), (512, 3)) * 0.1
    d = jax.random.normal(jax.random.fold_in(k, 1), (512, 3))
    rays = jnp.concatenate([o, d], axis=1)
    pixels = jax.nn.sigmoid(jax.random.normal(jax.random.fold_in(k, 2), (512, 3)))
    first = None
    for i in range(10):
        state, losses = step(state, rays, pixels, jax.random.fold_in(k, i))
        if first is None:
            first = float(losses[0])
    assert bool(jnp.isfinite(losses).all())
    assert float(losses[-1]) < 0.5 * first, (first, float(losses[-1]))

    from nerf_simple_tpu.config import TrainConfig as TC

    with pytest.raises(ValueError, match="hash_fwd_mode"):
        TC(datapath="", hash_fwd_mode="bogus")


def test_proposal_hashgrid_combo_trains():
    """model_family=hashgrid + proposal=true (the nerfacto-style combo):
    the tiny PE-MLP proposal places the hash field's samples; the
    {prop, fine} param dict trains with finite decreasing losses. (Note
    the TUNED hashgrid preset uses occupancy placement instead — an EMA
    grid is cheaper than proposal probes at hashgrid's small Nf; this
    test pins that the combo keeps working for users who choose it.)"""
    from nerf_simple_tpu.config import TrainConfig
    from nerf_simple_tpu.models import model_from_train_config
    from nerf_simple_tpu.train.step import build_train_step, make_train_state

    cfg = TrainConfig(
        datapath="", model_family="hashgrid", backend="xla",
        proposal=True, Np=8, prop_Lp=4, prop_D=2, prop_H=16,
        batch_size=128, Nf=16, num_iters=40, steps_per_call=20,
        honor_lr_init=True, lr_init=5e-3, lr_final=5e-4,
        hash_L=2, hash_F=2, hash_log2_T=8, hash_Nmin=4, hash_Nmax=8,
        hash_H=16,
    )
    model = model_from_train_config(cfg)
    state = make_train_state(jax.random.PRNGKey(0), cfg, model)
    step = build_train_step(cfg, model, donate=False)
    k = jax.random.PRNGKey(5)
    o = jax.random.normal(jax.random.fold_in(k, 0), (256, 3)) * 0.1
    d = jax.random.normal(jax.random.fold_in(k, 1), (256, 3))
    rays = jnp.concatenate([o, d], axis=1)
    pixels = jax.nn.sigmoid(
        jax.random.normal(jax.random.fold_in(k, 2), (256, 3))
    )
    state, l0 = step(state, rays, pixels, jax.random.fold_in(k, 0))
    state, l1 = step(state, rays, pixels, jax.random.fold_in(k, 1))
    assert set(state.params) == {"prop", "fine"}
    assert bool(jnp.isfinite(l1).all())
    assert float(l1[-1]) < float(l0[0])
