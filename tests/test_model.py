import jax
import jax.numpy as jnp
import numpy as np

from nerf_simple_tpu.models.nerf import NerfMLP, init_nerf_params, nerf_apply
from tests.oracle import mlp_forward_np


def test_param_shapes_and_count():
    model = NerfMLP()
    params = init_nerf_params(jax.random.PRNGKey(0), model)
    dims = model.layer_dims()
    assert set(params) == set(dims)
    for name, (fi, fo) in dims.items():
        assert params[name]["w"].shape == (fi, fo)
        assert params[name]["b"].shape == (fo,)
    n = sum(int(np.prod(p["w"].shape)) + int(np.prod(p["b"].shape)) for p in params.values())
    # 595,844 params: matches the reference architecture's torch param count
    assert n == 595_844


def test_forward_matches_float64_oracle(rng):
    model = NerfMLP()
    params = init_nerf_params(jax.random.PRNGKey(1), model)
    v = rng.uniform(-2, 2, size=(64, 6)).astype(np.float32)
    v[:, 3:] /= np.linalg.norm(v[:, 3:], axis=-1, keepdims=True)
    ours = np.asarray(nerf_apply(params, jnp.asarray(v), model))
    params64 = jax.tree.map(lambda a: np.asarray(a, np.float64), params)
    ref = mlp_forward_np(params64, v.astype(np.float64))
    assert ours.shape == (64, 4)
    np.testing.assert_allclose(ours, ref, atol=5e-4)


def test_output_heads_have_no_activation():
    # sigma and color come straight out of linear layers: with all-zero
    # weights and a negative bias the output must be negative (no relu /
    # sigmoid / softplus applied in the model itself).
    model = NerfMLP()
    params = init_nerf_params(jax.random.PRNGKey(2), model)
    params = jax.tree.map(jnp.zeros_like, params)
    params["sigma"]["b"] = params["sigma"]["b"] - 3.0
    params["color1"]["b"] = params["color1"]["b"] - 2.0
    out = np.asarray(nerf_apply(params, jnp.zeros((4, 6)), model))
    np.testing.assert_allclose(out[:, 3], -3.0, atol=1e-6)
    np.testing.assert_allclose(out[:, :3], -2.0, atol=1e-6)


def test_bf16_compute_close_to_f32(rng):
    model = NerfMLP()
    params = init_nerf_params(jax.random.PRNGKey(3), model)
    v = rng.uniform(-1, 1, size=(128, 6)).astype(np.float32)
    f32 = np.asarray(nerf_apply(params, jnp.asarray(v), model))
    bf16 = np.asarray(
        nerf_apply(params, jnp.asarray(v), model, compute_dtype=jnp.bfloat16)
    )
    assert bf16.dtype == np.float32
    np.testing.assert_allclose(bf16, f32, atol=0.15)
