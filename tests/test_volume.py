import jax.numpy as jnp
import numpy as np

from nerf_simple_tpu.ops.volume import composite
from tests.oracle import composite_np


def test_composite_matches_naive_loop_oracle(rng):
    B, N = 32, 48
    rgb_sigma = rng.normal(0, 2, size=(B, N, 4)).astype(np.float32)
    ts = np.sort(rng.uniform(2, 6, size=(B, N)), axis=-1).astype(np.float32)
    dirs = rng.normal(size=(B, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    out = composite(jnp.asarray(rgb_sigma), jnp.asarray(ts), jnp.asarray(dirs))
    o_rgb, o_disp, o_alpha, o_acc, o_w, o_depth = composite_np(
        rgb_sigma.astype(np.float64), ts.astype(np.float64), dirs.astype(np.float64)
    )
    np.testing.assert_allclose(np.asarray(out.alpha), o_alpha, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.weights), o_w, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.rgb), o_rgb, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.acc), o_acc, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.depth), o_depth, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.disp), o_disp, rtol=1e-4)


def test_opaque_first_sample_takes_all_weight():
    # huge sigma at sample 0 -> alpha ~ 1 -> weight 1 at sample 0, ~0 after
    B, N = 4, 16
    rgb_sigma = np.zeros((B, N, 4), np.float32)
    rgb_sigma[:, 0, 3] = 1e4
    rgb_sigma[:, :, :3] = 0.25
    ts = np.broadcast_to(np.linspace(2, 6, N, dtype=np.float32), (B, N)).copy()
    dirs = np.tile(np.array([[0, 0, -1]], np.float32), (B, 1))
    out = composite(jnp.asarray(rgb_sigma), jnp.asarray(ts), jnp.asarray(dirs))
    w = np.asarray(out.weights)
    np.testing.assert_allclose(w[:, 0], 1.0, atol=1e-5)
    assert np.abs(w[:, 1:]).max() < 1e-6
    np.testing.assert_allclose(np.asarray(out.rgb), 0.25, atol=1e-4)
    # depth collapses to the first sample distance
    np.testing.assert_allclose(np.asarray(out.depth), ts[:, 0], atol=1e-4)


def test_empty_space_zero_weights_and_disp_floor():
    # sigma = -inf-ish -> softplus ~ 0 -> alpha ~ 0 everywhere except the
    # 1e10 tail delta; acc is dominated by the last sample
    B, N = 2, 8
    rgb_sigma = np.full((B, N, 4), -50.0, np.float32)
    ts = np.broadcast_to(np.linspace(2, 6, N, dtype=np.float32), (B, N)).copy()
    dirs = np.tile(np.array([[0, 0, -1]], np.float32), (B, 1))
    out = composite(jnp.asarray(rgb_sigma), jnp.asarray(ts), jnp.asarray(dirs))
    assert np.asarray(out.weights)[:, :-1].max() < 1e-5
