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


def test_distortion_loss_matches_quadratic_oracle():
    """O(N) cumsum form == the literal O(N^2) mip-NeRF 360 eqn. 15
    (float64, tail sample excluded in both)."""
    import jax.numpy as jnp

    from nerf_simple_tpu.ops.volume import distortion_loss

    rng = np.random.default_rng(0)
    B, N = 7, 33
    ts = np.sort(rng.uniform(2, 6, (B, N)), axis=-1)
    w = rng.uniform(0, 0.2, (B, N))
    wo = w[:, :-1].astype(np.float64)
    mo = ts[:, :-1].astype(np.float64)
    d = (ts[:, 1:] - ts[:, :-1]).astype(np.float64)
    cross = np.einsum(
        "bi,bj,bij->b", wo, wo, np.abs(mo[:, :, None] - mo[:, None, :])
    )
    want = float(np.mean(cross + np.sum(wo * wo * d, -1) / 3.0))
    got = float(
        distortion_loss(jnp.asarray(w, jnp.float32), jnp.asarray(ts, jnp.float32))
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_distortion_penalizes_fog_not_surfaces():
    """A single concentrated surface scores far lower than the same
    total mass spread along the ray (the regularizer's entire point)."""
    import jax.numpy as jnp

    from nerf_simple_tpu.ops.volume import distortion_loss

    N = 64
    ts = np.broadcast_to(np.linspace(2, 6, N, dtype=np.float32), (1, N))
    surface = np.zeros((1, N), np.float32)
    surface[0, 30] = 0.9
    fog = np.full((1, N), 0.9 / (N - 1), np.float32)
    fog[0, -1] = 0.0
    l_surface = float(distortion_loss(jnp.asarray(surface), jnp.asarray(ts)))
    l_fog = float(distortion_loss(jnp.asarray(fog), jnp.asarray(ts)))
    assert l_fog > 20 * l_surface


def test_distortion_ignores_tail_sample():
    """Mass on the tail sample (the 1e10 boundary absorber) must not
    contribute."""
    import jax.numpy as jnp

    from nerf_simple_tpu.ops.volume import distortion_loss

    ts = np.broadcast_to(np.linspace(2, 6, 16, dtype=np.float32), (1, 16))
    w0 = np.zeros((1, 16), np.float32)
    w1 = w0.copy()
    w1[0, -1] = 1.0
    assert float(distortion_loss(jnp.asarray(w1), jnp.asarray(ts))) == float(
        distortion_loss(jnp.asarray(w0), jnp.asarray(ts))
    )
