import jax.numpy as jnp
import numpy as np

from nerf_simple_tpu.ops.encoding import gamma, positional_encoder
from tests.oracle import gamma_np, positional_encoder_np


def test_gamma_shapes_and_closed_form():
    x = jnp.array([[0.0], [np.pi / 2]])
    g = gamma(x, L=2)
    assert g.shape == (2, 4)
    # layout per channel: [sin(x), cos(x), sin(2x), cos(2x)]
    np.testing.assert_allclose(
        np.asarray(g),
        np.array(
            [
                [0.0, 1.0, 0.0, 1.0],
                [1.0, 0.0, 0.0, -1.0],
            ]
        ),
        atol=1e-6,
    )


def test_gamma_matches_oracle(rng):
    x = rng.uniform(-4, 4, size=(64, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(gamma(jnp.asarray(x), L=10)),
        gamma_np(x.astype(np.float64), L=10),
        atol=2e-5,
    )


def test_positional_encoder_dims_and_oracle(rng):
    v = rng.uniform(-2, 2, size=(128, 6)).astype(np.float32)
    posx, posd = positional_encoder(jnp.asarray(v), Lp=10, Ld=4)
    assert posx.shape == (128, 63)
    assert posd.shape == (128, 27)
    ox, od = positional_encoder_np(v.astype(np.float64))
    np.testing.assert_allclose(np.asarray(posx), ox, atol=2e-5)
    np.testing.assert_allclose(np.asarray(posd), od, atol=2e-5)
    # raw values are prepended (reference utils/xyz.py:33-34)
    np.testing.assert_allclose(np.asarray(posx[:, :3]), v[:, :3], atol=0)
    np.testing.assert_allclose(np.asarray(posd[:, :3]), v[:, 3:], atol=0)


def test_anneal_weights_closed_form():
    """BARF eqn. 14 octave weights: off before the window, cosine ramp
    through it, one after; endpoints exact."""
    from nerf_simple_tpu.ops.encoding import anneal_weights

    w0 = np.asarray(anneal_weights(4, 0.0))
    np.testing.assert_allclose(w0, np.zeros(4), atol=1e-7)
    w1 = np.asarray(anneal_weights(4, 1.0))
    np.testing.assert_allclose(w1, np.ones(4), atol=1e-6)
    # alpha*L = 2.0: octaves 0,1 fully on, 2,3 fully off
    np.testing.assert_allclose(
        np.asarray(anneal_weights(4, 0.5)), [1, 1, 0, 0], atol=1e-6
    )
    # alpha*L = 1.5: octave 1 mid-ramp -> (1 - cos(pi/2))/2 = 0.5
    np.testing.assert_allclose(
        np.asarray(anneal_weights(4, 0.375)), [1, 0.5, 0, 0], atol=1e-6
    )


def test_gamma_alpha_scales_octave_blocks():
    """gamma with alpha equals the standard encoding with each octave's
    sin/cos pair scaled by its anneal weight (raw layout preserved)."""
    from nerf_simple_tpu.ops.encoding import anneal_weights, gamma

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
    L, alpha = 4, 0.4
    full = np.asarray(gamma(x, L)).reshape(5, 3, L, 2)
    damped = np.asarray(gamma(x, L, alpha)).reshape(5, 3, L, 2)
    w = np.asarray(anneal_weights(L, alpha))
    np.testing.assert_allclose(
        damped, full * w[None, None, :, None], rtol=1e-6, atol=1e-7
    )
    # alpha=1 is the standard encoder
    np.testing.assert_allclose(
        np.asarray(gamma(x, L, 1.0)), np.asarray(gamma(x, L)),
        rtol=1e-6, atol=1e-6,
    )


def test_positional_encoder_alpha_keeps_raw_channels():
    from nerf_simple_tpu.ops.encoding import positional_encoder

    rng = np.random.default_rng(4)
    v = jnp.asarray(rng.normal(size=(7, 6)), jnp.float32)
    px0, pd0 = positional_encoder(v, Lp=6, Ld=3, alpha=0.0)
    # at alpha=0 every octave is dark: only the raw-prepended values live
    np.testing.assert_array_equal(np.asarray(px0[:, :3]), np.asarray(v[:, :3]))
    np.testing.assert_allclose(np.asarray(px0[:, 3:]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(pd0[:, 3:]), 0.0, atol=1e-7)
