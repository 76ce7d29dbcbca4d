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
