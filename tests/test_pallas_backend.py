"""End-to-end pallas backend vs xla backend through the public render API
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from nerf_simple_tpu.models.nerf import NerfMLP, init_nerf_params
from nerf_simple_tpu.render.renderer import RenderSettings, render_rays


def test_pallas_render_matches_xla_render():
    model = NerfMLP()
    params = init_nerf_params(jax.random.PRNGKey(0), model)
    rng = np.random.default_rng(0)
    rays = jnp.asarray(
        np.concatenate(
            [rng.normal(0, 0.1, (16, 3)), rng.normal(size=(16, 3))], -1
        ),
        jnp.float32,
    )
    key = jax.random.PRNGKey(1)
    xla_out = render_rays(
        params, rays, key, RenderSettings(N=16, backend="xla"), model
    )
    with pltpu.force_tpu_interpret_mode():
        pl_out = render_rays(
            params, rays, key, RenderSettings(N=16, backend="pallas"), model
        )
    np.testing.assert_allclose(
        np.asarray(pl_out.rgb), np.asarray(xla_out.rgb), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(pl_out.weights), np.asarray(xla_out.weights), atol=1e-4
    )


def test_pallas_train_grads_match_xla():
    """Full training-loss gradients agree between backends. Small arch
    (the kernels are arch-generic; interpret-mode cost scales with H^2
    — flagship-width parity is pinned by the slow suite + the TPU
    dryrun)."""
    model = NerfMLP(Lp=4, Ld=2, H=32)
    params = init_nerf_params(jax.random.PRNGKey(0), model)
    rng = np.random.default_rng(1)
    rays = jnp.asarray(
        np.concatenate(
            [rng.normal(0, 0.1, (8, 3)), rng.normal(size=(8, 3))], -1
        ),
        jnp.float32,
    )
    gt = jnp.asarray(rng.uniform(0, 1, (8, 3)), jnp.float32)
    key = jax.random.PRNGKey(2)

    def loss(p, backend):
        out = render_rays(
            p, rays, key, RenderSettings(N=16, backend=backend), model
        )
        return jnp.mean((out.rgb - gt) ** 2)

    g_xla = jax.grad(lambda p: loss(p, "xla"))(params)
    with pltpu.force_tpu_interpret_mode():
        g_pl = jax.grad(lambda p: loss(p, "pallas"))(params)

    for layer in g_xla:
        for k in ("w", "b"):
            np.testing.assert_allclose(
                np.asarray(g_xla[layer][k]),
                np.asarray(g_pl[layer][k]),
                atol=2e-4,
                rtol=2e-3,
                err_msg=f"{layer}/{k}",
            )


def test_pallas_input_grads_match_xla():
    """RenderSettings.input_grads: dL/d(rays) from the fused backward
    kernel (_input_grad_tile's encoder-transpose) equals XLA autodiff
    through the same render — with and without scene contraction (whose
    Jacobian chains inside the kernel)."""
    import dataclasses

    for contract in (False, True):
        model = NerfMLP(Lp=4, Ld=2, H=32, contract=contract)
        params = init_nerf_params(jax.random.PRNGKey(0), model)
        rng = np.random.default_rng(3)
        # origins spread so contract exercises both |x|<=1 and |x|>1
        rays = jnp.asarray(
            np.concatenate(
                [rng.normal(0, 1.0, (8, 3)), rng.normal(size=(8, 3))], -1
            ),
            jnp.float32,
        )
        gt = jnp.asarray(rng.uniform(0, 1, (8, 3)), jnp.float32)
        key = jax.random.PRNGKey(2)

        def loss(r, settings, model=model, gt=gt, key=key):
            out = render_rays(params, r, key, settings, model)
            return jnp.mean((out.rgb - gt) ** 2)

        g_xla = jax.grad(loss)(rays, RenderSettings(N=16, backend="xla"))
        with pltpu.force_tpu_interpret_mode():
            g_pl = jax.grad(loss)(
                rays,
                RenderSettings(N=16, backend="pallas", input_grads=True),
            )
        np.testing.assert_allclose(
            np.asarray(g_pl), np.asarray(g_xla), atol=2e-5,
            err_msg=f"contract={contract}",
        )
        if contract:
            continue
        # and the default (input_grads off) really is weights-only: the
        # MLP contributes exactly zero (only ~1e-11 roundoff leaks in
        # through compositing's unit-dir normalization)
        with pltpu.force_tpu_interpret_mode():
            g_off = jax.grad(loss)(
                rays, RenderSettings(N=16, backend="pallas")
            )
        assert float(jnp.abs(g_off).max()) < 1e-8


def test_pallas_annealed_encoder_matches_xla():
    """In-kernel BARF windowing (anneal_row_weights) matches the XLA
    encoder's gamma(alpha=...) at a mid-ramp alpha, through the public
    render path."""
    model = NerfMLP(Lp=4, Ld=2, H=32)
    params = init_nerf_params(jax.random.PRNGKey(0), model)
    rng = np.random.default_rng(5)
    rays = jnp.asarray(
        np.concatenate(
            [rng.normal(0, 0.1, (16, 3)), rng.normal(size=(16, 3))], -1
        ),
        jnp.float32,
    )
    key = jax.random.PRNGKey(1)
    alpha = jnp.float32(0.37)  # mid-ramp: some octaves off, one partial
    xla_out = render_rays(
        params, rays, key, RenderSettings(N=16, backend="xla"), model,
        enc_alpha=alpha,
    )
    with pltpu.force_tpu_interpret_mode():
        pl_out = render_rays(
            params, rays, key, RenderSettings(N=16, backend="pallas"),
            model, enc_alpha=alpha,
        )
    np.testing.assert_allclose(
        np.asarray(pl_out.rgb), np.asarray(xla_out.rgb), atol=1e-4
    )
    # sanity: the window actually changes the output vs full frequency
    full = render_rays(
        params, rays, key, RenderSettings(N=16, backend="xla"), model
    )
    assert float(jnp.abs(full.rgb - xla_out.rgb).max()) > 1e-3
