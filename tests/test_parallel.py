"""Multi-chip data parallelism tests on 8 fake CPU devices (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from nerf_simple_tpu.config import TrainConfig
from nerf_simple_tpu.models.nerf import NerfMLP
from nerf_simple_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from nerf_simple_tpu.train.step import build_train_step, make_train_state


def _cfg(**kw):
    base = dict(
        datapath="x",
        Nf=8,
        num_iters=100,
        batch_size=64,
        steps_per_call=3,
        ckpt_loss=10**9,
        ckpt_images=10**9,
        ckpt_model=10**9,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_make_mesh_shapes():
    assert len(jax.devices()) == 8, "conftest must provide 8 fake devices"
    mesh = make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh4 = make_mesh(num_data=4)
    assert mesh4.shape["data"] == 4


def test_shard_batch_places_leading_axis():
    mesh = make_mesh()
    x = jnp.arange(16 * 3, dtype=jnp.float32).reshape(16, 3)
    xs = shard_batch(mesh, x)
    assert xs.sharding == batch_sharding(mesh)
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(x))


def test_1_vs_8_device_training_equivalence():
    """Same seed, same data: training on an 8-device mesh must produce the
    same params as single-device training (gradient all-reduce correctness).
    """
    model = NerfMLP(H=32)
    cfg = _cfg()
    rays = jax.random.normal(jax.random.PRNGKey(1), (512, 6))
    pixels = jax.random.uniform(jax.random.PRNGKey(2), (512, 3))
    key = jax.random.PRNGKey(3)

    # single device
    state1 = make_train_state(jax.random.PRNGKey(0), cfg, model)
    step1 = build_train_step(cfg, model, donate=False)
    state1, losses1 = step1(state1, rays, pixels, key)

    # 8-device mesh, replicated inputs, sharded batch inside the step
    mesh = make_mesh()
    rep = replicated_sharding(mesh)
    state8 = make_train_state(jax.random.PRNGKey(0), cfg, model)
    state8 = jax.device_put(state8, rep)
    step8 = build_train_step(cfg, model, mesh=mesh, donate=False)
    state8, losses8 = step8(
        jax.device_put(state8, rep),
        jax.device_put(rays, rep),
        jax.device_put(pixels, rep),
        key,
    )

    np.testing.assert_allclose(
        np.asarray(losses1), np.asarray(losses8), rtol=2e-4
    )
    for a, b in zip(
        jax.tree.leaves(state1.params), jax.tree.leaves(state8.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-3
        )


def test_sharded_render_image_equivalence():
    """Eval rendering with the batch sharded over 8 devices matches the
    single-device render exactly (rays are embarrassingly parallel)."""
    from nerf_simple_tpu.models.nerf import init_nerf_params
    from nerf_simple_tpu.render.renderer import RenderSettings, render_rays

    model = NerfMLP(H=32)
    params = init_nerf_params(jax.random.PRNGKey(0), model)
    rays = jax.random.normal(jax.random.PRNGKey(1), (256, 6))
    key = jax.random.PRNGKey(2)
    settings = RenderSettings(N=16)

    out1 = render_rays(params, rays, key, settings, model)

    mesh = make_mesh()
    rays_sharded = shard_batch(mesh, rays)
    params_rep = jax.device_put(params, replicated_sharding(mesh))
    out8 = jax.jit(
        lambda p, r, k: render_rays(p, r, k, settings, model).rgb
    )(params_rep, rays_sharded, key)

    np.testing.assert_allclose(
        np.asarray(out1.rgb), np.asarray(out8), atol=1e-5
    )


def test_graft_entry_fn_jits():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    rgb, disp, acc = jax.jit(fn)(*args)
    assert rgb.shape == (1024, 3)
    assert np.isfinite(np.asarray(rgb)).all()
