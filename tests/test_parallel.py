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


@pytest.mark.slow
def test_8_device_grads_equal_mean_of_shard_grads():
    """The sharded step's psum'd gradient must equal the mean of the
    per-shard gradients computed manually on a single device with the same
    per-shard key streams (all-reduce correctness, exact semantics)."""
    import optax

    from nerf_simple_tpu.render.renderer import RenderSettings, render_rays
    from nerf_simple_tpu.train.step import make_optimizer

    model = NerfMLP(H=32)
    cfg = _cfg(steps_per_call=1, batch_size=64)
    rays = jax.random.normal(jax.random.PRNGKey(1), (512, 6))
    pixels = jax.random.uniform(jax.random.PRNGKey(2), (512, 3))
    key = jax.random.PRNGKey(3)

    mesh = make_mesh()
    rep = replicated_sharding(mesh)
    state0 = make_train_state(jax.random.PRNGKey(0), cfg, model)
    step8 = build_train_step(cfg, model, mesh=mesh, donate=False)
    state8, losses8 = step8(
        jax.device_put(state0, rep),
        jax.device_put(rays, rep),
        jax.device_put(pixels, rep),
        key,
    )

    # replicate the sharded math by hand on one device
    settings = RenderSettings(N=cfg.Nf, tn=cfg.tn, tf=cfg.tf)

    def loss_fn(params, rays_b, pix_b, k):
        out = render_rays(params, rays_b, k, settings, model)
        return jnp.mean((out.rgb - pix_b) ** 2)

    k_iter = jax.random.fold_in(key, 0)  # scan body folds in the step id
    shard_B = cfg.batch_size // 8
    losses, grads = [], []
    for shard in range(8):
        k_sel, k_render = jax.random.split(jax.random.fold_in(k_iter, shard))
        idx = jax.random.randint(k_sel, (shard_B,), 0, rays.shape[0])
        l, g = jax.value_and_grad(loss_fn)(
            state0.params, rays[idx], pixels[idx], k_render
        )
        losses.append(l)
        grads.append(g)
    mean_loss = np.mean([float(l) for l in losses])
    mean_grads = jax.tree.map(lambda *g: sum(g) / 8.0, *grads)

    np.testing.assert_allclose(float(losses8[0]), mean_loss, rtol=2e-5)

    opt = make_optimizer(cfg)
    updates, _ = opt.update(mean_grads, state0.opt_state, state0.params)
    expect_params = optax.apply_updates(state0.params, updates)
    for a, b in zip(
        jax.tree.leaves(expect_params), jax.tree.leaves(state8.params)
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


def test_sharded_mip_render_image_equivalence():
    """Cone-cast (two-level) eval with rays sharded over 8 devices
    matches the single-device render — the stratified edge draw and the
    fine-edge resampling both partition cleanly over the ray axis."""
    from nerf_simple_tpu.models.nerf import init_nerf_params
    from nerf_simple_tpu.render.renderer import RenderSettings, render_rays

    model = NerfMLP(H=32)
    params = init_nerf_params(jax.random.PRNGKey(0), model)
    rays = jax.random.normal(jax.random.PRNGKey(1), (256, 6))
    key = jax.random.PRNGKey(2)
    settings = RenderSettings(
        N=16, mip=True, mip_levels=2, base_radius=0.03
    )

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


@pytest.mark.slow
def test_sharded_pallas_render_runs():
    """The fused kernel invoked inside shard_map on a 2-device mesh
    (interpret mode on CPU): the custom call partitions explicitly and
    produces the same result as the unsharded call. (The full sharded
    fwd+bwd train step is exercised on real hardware; interpret-mode
    backward across shards is too slow for CI.)"""
    from jax.experimental.pallas import tpu as pltpu

    from nerf_simple_tpu.models.nerf import init_nerf_params
    from nerf_simple_tpu.render.renderer import RenderSettings, render_rays

    model = NerfMLP()  # pallas path requires the flagship arch
    params = init_nerf_params(jax.random.PRNGKey(0), model)
    rays = jax.random.normal(jax.random.PRNGKey(1), (32, 6))
    key = jax.random.PRNGKey(2)
    settings = RenderSettings(N=8, backend="pallas")
    mesh = make_mesh(num_data=2)

    def fn(params, rays):
        # per-shard independent render of the local ray block
        return render_rays(params, rays, key, settings, model).rgb

    sharded = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(), P("data")),
        out_specs=P("data"),
        check_vma=False,
    )
    with pltpu.force_tpu_interpret_mode():
        rgb_sharded = np.asarray(sharded(params, rays))
        # oracle: render each half separately (same per-shard key)
        rgb_a = np.asarray(
            render_rays(params, rays[:16], key, settings, model).rgb
        )
        rgb_b = np.asarray(
            render_rays(params, rays[16:], key, settings, model).rgb
        )
    np.testing.assert_allclose(
        rgb_sharded, np.concatenate([rgb_a, rgb_b]), atol=1e-5
    )


@pytest.mark.slow
def test_sharded_fused_train_step_matches_xla():
    """r1 VERDICT item 4: the PRODUCTION config — backend='pallas' +
    num_data_shards>1 — through the full shard_map fwd+composite+bwd+psum
    path. Same per-shard key stream on both backends -> identical batch
    draws -> losses and updated params must agree (f32, interpret mode,
    2 fake devices)."""
    from jax.experimental.pallas import tpu as pltpu

    mesh = make_mesh(num_data=2)
    rep = NamedSharding(mesh, P())
    model = NerfMLP(Lp=4, Ld=2, H=32)
    rng = np.random.default_rng(17)
    rays = jax.device_put(
        jnp.asarray(
            np.concatenate(
                [rng.normal(0, 0.1, (256, 3)), rng.normal(size=(256, 3))], -1
            ),
            jnp.float32,
        ),
        rep,
    )
    pixels = jax.device_put(
        jnp.asarray(rng.uniform(0, 1, (256, 3)), jnp.float32), rep
    )

    def run(backend):
        cfg = _cfg(
            backend=backend,
            batch_size=32,
            num_data_shards=2,
            Nf=16,
            steps_per_call=2,
        )
        state = jax.device_put(
            make_train_state(jax.random.PRNGKey(0), cfg, model), rep
        )
        step = build_train_step(cfg, model, mesh=mesh, donate=False)
        state, losses = step(state, rays, pixels, jax.random.PRNGKey(5))
        return np.asarray(losses), state.params

    losses_xla, params_xla = run("xla")
    with pltpu.force_tpu_interpret_mode():
        losses_pal, params_pal = run("pallas")

    np.testing.assert_allclose(losses_pal, losses_xla, rtol=2e-4, atol=1e-6)
    for a, b in zip(jax.tree.leaves(params_xla), jax.tree.leaves(params_pal)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3
        )


def test_sharded_dataset_training_runs():
    """shard_dataset=True: the ray dataset lives sharded over the data
    axis (1/n per chip) and each chip samples its local block — training
    runs and parameters move."""
    from nerf_simple_tpu.parallel.distributed import global_batch_array

    mesh = make_mesh(num_data=8)
    model = NerfMLP(Lp=4, Ld=2, H=32)
    cfg = _cfg(batch_size=64, num_data_shards=8, shard_dataset=True, Nf=8)
    rng = np.random.default_rng(21)
    rays = global_batch_array(
        mesh, rng.normal(size=(512, 6)).astype(np.float32)
    )
    pixels = global_batch_array(
        mesh, rng.uniform(size=(512, 3)).astype(np.float32)
    )
    # each device holds exactly its 1/8 block
    assert rays.sharding.shard_shape(rays.shape) == (64, 6)

    state = jax.device_put(
        make_train_state(jax.random.PRNGKey(0), cfg, model),
        NamedSharding(mesh, P()),
    )
    step = build_train_step(cfg, model, mesh=mesh, donate=False)
    state2, losses = step(state, rays, pixels, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(losses)).all()
    diff = sum(
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state2.params))
    )
    assert diff > 0


class _FakeDev:
    """Stub with the Device attributes _topology_order sorts by."""

    def __init__(self, id, slice_index, process_index=0):
        self.id = id
        self.slice_index = slice_index
        self.process_index = process_index


def test_topology_order_groups_slices():
    """Multi-slice device lists must come back slice-major so the data
    axis ring stays ICI-local (one DCN hop per slice)."""
    from nerf_simple_tpu.parallel.mesh import _topology_order

    # interleaved arrival order, as jax.devices() can present them
    devs = [
        _FakeDev(0, 1), _FakeDev(1, 0), _FakeDev(2, 1), _FakeDev(3, 0),
        _FakeDev(4, 1, 1), _FakeDev(5, 0, 1),
    ]
    got = _topology_order(devs)
    assert [(d.slice_index, d.process_index, d.id) for d in got] == [
        (0, 0, 1), (0, 0, 3), (0, 1, 5), (1, 0, 0), (1, 0, 2), (1, 1, 4),
    ]


def test_topology_order_single_slice_stable():
    from nerf_simple_tpu.parallel.mesh import _topology_order

    devs = jax.devices()
    assert [d.id for d in _topology_order(devs)] == sorted(
        d.id for d in devs
    )


def test_make_mesh_warns_on_slice_straddling():
    """A data axis that doesn't divide evenly over slices loses the
    ICI-only reduction; make_mesh must say so."""
    import warnings as _w

    from nerf_simple_tpu.parallel.mesh import make_mesh

    devs = jax.devices()  # 8 fake CPU devices, all slice 0
    # single-slice: no warning
    with _w.catch_warnings():
        _w.simplefilter("error")
        make_mesh(8, devices=devs)


def test_occupancy_with_data_parallel_shards():
    """The occ grid rides into shard_map replicated (P() spec) and its
    refresh runs outside the shard region: 8-shard training with
    occupancy on must execute and refresh the grid."""
    from nerf_simple_tpu.config import TrainConfig
    from nerf_simple_tpu.models import NerfMLP
    from nerf_simple_tpu.parallel.mesh import make_mesh
    from nerf_simple_tpu.train.step import build_train_step, make_train_state

    model = NerfMLP(Lp=2, Ld=2, H=32)
    cfg = TrainConfig(
        datapath="", batch_size=128, Nf=16, num_iters=40,
        steps_per_call=10, occupancy=True, occ_R=8, occ_Nb=16,
        occ_update_every=4, num_data_shards=8,
        net_H=32, net_Lp=2, net_Ld=2,
    )
    mesh = make_mesh(cfg.num_data_shards)
    state = make_train_state(jax.random.PRNGKey(0), cfg, model)
    step = build_train_step(cfg, model, mesh=mesh, donate=False)
    k = jax.random.PRNGKey(7)
    rays = jax.random.normal(k, (512, 6))
    pixels = jax.random.uniform(k, (512, 3))
    state2, losses = step(state, rays, pixels, k)
    assert bool(jnp.isfinite(losses).all())
    assert float(jnp.max(jnp.abs(state2.occ - 1.0))) > 0  # refreshed


def test_sharded_eval_render_matches_single_device():
    """Chunked eval rendering over the mesh data axis must be
    bit-identical to the single-device path (global chunk indices feed
    the per-chunk PRNG folds)."""
    from nerf_simple_tpu.models import NerfMLP
    from nerf_simple_tpu.models.nerf import init_nerf_params
    from nerf_simple_tpu.parallel.mesh import make_mesh
    from nerf_simple_tpu.render.renderer import (
        RenderSettings,
        render_rays_chunked,
    )

    model = NerfMLP(Lp=2, Ld=2, H=32)
    params = init_nerf_params(jax.random.PRNGKey(0), model)
    k = jax.random.PRNGKey(3)
    rays = jnp.concatenate(
        [
            jax.random.normal(jax.random.fold_in(k, 0), (1000, 3)) * 0.1,
            jax.random.normal(jax.random.fold_in(k, 1), (1000, 3)),
        ],
        axis=1,
    )
    s = RenderSettings(N=16)
    rgb1, disp1 = render_rays_chunked(
        params, rays, k, s, model, chunk=128
    )
    mesh = make_mesh(8)
    rgb8, disp8 = render_rays_chunked(
        params, rays, k, s, model, chunk=128, mesh=mesh
    )
    np.testing.assert_array_equal(np.asarray(rgb1), np.asarray(rgb8))
    np.testing.assert_array_equal(np.asarray(disp1), np.asarray(disp8))
