"""Depth supervision: metric-depth sidecars end to end.

The reference parses test-split depth PNGs (utils/dataload.py:87-99) but
nothing consumes them. Here the synthetic generator emits METRIC depth
(expected termination distance), the Blender loader picks the sidecars
up, TrainConfig.depth_loss_weight trains on them, and the eval driver
reports depth RMSE against them.
"""

import numpy as np
import pytest

from nerf_simple_tpu.config import TrainConfig
from nerf_simple_tpu.data.blender import load_blender
from nerf_simple_tpu.data.synthetic import write_blender_scene


@pytest.fixture(scope="module")
def depth_scene(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("depth_scene") / "scene")
    write_blender_scene(
        path, n_train=3, n_val=1, n_test=1, H=20, W=20, write_depth=True
    )
    return path


def test_generator_writes_loader_reads_metric_depth(depth_scene):
    data = load_blender(depth_scene, half_res=False)
    for split, n in (("train", 3), ("val", 1), ("test", 1)):
        md = data.splits[split].metric_depth
        assert md is not None and md.shape == (n, 20, 20)
        # expected termination depth lies inside the sampled interval
        assert np.isfinite(md).all()
        assert (md > 2.0).all() and (md < 6.0).all()
    # center pixel looks at the blob cluster near the origin from r=4 -> a
    # termination depth well short of the empty-ray default, which
    # composites near the far end of [2, 6]
    md0 = data.splits["train"].metric_depth[0]
    assert md0[10, 10] < md0[0, 0]

    half = load_blender(depth_scene, half_res=True)
    assert half.splits["train"].metric_depth.shape == (3, 10, 10)


def test_partial_sidecars_are_ignored_with_warning(depth_scene, tmp_path):
    import os
    import shutil

    scene = str(tmp_path / "scene")
    shutil.copytree(depth_scene, scene)
    os.remove(os.path.join(scene, "depth", "train", "r_2.npy"))
    with pytest.warns(UserWarning, match="missing some"):
        data = load_blender(scene, half_res=False)
    assert data.splits["train"].metric_depth is None
    assert data.splits["val"].metric_depth is not None


def test_negative_depth_weight_rejected():
    with pytest.raises(ValueError, match="depth_loss_weight"):
        TrainConfig(datapath="/tmp/x", depth_loss_weight=-0.1)


@pytest.mark.slow
def test_missing_sidecars_raise_actionable_error(tmp_path):
    from nerf_simple_tpu.train.loop import train

    path = str(tmp_path / "scene")
    write_blender_scene(path, n_train=2, n_val=1, n_test=1, H=16, W=16)
    cfg = TrainConfig(
        datapath=path, savepath=str(tmp_path / "m"), num_iters=2,
        steps_per_call=2, batch_size=64, Nf=8, half_res=False,
        net_Lp=2, net_Ld=2, net_H=32, log_dir=str(tmp_path / "logs"),
        depth_loss_weight=0.1,
    )
    with pytest.raises(ValueError, match="depth/train"):
        train(cfg)


@pytest.mark.slow
def test_depth_loss_trains_depth_toward_gt(depth_scene, tmp_path):
    """Supervised training reduces depth RMSE on the train view; the
    depth term actually reaches the gradients (loss differs from the
    rgb-only build at equal PRNG streams)."""
    import jax
    import jax.numpy as jnp

    from nerf_simple_tpu.data.dataset import RayDataset
    from nerf_simple_tpu.models.nerf import NerfMLP, init_nerf_params
    from nerf_simple_tpu.render.renderer import RenderSettings, render_rays
    from nerf_simple_tpu.train.step import build_train_step, make_train_state

    data = load_blender(depth_scene, half_res=False)
    rd = RayDataset.from_blender(data)
    rays = rd.rays["train"]
    gt_depth = jnp.asarray(
        data.splits["train"].metric_depth.reshape(-1, 1)
    )
    pixels4 = jnp.concatenate([rd.pixels["train"], gt_depth], axis=1)

    model = NerfMLP(Lp=4, Ld=2, H=32)
    base = dict(
        datapath=depth_scene, savepath=str(tmp_path / "m"),
        batch_size=256, Nf=16, num_iters=60, steps_per_call=30,
        half_res=False, net_Lp=4, net_Ld=2, net_H=32,
        honor_lr_init=True, lr_init=5e-3, lr_final=5e-3,
    )
    cfg = TrainConfig(depth_loss_weight=0.5, **base)

    key = jax.random.PRNGKey(0)
    state = make_train_state(key, cfg, model)
    params0 = state.params
    step_fn = build_train_step(cfg, model, donate=False)
    k = jax.random.PRNGKey(1)
    state, losses = step_fn(state, rays, pixels4, k)
    state, losses = step_fn(state, rays, pixels4, k)
    assert np.isfinite(np.asarray(losses)).all()

    def depth_rmse(params):
        out = render_rays(
            params, rays[:400], jax.random.PRNGKey(7),
            RenderSettings(N=32), model,
        )
        return float(
            jnp.sqrt(jnp.mean((out.depth - gt_depth[:400, 0]) ** 2))
        )

    assert depth_rmse(state.params) < depth_rmse(params0)

    # the depth term is in the differentiated loss: at identical PRNG
    # streams the first-step loss differs from the rgb-only build
    cfg0 = TrainConfig(depth_loss_weight=0.0, **base)
    s0 = make_train_state(key, cfg0, model)
    _, l0 = build_train_step(cfg0, model, donate=False)(
        s0, rays, rd.pixels["train"], k
    )
    sd = make_train_state(key, cfg, model)
    _, ld = build_train_step(cfg, model, donate=False)(
        sd, rays, pixels4, k
    )
    assert float(ld[0]) > float(l0[0])  # additive non-negative term


@pytest.mark.slow
def test_eval_reports_depth_rmse(depth_scene, tmp_path, capsys):
    """Full CLI pass: train tiny with depth supervision, eval prints the
    depth_rmse line and writes the usual artifacts."""
    from nerf_simple_tpu.evaluate import test as eval_test
    from nerf_simple_tpu.train.loop import train

    cfg = TrainConfig(
        datapath=depth_scene, savepath=str(tmp_path / "m"),
        exp_name="d", num_iters=20, steps_per_call=10, batch_size=128,
        Nf=8, half_res=False, net_Lp=2, net_Ld=2, net_H=32,
        log_dir=str(tmp_path / "logs"), depth_loss_weight=0.2,
        ckpt_loss=10**9, ckpt_images=10**9, ckpt_model=10**9,
        val_idxs=(0,),
    )
    train(cfg)
    from nerf_simple_tpu.config import TestConfig

    eval_test(
        TestConfig(
            datapath=depth_scene, loadpath=str(tmp_path / "m" / "d"),
            savepath=str(tmp_path / "r"), exp_name="d", N_samples=8,
            batch_size=128, half_res=False, animation=False,
            im_idxs=(0,), im_set="test",
        )
    )
    outp = capsys.readouterr().out
    assert "depth_rmse=" in outp


@pytest.mark.slow
def test_distortion_regularizer_reduces_ray_spread(depth_scene, tmp_path):
    """Training with distortion_loss_weight yields lower measured
    distortion (weight spread along rays) than the plain run at equal
    iterations/PRNG — the fog the density-normal experiment exposed."""
    import jax
    import jax.numpy as jnp

    from nerf_simple_tpu.data.dataset import RayDataset
    from nerf_simple_tpu.models.nerf import NerfMLP
    from nerf_simple_tpu.ops.sampling import stratified_ts
    from nerf_simple_tpu.ops.volume import distortion_loss
    from nerf_simple_tpu.render.renderer import RenderSettings, render_rays
    from nerf_simple_tpu.train.step import build_train_step, make_train_state

    data = load_blender(depth_scene, half_res=False)
    rd = RayDataset.from_blender(data)
    rays, pixels = rd.rays["train"], rd.pixels["train"]
    model = NerfMLP(Lp=4, Ld=2, H=32)
    base = dict(
        datapath=depth_scene, savepath=str(tmp_path / "m"),
        batch_size=256, Nf=16, num_iters=80, steps_per_call=40,
        half_res=False, net_Lp=4, net_Ld=2, net_H=32,
        honor_lr_init=True, lr_init=5e-3, lr_final=5e-3,
    )

    def run(weight):
        cfg = TrainConfig(distortion_loss_weight=weight, **base)
        state = make_train_state(jax.random.PRNGKey(0), cfg, model)
        step = build_train_step(cfg, model, donate=False)
        for _ in range(2):
            state, losses = step(state, rays, pixels, jax.random.PRNGKey(1))
        assert np.isfinite(np.asarray(losses)).all()
        probe = rays[:256]
        ts = stratified_ts(
            jax.random.PRNGKey(7), 256, 32, 2.0, 6.0, jnp.float32
        )
        out = render_rays(
            state.params, probe, jax.random.PRNGKey(7),
            RenderSettings(N=32), model, ts=ts,
        )
        return float(distortion_loss(out.weights, ts))

    assert run(0.05) < run(0.0)
