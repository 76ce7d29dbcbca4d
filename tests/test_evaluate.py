"""End-to-end eval driver tests through the public test() interface."""

import os

import jax
import numpy as np
import pytest

from nerf_simple_tpu.config import TestConfig, TrainConfig
from nerf_simple_tpu.config import test_config_from_dict as _cfg_from_dict
from nerf_simple_tpu.evaluate import load_params
from nerf_simple_tpu.evaluate import test as run_eval
from nerf_simple_tpu.train.loop import train


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from nerf_simple_tpu.data.synthetic import write_blender_scene

    root = str(tmp_path_factory.mktemp("eval_e2e"))
    scene = os.path.join(root, "scene")
    write_blender_scene(scene, n_train=3, n_val=1, n_test=1, H=20, W=20)
    cfg = TrainConfig(
        datapath=scene,
        savepath=os.path.join(root, "models"),
        exp_name="e2e",
        Nf=8,
        num_iters=20,
        batch_size=64,
        steps_per_call=10,
        half_res=False,
        num_train_imgs=-1,
        ckpt_loss=1000,
        ckpt_images=10**9,
        ckpt_model=10**9,
        val_idxs=(0,),
        log_dir=os.path.join(root, "logs"),
    )
    train(cfg)
    return root, scene


def test_test_config_from_reference_yaml_dict():
    cfg = _cfg_from_dict(
        {
            "test_params": {
                "batch_size": 16000,
                "half_res": True,
                "loadpath": "/x",
                "datapath": "/y",
                "savepath": "/z",
                "exp_name": "mynerf",
                "im_set": "test",
                "im_idxs": [0, 1, 2],
                "animation": True,
                "num_poses": 30,
                "theta": 30,
            }
        }
    )
    assert cfg.batch_size == 16000
    assert cfg.im_idxs == (0, 1, 2)
    assert cfg.animation is True


@pytest.mark.slow
def test_still_image_eval(trained):
    root, scene = trained
    out_dir = os.path.join(root, "results")
    run_eval(
        TestConfig(
            loadpath=os.path.join(root, "models", "e2e"),
            datapath=scene,
            savepath=out_dir,
            exp_name="e2e",
            batch_size=512,
            half_res=False,
            im_set="test",
            im_idxs=(0,),
            animation=False,
            N_samples=8,
        )
    )
    rgb = os.path.join(out_dir, "e2e", "rgb_0.png")
    depth = os.path.join(out_dir, "e2e", "depth_0.png")
    assert os.path.exists(rgb) and os.path.exists(depth)
    import cv2

    img = cv2.imread(rgb)
    assert img.shape == (20, 40, 3)  # gt beside prediction


@pytest.mark.slow
def test_animation_eval(trained):
    root, scene = trained
    out_dir = os.path.join(root, "results_anim")
    run_eval(
        TestConfig(
            loadpath=os.path.join(root, "models", "e2e"),
            datapath=scene,
            savepath=out_dir,
            exp_name="e2e",
            batch_size=512,
            half_res=False,
            animation=True,
            num_poses=3,
            theta=30,
            N_samples=8,
        )
    )
    vids = [
        f
        for f in os.listdir(os.path.join(out_dir, "e2e"))
        if f.endswith(".mp4")
    ]
    assert len(vids) == 1
    assert os.path.getsize(os.path.join(out_dir, "e2e", vids[0])) > 0


@pytest.mark.slow
def test_load_params_from_npz(trained):
    root, _ = trained
    exp = os.path.join(root, "models", "e2e")
    npz = [f for f in os.listdir(exp) if f.endswith(".npz")]
    assert npz, "final export missing"
    params = load_params(os.path.join(exp, npz[0]))
    assert "trunk0" in params
    assert params["trunk0"]["w"].shape == (63, 256)


def test_load_params_missing_path_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_params(str(tmp_path))
