import os

import numpy as np
import pytest

from nerf_simple_tpu.data.llff import load_llff
from nerf_simple_tpu.data.dataset import RayDataset
from nerf_simple_tpu.ops.rays import ndc_rays


@pytest.fixture(scope="module")
def llff_dir(tmp_path_factory):
    """Synthetic LLFF scene: 16 forward-facing cameras at z~4 looking -z."""
    import cv2

    d = str(tmp_path_factory.mktemp("llff"))
    img_dir = os.path.join(d, "images")
    os.makedirs(img_dir)
    rng = np.random.default_rng(0)
    n, H, W, f = 16, 48, 64, 80.0
    rows = []
    for i in range(n):
        img = (rng.uniform(0, 255, (H, W, 3))).astype(np.uint8)
        cv2.imwrite(os.path.join(img_dir, f"img_{i:03d}.png"), img)
        # c2w in [right, up, back] with slight xy offsets
        t = np.array([0.1 * (i % 4), 0.1 * (i // 4), 4.0 + 0.05 * i])
        r_, u, b = np.eye(3)
        # store as LLFF raw convention [down, right, back]
        raw = np.stack([-u, r_, b, t], axis=1)  # (3, 4)
        hwf = np.array([[H], [W], [f]])
        rows.append(
            np.concatenate(
                [np.concatenate([raw, hwf], axis=1).reshape(-1), [2.0, 8.0]]
            )
        )
    np.save(os.path.join(d, "poses_bounds.npy"), np.stack(rows))
    return d


def test_llff_splits_and_focal(llff_dir):
    data = load_llff(llff_dir, factor=2, ndc=True)
    assert len(data.splits["test"]) == 2  # every 8th of 16
    assert len(data.splits["train"]) == 14
    assert len(data.splits["val"]) == 2
    assert data.H == 24 and data.W == 32
    # focal scales with the actual/origin width ratio
    assert np.isclose(data.f, 80.0 * (32 / 64), rtol=1e-6)
    assert data.ndc is True


def test_llff_recentering(llff_dir):
    data = load_llff(llff_dir, factor=1, ndc=False)
    all_poses = np.concatenate(
        [data.splits["train"].poses, data.splits["test"].poses]
    )
    # average camera position ~ origin after recentering
    assert np.abs(all_poses[:, :3, 3].mean(0)).max() < 0.5
    # rotations stay orthonormal
    for p in all_poses[:3]:
        np.testing.assert_allclose(
            p[:3, :3] @ p[:3, :3].T, np.eye(3), atol=1e-5
        )


def test_ndc_warp_bounds():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    H, W, f = 24, 32, 40.0
    # rays from origin region looking -z (dz < 0)
    o = rng.uniform(-0.2, 0.2, (256, 3)) + [0, 0, 1.0]
    d = rng.normal(0, 0.2, (256, 3))
    d[:, 2] = -1.0
    rays = jnp.asarray(np.concatenate([o, d], -1), jnp.float32)
    out = np.asarray(ndc_rays(rays, H, W, f, near=1.0))
    assert np.isfinite(out).all()
    # origins lie on the near plane: o2' = 1 + 2/oz with oz <= -1
    assert (out[:, 2] <= 1.0 + 1e-5).all()
    # marching to t=1 lands at o2' + d2' = 1 (the far plane at infinity)
    np.testing.assert_allclose(out[:, 2] + out[:, 5], 1.0, atol=1e-5)


def test_llff_ray_dataset_ndc(llff_dir):
    data = load_llff(llff_dir, factor=2, ndc=True)
    rd = RayDataset.from_blender(data)
    r = np.asarray(rd.rays["train"])
    assert r.shape == (14 * 24 * 32, 6)
    assert np.isfinite(r).all()
    # NDC z-origin within the frustum cube
    assert (r[:, 2] <= 1.0 + 1e-4).all()


def test_spiral_poses_geometry(llff_dir):
    """Spiral cameras stay near the average pose and look into the scene
    (r1 VERDICT item 2: the dome orbit is wrong for forward-facing data)."""
    from nerf_simple_tpu.ops.rays import spiral_poses

    data = load_llff(llff_dir, factor=2, ndc=True)
    poses = spiral_poses(
        data.splits["train"].poses,
        near=data.world_near,
        far=data.world_far,
        n_poses=24,
    )
    assert poses.shape == (24, 4, 4)
    train = np.asarray(data.splits["train"].poses)
    center = train[:, :3, 3].mean(0)
    # spiral positions stay within the training-camera offset envelope
    max_train_offset = np.abs(train[:, :3, 3] - center).max()
    assert np.abs(poses[:, :3, 3] - center).max() <= max_train_offset + 1e-5
    # rotations orthonormal; camera -z (view dir) roughly matches the
    # average training view direction (forward-facing, not orbiting)
    avg_view = -train[:, :3, 2].mean(0)
    avg_view /= np.linalg.norm(avg_view)
    for p in poses:
        np.testing.assert_allclose(p[:3, :3] @ p[:3, :3].T, np.eye(3), atol=1e-5)
        view = -p[:3, 2]
        assert view @ avg_view > 0.8  # within ~35 degrees of forward


@pytest.mark.slow
def test_llff_ndc_animation_renders_scene(llff_dir):
    """NDC-warped spiral rays actually hit the scene: finite output and
    acc > 0 (the r1 bug rendered un-warped world rays at t in [0,1] —
    off-scene by construction, evaluate.py:117-131)."""
    import jax
    import jax.numpy as jnp

    from nerf_simple_tpu.models.nerf import NerfMLP, init_nerf_params
    from nerf_simple_tpu.ops.rays import ndc_rays as warp, rays_for_poses, spiral_poses
    from nerf_simple_tpu.render.renderer import RenderSettings, render_rays

    data = load_llff(llff_dir, factor=2, ndc=True)
    poses = spiral_poses(
        data.splits["train"].poses, data.world_near, data.world_far, n_poses=2
    )
    rays = rays_for_poses(jnp.asarray(poses[:1]), data.H, data.W, data.f)
    rays = warp(rays, data.H, data.W, data.f, near=1.0)
    model = NerfMLP(H=32)
    params = init_nerf_params(jax.random.PRNGKey(0), model)
    out = render_rays(
        params,
        rays,
        jax.random.PRNGKey(1),
        RenderSettings(N=16, tn=0.0, tf=1.0),
        model,
    )
    assert np.isfinite(np.asarray(out.rgb)).all()
    assert np.isfinite(np.asarray(out.disp)).all()
    assert float(np.asarray(out.acc).max()) > 0.0


@pytest.mark.slow
def test_llff_animation_eval_e2e(llff_dir, tmp_path):
    """The eval driver's animation path on an NDC LLFF scene writes a
    playable mp4 (end-to-end regression for the r1 garbage-frames bug)."""
    import jax

    from nerf_simple_tpu.config import TestConfig
    from nerf_simple_tpu.evaluate import test as run_test
    from nerf_simple_tpu.models.nerf import NerfMLP, init_nerf_params
    from nerf_simple_tpu.train.checkpoint import export_params_npz

    params = init_nerf_params(jax.random.PRNGKey(0), NerfMLP())
    npz = str(tmp_path / "params.npz")
    export_params_npz(npz, jax.device_get(params))

    cfg = TestConfig(
        loadpath=npz,
        datapath=llff_dir,
        savepath=str(tmp_path / "out"),
        exp_name="anim",
        batch_size=1024,
        animation=True,
        num_poses=2,
        N_samples=8,
        dataset="llff",
        llff_factor=2,
        ndc=True,
    )
    run_test(cfg)
    vids = [
        f
        for f in os.listdir(str(tmp_path / "out" / "anim"))
        if f.endswith(".mp4")
    ]
    assert len(vids) == 1
    assert os.path.getsize(str(tmp_path / "out" / "anim" / vids[0])) > 0


def test_llff_non_ndc_uses_scene_bounds(llff_dir):
    """dataset bounds thread into tn/tf when ndc=False (r1 VERDICT item 3:
    non-NDC LLFF silently trained on the Blender default [2, 6])."""
    from nerf_simple_tpu.config import TestConfig, TrainConfig
    from nerf_simple_tpu.data.dataset import apply_dataset_bounds

    data = load_llff(llff_dir, factor=2, ndc=False)
    # scene bounds rescaled by 1/(min*0.75): min -> 1/0.75
    assert np.isclose(data.near, 1.0 / 0.75, rtol=1e-5)
    assert np.isclose(data.far / data.near, 8.0 / 2.0, rtol=1e-5)

    cfg = apply_dataset_bounds(TrainConfig(datapath="x"), data)
    assert (cfg.tn, cfg.tf) == (data.near, data.far)
    tcfg = apply_dataset_bounds(
        TestConfig(loadpath="x", datapath="x"), data
    )
    assert (tcfg.tn, tcfg.tf) == (data.near, data.far)

    # explicit user tn/tf wins over dataset bounds
    cfg2 = apply_dataset_bounds(TrainConfig(datapath="x", tn=0.5, tf=3.0), data)
    assert (cfg2.tn, cfg2.tf) == (0.5, 3.0)

    # NDC datasets always sample t in [0, 1]
    data_ndc = load_llff(llff_dir, factor=2, ndc=True)
    cfg3 = apply_dataset_bounds(TrainConfig(datapath="x"), data_ndc)
    assert (cfg3.tn, cfg3.tf) == (0.0, 1.0)


@pytest.mark.slow
def test_llff_mip_cylinder_train_and_eval(llff_dir, tmp_path):
    """LLFF + mip: NDC rays cast CYLINDERS with per-ray radii from the
    warped origins' neighbor spacing (ray column 6) — the train loop,
    fused kernel, eval stills, and spiral animation all run end to end."""
    import jax

    from nerf_simple_tpu.config import TestConfig, TrainConfig
    from nerf_simple_tpu.evaluate import test as run_test
    from nerf_simple_tpu.train.loop import train

    cfg = TrainConfig(
        datapath=llff_dir,
        savepath=str(tmp_path / "models"),
        exp_name="llff_mip",
        dataset="llff",
        llff_factor=2,
        mip=True,
        Nf=8,
        net_Lp=6,
        net_Ld=2,
        net_H=32,
        num_iters=20,
        batch_size=128,
        steps_per_call=10,
        backend="pallas",  # exercises the fused mip kernel w/ col-6 radii
        ckpt_loss=1000,
        ckpt_images=10**9,
        ckpt_model=10**9,
        log_dir=str(tmp_path / "logs"),
    )
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        state = train(cfg)
    assert int(state.step) == 20

    run_test(
        TestConfig(
            loadpath=str(tmp_path / "models" / "llff_mip"),
            datapath=llff_dir,
            savepath=str(tmp_path / "out"),
            exp_name="llff_mip",
            dataset="llff",
            llff_factor=2,
            batch_size=768,
            animation=False,
            im_set="test",
            im_idxs=(0,),
            N_samples=8,
            mip=True,
        )
    )
    assert os.path.exists(str(tmp_path / "out" / "llff_mip" / "rgb_0.png"))
