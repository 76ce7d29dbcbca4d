"""Per-image trainable extras: BARF-style camera-pose refinement
(cfg.pose_opt — ops/rays.py::rodrigues_rotate/apply_cam_deltas, per-image
se(3) delta tables trained through ray generation) and NeRF-W-style
appearance embeddings (cfg.appearance_dim — per-image codes appended to
the direction encoding, models/nerf.py app_dim).

No reference analogue (the reference trusts dataset poses and assumes
constant exposure, utils/dataload.py); these are the real-capture
extensions the COLMAP loader pairs with.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_simple_tpu.config import TrainConfig
from nerf_simple_tpu.models import model_from_train_config
from nerf_simple_tpu.models.nerf import NerfMLP, infer_arch, init_nerf_params
from nerf_simple_tpu.ops.rays import apply_cam_deltas, rodrigues_rotate
from nerf_simple_tpu.train.step import build_train_step, make_train_state


# ---------------------------------------------------------------------------
# rodrigues_rotate / apply_cam_deltas units
# ---------------------------------------------------------------------------


def _rotmat(r):
    th = np.linalg.norm(r)
    if th < 1e-12:
        return np.eye(3)
    k = r / th
    K = np.array(
        [[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]]
    )
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def test_rodrigues_matches_f64_rotation_matrices():
    rng = np.random.default_rng(0)
    rv = rng.normal(size=(16, 3)) * rng.uniform(0, 2.5, (16, 1))
    v = rng.normal(size=(16, 3))
    want = np.stack([_rotmat(r) @ vi for r, vi in zip(rv, v)])
    got = np.asarray(
        rodrigues_rotate(jnp.asarray(rv, jnp.float32), jnp.asarray(v, jnp.float32))
    )
    np.testing.assert_allclose(got, want, atol=2e-5)
    # norms preserved (it is a rotation)
    np.testing.assert_allclose(
        np.linalg.norm(got, axis=-1), np.linalg.norm(v, axis=-1), rtol=1e-5
    )


def test_rodrigues_zero_is_identity_with_finite_grad():
    v = jax.random.normal(jax.random.PRNGKey(0), (8, 3))
    z = jnp.zeros((8, 3))
    np.testing.assert_allclose(np.asarray(rodrigues_rotate(z, v)), np.asarray(v))
    # the training init: gradients must be finite AND correct at dr = 0.
    # d/d(dr) [u . (dr x v)] = v x u, the small-angle limit
    u = jax.random.normal(jax.random.PRNGKey(1), (8, 3))
    g = jax.grad(lambda r: jnp.sum(u * rodrigues_rotate(r, v)))(z)
    assert bool(jnp.isfinite(g).all())
    np.testing.assert_allclose(
        np.asarray(g), np.cross(np.asarray(v), np.asarray(u)), atol=1e-5
    )


def test_apply_cam_deltas_identity_and_passthrough():
    rays8 = jax.random.normal(jax.random.PRNGKey(0), (6, 8))
    z = jnp.zeros((6, 3))
    out = apply_cam_deltas(rays8, z, z)
    np.testing.assert_allclose(np.asarray(out), np.asarray(rays8))
    dt = jnp.ones((6, 3))
    out = apply_cam_deltas(rays8, z, dt)
    np.testing.assert_allclose(
        np.asarray(out[:, :3]), np.asarray(rays8[:, :3]) + 1.0
    )
    # mip radius/weight columns pass through rotation untouched
    dr = 0.3 * jnp.ones((6, 3))
    np.testing.assert_allclose(
        np.asarray(apply_cam_deltas(rays8, dr, z)[:, 6:]),
        np.asarray(rays8[:, 6:]),
    )


# ---------------------------------------------------------------------------
# appearance model plumbing
# ---------------------------------------------------------------------------


def test_appearance_model_shapes_and_apply():
    model = NerfMLP(Lp=4, Ld=2, H=32, app_dim=5)
    params = init_nerf_params(jax.random.PRNGKey(0), model)
    assert params["color0"]["w"].shape[0] == 32 + (6 * 2 + 3) + 5
    v = jax.random.normal(jax.random.PRNGKey(1), (7, 6))
    app = jax.random.normal(jax.random.PRNGKey(2), (7, 5))
    from nerf_simple_tpu.models.nerf import nerf_apply

    out = nerf_apply(params, v, model, app=app)
    assert out.shape == (7, 4)
    # the code conditions color but NOT density
    out2 = nerf_apply(params, v, model, app=app + 1.0)
    assert not np.allclose(np.asarray(out2[:, :3]), np.asarray(out[:, :3]))
    np.testing.assert_allclose(
        np.asarray(out2[:, 3]), np.asarray(out[:, 3]), atol=1e-6
    )
    with pytest.raises(ValueError, match="app"):
        nerf_apply(params, v, model)  # missing code
    with pytest.raises(ValueError, match="app"):
        nerf_apply(init_nerf_params(jax.random.PRNGKey(0), NerfMLP(H=32)), v, NerfMLP(H=32), app=app)


def test_infer_arch_rejects_appearance_checkpoints():
    model = NerfMLP(Lp=4, Ld=2, H=32, app_dim=5)
    params = init_nerf_params(jax.random.PRNGKey(0), model)
    with pytest.raises(ValueError, match="sidecar"):
        infer_arch(params)
    # but the model.json sidecar path rebuilds it exactly
    from nerf_simple_tpu.models import model_from_meta, model_meta

    assert model_from_meta(model_meta(model)) == model


def test_config_validation():
    with pytest.raises(ValueError, match="appearance_dim"):
        TrainConfig(datapath="x", appearance_dim=-1)
    with pytest.raises(ValueError, match="shard_dataset"):
        TrainConfig(datapath="x", pose_opt=True, shard_dataset=True)
    with pytest.raises(ValueError, match="mip"):
        TrainConfig(datapath="x", appearance_dim=4, mip=True)
    with pytest.raises(ValueError, match="NerfMLP"):
        TrainConfig(datapath="x", appearance_dim=4, model_family="hashgrid")
    with pytest.raises(ValueError, match="NDC"):
        TrainConfig(datapath="x", pose_opt=True, dataset="llff", ndc=True)
    # pose_opt + occupancy / hierarchical / proposal compose
    TrainConfig(datapath="x", pose_opt=True, occupancy=True)
    TrainConfig(datapath="x", appearance_dim=4, hierarchical=True)
    TrainConfig(datapath="x", appearance_dim=4, proposal=True)


# ---------------------------------------------------------------------------
# train-step integration
# ---------------------------------------------------------------------------


def _tiny_cfg(**kw):
    base = dict(
        datapath="x", Nf=4, Nc=0, num_iters=4, batch_size=32,
        steps_per_call=2, net_H=32, net_Lp=4, net_Ld=2, pose_warmup=0,
        ckpt_loss=10**9, ckpt_images=10**9, ckpt_model=10**9,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_train_step_moves_all_param_groups():
    cfg = _tiny_cfg(pose_opt=True, appearance_dim=4)
    model = model_from_train_config(cfg)
    state = make_train_state(jax.random.PRNGKey(0), cfg, model, n_images=4)
    assert set(state.params) == {"field", "cams", "app"}
    step = build_train_step(cfg, model, donate=False, rays_per_image=16)
    rays = jax.random.normal(jax.random.PRNGKey(1), (64, 6))
    pix = jax.random.uniform(jax.random.PRNGKey(2), (64, 3))
    s2, losses = step(state, rays, pix, jax.random.PRNGKey(3))
    assert bool(jnp.isfinite(losses).all())
    assert float(jnp.abs(s2.params["cams"]["dr"]).max()) > 0
    assert float(jnp.abs(s2.params["cams"]["dt"]).max()) > 0
    assert float(jnp.abs(s2.params["app"]).max()) > 0
    moved = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()) > 0,
        s2.params["field"], state.params["field"],
    )
    assert all(jax.tree.leaves(moved))


def test_make_train_state_requires_n_images():
    cfg = _tiny_cfg(pose_opt=True)
    with pytest.raises(ValueError, match="n_images"):
        make_train_state(jax.random.PRNGKey(0), cfg, model_from_train_config(cfg))


def test_pallas_backend_falls_back_with_warning():
    """Appearance codes WIDER than the kernel stream's 8 free rows
    can't ride the fused path — backend='pallas' warns and renders
    through XLA autodiff (codes <= 8 wide take the kernel, see
    test_pose_app_pallas_matches_xla_step)."""
    cfg = _tiny_cfg(appearance_dim=16, backend="pallas", net_H=32)
    model = model_from_train_config(cfg)
    step = build_train_step(cfg, model, donate=False, rays_per_image=16)
    state = make_train_state(jax.random.PRNGKey(0), cfg, model, n_images=4)
    rays = jax.random.normal(jax.random.PRNGKey(1), (64, 6))
    pix = jax.random.uniform(jax.random.PRNGKey(2), (64, 3))
    with pytest.warns(UserWarning, match="appearance_dim > 8"):
        _, losses = step(state, rays, pix, jax.random.PRNGKey(3))
    assert bool(jnp.isfinite(losses).all())


@pytest.mark.slow  # ~40 s interpret mode; the multichip dryrun also
# pins pose/pallas-vs-xla loss agreement every round
def test_pose_only_pallas_matches_xla_step():
    """Pose-ONLY refinement rides the Pallas path (no fallback warning):
    the fused backward emits dL/dx (kernels/mlp.py::_input_grad_tile)
    and autodiff chains it through apply_cam_deltas. One full train step
    must move the delta tables identically to the XLA backend (f32,
    interpret mode)."""
    import warnings as _warnings

    from jax.experimental.pallas import tpu as pltpu

    rays = jax.random.normal(jax.random.PRNGKey(1), (64, 6))
    pix = jax.random.uniform(jax.random.PRNGKey(2), (64, 3))

    def run(backend, **kw):
        cfg = _tiny_cfg(
            pose_opt=True, backend=backend, steps_per_call=2, **kw
        )
        model = model_from_train_config(cfg)
        state = make_train_state(
            jax.random.PRNGKey(0), cfg, model, n_images=4
        )
        step = build_train_step(cfg, model, donate=False, rays_per_image=16)
        with _warnings.catch_warnings():
            _warnings.simplefilter("error")  # any fallback warning fails
            s2, losses = step(state, rays, pix, jax.random.PRNGKey(3))
        return s2, losses

    for extra in ({}, {"pe_anneal_until": 8}):
        s_x, l_x = run("xla", **extra)
        with pltpu.force_tpu_interpret_mode():
            s_p, l_p = run("pallas", **extra)

        np.testing.assert_allclose(
            np.asarray(l_p), np.asarray(l_x), rtol=2e-5, err_msg=str(extra)
        )
        # delta tables moved, and moved the same way under both backends
        assert float(jnp.abs(s_x.params["cams"]["dr"]).max()) > 0
        for k in ("dr", "dt"):
            np.testing.assert_allclose(
                np.asarray(s_p.params["cams"][k]),
                np.asarray(s_x.params["cams"][k]),
                atol=1e-5,
                err_msg=f"{k} {extra}",
            )


@pytest.mark.slow  # interpret mode; the multichip dryrun also pins
# pose+app pallas-vs-xla loss agreement every round
def test_pose_app_pallas_matches_xla_step():
    """Pose refinement + appearance codes TOGETHER ride the Pallas path
    (no fallback warning): the backward kernel's input-grad output
    carries dL/dx on rows 0..7 and the per-sample code gradients on
    rows 8..15 (kernels/mlp.py FusedWeightsApp), and autodiff chains
    them through apply_cam_deltas / the code-table gather. One full
    train step must move BOTH per-image tables identically to the XLA
    backend (f32, interpret mode). Also covers appearance-ONLY (the
    pose rows of the input grad are dead but the code rail is live)."""
    import warnings as _warnings

    from jax.experimental.pallas import tpu as pltpu

    rays = jax.random.normal(jax.random.PRNGKey(1), (64, 6))
    pix = jax.random.uniform(jax.random.PRNGKey(2), (64, 3))

    def run(backend, **kw):
        cfg = _tiny_cfg(backend=backend, steps_per_call=2, **kw)
        model = model_from_train_config(cfg)
        state = make_train_state(
            jax.random.PRNGKey(0), cfg, model, n_images=4
        )
        step = build_train_step(cfg, model, donate=False, rays_per_image=16)
        with _warnings.catch_warnings():
            _warnings.simplefilter("error")  # any fallback warning fails
            s2, losses = step(state, rays, pix, jax.random.PRNGKey(3))
        return s2, losses

    for extra in (
        {"pose_opt": True, "appearance_dim": 4},
        {"appearance_dim": 8},  # app-only, at the full 8-row rail
    ):
        s_x, l_x = run("xla", **extra)
        with pltpu.force_tpu_interpret_mode():
            s_p, l_p = run("pallas", **extra)

        np.testing.assert_allclose(
            np.asarray(l_p), np.asarray(l_x), rtol=2e-5, err_msg=str(extra)
        )
        # code (and delta) tables moved, and moved the same way
        assert float(jnp.abs(s_x.params["app"]).max()) > 0
        np.testing.assert_allclose(
            np.asarray(s_p.params["app"]),
            np.asarray(s_x.params["app"]),
            atol=1e-5,
            err_msg=f"app {extra}",
        )
        if "pose_opt" in extra:
            assert float(jnp.abs(s_x.params["cams"]["dr"]).max()) > 0
            for k in ("dr", "dt"):
                np.testing.assert_allclose(
                    np.asarray(s_p.params["cams"][k]),
                    np.asarray(s_x.params["cams"][k]),
                    atol=1e-5,
                    err_msg=f"{k} {extra}",
                )


def test_zero_deltas_match_vanilla_step_losses():
    """With pose_opt on but deltas at their zero init, the FIRST
    iteration's loss equals the vanilla run's (identity refinement,
    same PRNG streams) — the wrapper changes nothing but trainability."""
    rays = jax.random.normal(jax.random.PRNGKey(1), (64, 6))
    pix = jax.random.uniform(jax.random.PRNGKey(2), (64, 3))

    cfg0 = _tiny_cfg(steps_per_call=1)
    m0 = model_from_train_config(cfg0)
    s0 = make_train_state(jax.random.PRNGKey(0), cfg0, m0)
    _, l0 = build_train_step(cfg0, m0, donate=False)(
        s0, rays, pix, jax.random.PRNGKey(3)
    )

    cfg1 = _tiny_cfg(steps_per_call=1, pose_opt=True)
    m1 = model_from_train_config(cfg1)
    s1 = make_train_state(jax.random.PRNGKey(0), cfg1, m1, n_images=4)
    # same field init as the vanilla state (the wrapper reuses the key)
    s1 = s1._replace(params={**s1.params, "field": s0.params})
    _, l1 = build_train_step(cfg1, m1, donate=False, rays_per_image=16)(
        s1, rays, pix, jax.random.PRNGKey(3)
    )
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0), rtol=1e-6)


# ---------------------------------------------------------------------------
# e2e recovery (slow): the features do their actual jobs
# ---------------------------------------------------------------------------


def _perturb_train_poses(scene, dr_scale, dt_scale, seed=7):
    """Left-multiply each train pose's rotation by a random small
    rotation and shift its origin — returns (true_poses, perturbed)."""
    tj_path = os.path.join(scene, "transforms_train.json")
    tj = json.load(open(tj_path))
    rng = np.random.default_rng(seed)
    true_poses, pert_poses = [], []
    for fr in tj["frames"]:
        p = np.array(fr["transform_matrix"], np.float64)
        true_poses.append(p.copy())
        eps_r = rng.normal(size=3)
        eps_r *= dr_scale / max(np.linalg.norm(eps_r), 1e-9)
        eps_t = rng.normal(size=3)
        eps_t *= dt_scale / max(np.linalg.norm(eps_t), 1e-9)
        p[:3, :3] = _rotmat(eps_r) @ p[:3, :3]
        p[:3, 3] += eps_t
        pert_poses.append(p)
        fr["transform_matrix"] = p.tolist()
    json.dump(tj, open(tj_path, "w"))
    return np.stack(true_poses), np.stack(pert_poses)


@pytest.mark.slow
def test_pose_opt_recovers_quality_under_noisy_poses(tmp_path):
    """Corrupt the train poses (~2.9 deg + 0.05 units) and train with and
    without pose_opt: refinement must recover novel-view quality on the
    TRUE-pose val views and reach a lower training loss.

    Why quality and not raw delta error: rotation-about-center and
    image-plane translation are near-degenerate for a small-parallax rig
    (both shift the image), so the photometric loss has a flat valley in
    (dr, dt) along which stochastic Adam random-walks without hurting
    renders — delta-space residual is a gauge-polluted metric, view
    quality is the real one (same reason BARF evaluates after a
    similarity alignment)."""
    from nerf_simple_tpu.data.blender import load_blender
    from nerf_simple_tpu.data.dataset import RayDataset
    from nerf_simple_tpu.data.synthetic import write_blender_scene
    from nerf_simple_tpu.render.renderer import (
        RenderSettings,
        render_rays_chunked,
    )
    from nerf_simple_tpu.train.metrics import img_psnr

    root = str(tmp_path)
    scene = os.path.join(root, "scene")
    write_blender_scene(
        scene, n_train=6, n_val=2, n_test=1, H=32, W=32, train_jitter=3
    )
    _perturb_train_poses(scene, dr_scale=0.05, dt_scale=0.05)
    data = load_blender(scene, half_res=False)
    rd = RayDataset.from_blender(data)
    H, W = data.H, data.W

    def run(pose_opt):
        cfg = TrainConfig(
            datapath=scene, Nf=32, Nc=0, num_iters=2000, batch_size=512,
            steps_per_call=100, half_res=False, pose_opt=pose_opt,
            pose_lr_init=1e-3, pose_lr_final=1e-4, pose_warmup=300,
            net_Lp=6, net_Ld=2, net_H=32,
            ckpt_loss=10**9, ckpt_images=10**9, ckpt_model=10**9,
        )
        model = model_from_train_config(cfg)
        state = make_train_state(
            jax.random.PRNGKey(0), cfg, model,
            n_images=6 if pose_opt else None,
        )
        step = build_train_step(cfg, model, donate=False, rays_per_image=H * W)
        key = jax.random.PRNGKey(1)
        for i in range(20):
            state, losses = step(
                state, rd.rays["train"], rd.pixels["train"],
                jax.random.fold_in(key, i),
            )
        params = state.params["field"] if pose_opt else state.params
        rgb, _ = render_rays_chunked(
            params, rd.rays["val"], jax.random.PRNGKey(5),
            RenderSettings(N=32), model, chunk=1024,
        )
        gt = np.asarray(rd.pixels["val"]).reshape(2, H, W, 3)
        rgb = np.asarray(rgb).reshape(2, H, W, 3)
        psnr = float(
            np.mean([img_psnr(gt[i : i + 1], rgb[i : i + 1]) for i in range(2)])
        )
        return float(losses[-1]), psnr

    loss_plain, psnr_plain = run(False)
    loss_pose, psnr_pose = run(True)
    # measured on this fixture: 21.3 -> 23.1 dB mean val PSNR and
    # 0.0019 -> 0.0012 train loss; assert with headroom
    assert psnr_pose > psnr_plain + 0.75, (psnr_plain, psnr_pose)
    assert loss_pose < loss_plain, (loss_plain, loss_pose)


@pytest.mark.slow
def test_pose_opt_through_train_loop(tmp_path):
    """Loop-level smoke: pose_opt through train() — wrapper params reach
    the driver's eval renders (refined train rays branch), checkpoints
    carry the delta tables, and evaluate.load_params unwraps them."""
    from nerf_simple_tpu.data.synthetic import write_blender_scene
    from nerf_simple_tpu.evaluate import load_params
    from nerf_simple_tpu.train.loop import train

    root = str(tmp_path)
    scene = os.path.join(root, "scene")
    write_blender_scene(scene, n_train=3, n_val=1, n_test=1, H=16, W=16)
    cfg = TrainConfig(
        datapath=scene,
        savepath=os.path.join(root, "models"),
        exp_name="pose",
        Nf=8,
        Nc=0,
        num_iters=40,
        batch_size=64,
        steps_per_call=20,
        half_res=False,
        pose_opt=True,
        pose_warmup=10,
        val_idxs=(0,),
        net_Lp=4,
        net_Ld=2,
        net_H=16,
        ckpt_loss=20,
        ckpt_images=20,
        ckpt_model=20,
        log_dir=os.path.join(root, "logs"),
    )
    state = train(cfg)
    assert set(state.params) == {"field", "cams"}
    assert np.isfinite(np.asarray(state.params["cams"]["dr"])).all()
    params, aux = load_params(
        os.path.join(root, "models", "pose"), return_aux=True
    )
    assert "cams" in aux and "trunk0" in params


def _write_exposure_twin_scene(root):
    """3 base train views + an exposure twin of each: r_{3+i} is r_i's
    image scaled by 0.55 at the SAME pose. Identical poses mean identical
    view directions, so the vanilla color head cannot separate the twins
    (on a plain multi-camera rig it CAN fake per-image exposure through
    view-dependence — directions act as image IDs — which confounds any
    loss comparison; measured during design). Only a per-image code can
    tell the twins apart."""
    import cv2

    from nerf_simple_tpu.data.synthetic import write_blender_scene

    scene = os.path.join(root, "scene")
    write_blender_scene(
        scene, n_train=3, n_val=1, n_test=1, H=32, W=32, train_jitter=3
    )
    tj_path = os.path.join(scene, "transforms_train.json")
    tj = json.load(open(tj_path))
    frames = tj["frames"]
    for i in range(3):
        src = os.path.join(scene, "train", f"r_{i}.png")
        img = cv2.imread(src).astype(np.float64)
        cv2.imwrite(
            os.path.join(scene, "train", f"r_{i + 3}.png"),
            (img * 0.55).astype(np.uint8),
        )
        frames.append(
            {
                "file_path": f"./train/r_{i + 3}",
                "transform_matrix": frames[i]["transform_matrix"],
            }
        )
    json.dump(tj, open(tj_path, "w"))
    return scene


@pytest.mark.slow
def test_appearance_separates_exposure_twins(tmp_path):
    """Exposure-twin fixture: appearance codes must (a) reach a far lower
    train loss than the no-embedding run (which is floored by the twin
    brightness gap — nothing else can express it), and (b) learn codes
    whose renders reproduce the injected exposure ratio on the SAME
    rays. Measured on this fixture: loss ratio 0.17, brightness ratio
    1.83 vs 1/0.55 = 1.82 injected; asserted with headroom."""
    from nerf_simple_tpu.data.blender import load_blender
    from nerf_simple_tpu.data.dataset import RayDataset
    from nerf_simple_tpu.render.renderer import (
        RenderSettings,
        render_rays_chunked,
    )

    scene = _write_exposure_twin_scene(str(tmp_path))
    data = load_blender(scene, half_res=False)
    rd = RayDataset.from_blender(data)
    H, W = data.H, data.W
    assert rd.split_size("train") // (H * W) == 6

    def run(app_dim):
        cfg = TrainConfig(
            datapath=scene, Nf=32, Nc=0, num_iters=1200, batch_size=512,
            steps_per_call=100, half_res=False, appearance_dim=app_dim,
            net_Lp=6, net_Ld=2, net_H=32,
            ckpt_loss=10**9, ckpt_images=10**9, ckpt_model=10**9,
        )
        model = model_from_train_config(cfg)
        state = make_train_state(
            jax.random.PRNGKey(0), cfg, model, n_images=6 if app_dim else None
        )
        step = build_train_step(cfg, model, donate=False, rays_per_image=H * W)
        key = jax.random.PRNGKey(1)
        for i in range(12):
            state, losses = step(
                state, rd.rays["train"], rd.pixels["train"],
                jax.random.fold_in(key, i),
            )
        return state, model, float(losses[-1])

    state_a, model_a, loss_app = run(4)
    _, _, loss_plain = run(0)
    # measured ratio 0.17 — codes absorb the twin exposure gap
    assert loss_app < 0.35 * loss_plain, (loss_app, loss_plain)

    # render the SAME rays under the bright twin's code vs the dim
    # twin's: mean brightness must follow the injected 1/0.55 exposure
    tbl = state_a.params["app"]
    assert np.asarray(tbl).std() > 0
    rays0 = rd.rays["train"][: H * W]

    def brightness(code):
        rgb, _ = render_rays_chunked(
            state_a.params["field"], rays0, jax.random.PRNGKey(5),
            RenderSettings(N=32), model_a, chunk=1024, app=code,
        )
        return float(np.asarray(rgb).mean())

    ratio = brightness(tbl[0]) / max(brightness(tbl[3]), 1e-9)
    assert 1.4 < ratio < 2.3, ratio  # injected 1.82, measured 1.83


@pytest.mark.slow
def test_appearance_through_train_loop(tmp_path):
    """Loop-level smoke: appearance_dim through train() — the driver
    passes n_images, eval renders condition on per-image/mean codes,
    checkpoints carry the code table, and evaluate.load_params unwraps
    it as aux."""
    from nerf_simple_tpu.data.synthetic import write_blender_scene
    from nerf_simple_tpu.evaluate import load_params
    from nerf_simple_tpu.train.loop import train

    root = str(tmp_path)
    scene = os.path.join(root, "scene")
    write_blender_scene(scene, n_train=3, n_val=1, n_test=1, H=16, W=16)
    cfg = TrainConfig(
        datapath=scene,
        savepath=os.path.join(root, "models"),
        exp_name="app",
        Nf=8,
        Nc=0,
        num_iters=40,
        batch_size=64,
        steps_per_call=20,
        half_res=False,
        appearance_dim=2,
        val_idxs=(0,),
        net_Lp=4,
        net_Ld=2,
        net_H=16,
        ckpt_loss=20,
        ckpt_images=20,
        ckpt_model=20,
        log_dir=os.path.join(root, "logs"),
    )
    state = train(cfg)
    assert set(state.params) == {"field", "app"}
    assert np.isfinite(np.asarray(state.params["app"])).all()
    params, aux = load_params(
        os.path.join(root, "models", "app"), return_aux=True
    )
    assert "app" in aux and "trunk0" in params


# ---------------------------------------------------------------------------
# two-phase pose refinement (cfg.pose_freeze_at)
# ---------------------------------------------------------------------------


def test_bake_matches_per_ray_apply():
    """bake_cam_deltas (whole-dataset, per-image tables) == the train
    step's per-ray apply_cam_deltas with gathered deltas."""
    from nerf_simple_tpu.ops.rays import bake_cam_deltas

    rng = np.random.default_rng(0)
    n_img, hw = 3, 8
    rays = jnp.asarray(rng.normal(size=(n_img * hw, 6)), jnp.float32)
    dr = jnp.asarray(rng.normal(scale=0.05, size=(n_img, 3)), jnp.float32)
    dt = jnp.asarray(rng.normal(scale=0.1, size=(n_img, 3)), jnp.float32)
    baked = bake_cam_deltas(rays, dr, dt, hw)
    im = np.arange(n_img * hw) // hw
    ref = apply_cam_deltas(rays, dr[im], dt[im])
    np.testing.assert_array_equal(np.asarray(baked), np.asarray(ref))
    # mip columns (7/8-col rays) pass through untouched
    rays8 = jnp.concatenate(
        [rays, jnp.ones((n_img * hw, 2), jnp.float32)], axis=1
    )
    baked8 = bake_cam_deltas(rays8, dr, dt, hw)
    np.testing.assert_array_equal(np.asarray(baked8[:, 6:]), 1.0)
    np.testing.assert_array_equal(
        np.asarray(baked8[:, :6]), np.asarray(baked)
    )


def test_freeze_pose_state_carries_adam_moments():
    """freeze_pose_state drops the {"field","cams"} wrapper and carries
    the field's Adam mu/nu and both schedule counts into the plain
    optimizer state, so the trajectory is seamless across the freeze."""
    import dataclasses

    from nerf_simple_tpu.train.step import (
        TrainState,
        freeze_pose_state,
        make_optimizer,
    )

    cfg = _tiny_cfg(pose_opt=True, pose_freeze_at=2, num_iters=4)
    model = model_from_train_config(cfg)
    state = make_train_state(jax.random.PRNGKey(0), cfg, model, n_images=3)
    opt = make_optimizer(cfg)
    # two real updates so the moments are nonzero and counts advance
    params, opt_state = state.params, state.opt_state
    for i in range(2):
        grads = jax.tree.map(
            lambda p: jnp.full_like(p, 0.1 * (i + 1)), params
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
    state = TrainState(
        params=params, opt_state=opt_state, step=jnp.int32(2), occ=()
    )

    new = freeze_pose_state(state, cfg)
    assert isinstance(new.params, dict)
    assert "trunk0" in new.params and "field" not in new.params
    adam_old = state.opt_state.inner_states["field"].inner_state[0]
    sched_old = state.opt_state.inner_states["field"].inner_state[1]
    assert int(new.opt_state[0].count) == int(adam_old.count) == 2
    assert int(new.opt_state[1].count) == int(sched_old.count) == 2
    for got, want in zip(
        jax.tree.leaves(new.opt_state[0].mu),
        jax.tree.leaves(adam_old.mu["field"]),
    ):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert any(
        np.abs(np.asarray(m)).max() > 0
        for m in jax.tree.leaves(new.opt_state[0].mu)
    )  # the carried moments are the real (nonzero) ones, not a re-init
    # the carried state drives the PLAIN optimizer without error
    cfg2 = dataclasses.replace(cfg, pose_opt=False, pose_freeze_at=0)
    opt2 = make_optimizer(cfg2)
    g2 = jax.tree.map(jnp.ones_like, new.params)
    updates, _ = opt2.update(g2, new.opt_state, new.params)
    assert np.isfinite(
        np.asarray(jax.tree.leaves(updates)[0])
    ).all()


def test_pose_freeze_config_validation():
    with pytest.raises(ValueError, match="without pose_opt"):
        _tiny_cfg(pose_freeze_at=2)
    with pytest.raises(ValueError, match="appearance"):
        _tiny_cfg(
            pose_opt=True, appearance_dim=2, pose_freeze_at=2
        )
    with pytest.raises(ValueError, match="pose_warmup"):
        _tiny_cfg(pose_opt=True, pose_freeze_at=2, pose_warmup=3)
    with pytest.raises(ValueError, match="num_iters"):
        _tiny_cfg(pose_opt=True, pose_freeze_at=4, num_iters=4)


@pytest.mark.slow
def test_pose_freeze_through_train_loop(tmp_path):
    """Two-phase e2e: train() with pose_freeze_at crosses the boundary
    (sidecar written, wrapper dropped, loss keeps improving on the plain
    step), resume PAST the freeze restores the plain state and re-bakes
    from the sidecar, and the eval CLI applies the sidecar deltas to
    train-split stills."""
    from nerf_simple_tpu.config import TestConfig
    from nerf_simple_tpu.data.synthetic import write_blender_scene
    from nerf_simple_tpu.evaluate import test as run_eval
    from nerf_simple_tpu.train.loop import train

    root = str(tmp_path)
    scene = os.path.join(root, "scene")
    write_blender_scene(scene, n_train=3, n_val=1, n_test=1, H=16, W=16)
    kw = dict(
        datapath=scene,
        savepath=os.path.join(root, "models"),
        exp_name="pf",
        Nf=8,
        Nc=0,
        batch_size=64,
        steps_per_call=10,
        half_res=False,
        pose_opt=True,
        pose_warmup=5,
        pose_freeze_at=20,
        val_idxs=(0,),
        net_Lp=4,
        net_Ld=2,
        net_H=16,
        ckpt_loss=10,
        ckpt_images=10**9,
        ckpt_model=20,
        log_dir=os.path.join(root, "logs"),
    )
    state = train(TrainConfig(num_iters=40, **kw))
    assert int(state.step) == 40
    # wrapper dropped at step 20; final params are plain field params
    assert "trunk0" in state.params and "cams" not in state.params
    sidecar = os.path.join(root, "models", "pf", "cam_deltas.npz")
    assert os.path.exists(sidecar)
    d = np.load(sidecar)
    assert d["dr"].shape == (3, 3) and int(d["freeze_step"]) == 20

    # resume past the freeze: plain template + re-bake from the sidecar
    state2 = train(TrainConfig(num_iters=60, resume=True, **kw))
    assert int(state2.step) == 60 and "trunk0" in state2.params

    # eval CLI: train-split still goes through the sidecar-refined rays
    run_eval(
        TestConfig(
            loadpath=os.path.join(root, "models", "pf"),
            datapath=scene,
            savepath=os.path.join(root, "results"),
            exp_name="pf",
            batch_size=256,
            half_res=False,
            im_set="train",
            im_idxs=(0,),
            animation=False,
            N_samples=8,
        )
    )
    assert os.path.exists(os.path.join(root, "results", "pf", "rgb_0.png"))


# ---------------------------------------------------------------------------
# BARF PE annealing (cfg.pe_anneal_until)
# ---------------------------------------------------------------------------


def test_pe_anneal_config_validation():
    with pytest.raises(ValueError, match="without pose_opt"):
        _tiny_cfg(pe_anneal_until=2)
    with pytest.raises(ValueError, match="mip"):
        _tiny_cfg(pose_opt=True, mip=True, pe_anneal_until=2)
    with pytest.raises(ValueError, match="finish by pose_freeze_at"):
        _tiny_cfg(
            pose_opt=True, pose_freeze_at=2, pe_anneal_until=3, num_iters=8
        )


@pytest.mark.slow
def test_anneal_step_trains_and_matches_full_encoder_at_end():
    """A pose_opt + pe_anneal train step runs with finite losses, and
    once the schedule completes (step >= pe_anneal_until) the annealed
    loss equals the anneal-free config's bitwise (weights are all one,
    same program semantics)."""
    from nerf_simple_tpu.train.step import TrainState

    scene_rays = jax.random.normal(jax.random.PRNGKey(1), (64, 6))
    pix = jax.random.uniform(jax.random.PRNGKey(2), (64, 3))

    def run(pe_anneal_until, step0):
        cfg = _tiny_cfg(
            pose_opt=True, pe_anneal_until=pe_anneal_until, num_iters=8
        )
        model = model_from_train_config(cfg)
        state = make_train_state(
            jax.random.PRNGKey(0), cfg, model, n_images=4
        )
        state = TrainState(
            params=state.params, opt_state=state.opt_state,
            step=jnp.int32(step0), occ=state.occ,
        )
        step = build_train_step(cfg, model, donate=False, rays_per_image=16)
        _, losses = step(state, scene_rays, pix, jax.random.PRNGKey(3))
        return np.asarray(losses)

    mid = run(4, 0)  # anneal active: steps 0-1 damped
    assert np.isfinite(mid).all()
    done = run(4, 6)  # schedule complete: alpha clamps to 1
    off = run(0, 6)  # anneal disabled entirely
    np.testing.assert_allclose(done, off, rtol=1e-5, atol=1e-7)
    # and the damped early losses differ from the full-encoder ones
    assert not np.allclose(mid, run(0, 0), rtol=1e-4)


def test_chunked_render_honors_enc_alpha():
    """render_rays_chunked(enc_alpha=...) — the mid-anneal training
    preview path (train/loop.py::render_and_log) — matches a direct
    render_rays call at the same partial alpha, and differs from the
    full-frequency render (the damped octaves must actually be off)."""
    from nerf_simple_tpu.render.renderer import (
        RenderSettings,
        render_rays,
        render_rays_chunked,
    )

    model = NerfMLP(Lp=4, Ld=2, H=32)
    params = init_nerf_params(jax.random.PRNGKey(0), model)
    rays = jax.random.normal(jax.random.PRNGKey(1), (24, 6))
    settings = RenderSettings(N=4, tn=2.0, tf=6.0)
    key = jax.random.PRNGKey(2)

    rgb_c, disp_c = render_rays_chunked(
        params, rays, key, settings, model, chunk=8, enc_alpha=0.4
    )
    # the chunked path folds the key per chunk index; replicate chunk 0
    out0 = render_rays(
        params, rays[:8], jax.random.fold_in(key, 0), settings, model,
        enc_alpha=jnp.float32(0.4),
    )
    np.testing.assert_allclose(
        np.asarray(rgb_c)[:8],
        np.clip(np.asarray(out0.rgb), 0.0, 1.0),
        rtol=2e-5, atol=2e-6,
    )
    rgb_full, _ = render_rays_chunked(
        params, rays, key, settings, model, chunk=8
    )
    assert not np.allclose(np.asarray(rgb_c), np.asarray(rgb_full), atol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("contract", [False, True])
def test_pose_mip_pallas_matches_xla_step(contract):
    """Anti-aliased pose refinement (pose_opt + mip) rides the Pallas
    path (no fallback warning): the fused backward emits
    dL/d(mean, dir, VARIANCE) (kernels/mlp.py::_input_grad_tile_mip)
    and autodiff chains them through frustum_gaussians_T and
    apply_cam_deltas — previously this composition silently dropped to
    the XLA render path. One full train step must move the delta
    tables identically to the XLA backend (f32, interpret mode); with
    contract=True the coupled linearized-Gaussian warp Jacobian is on
    the path too."""
    import warnings as _warnings

    from jax.experimental.pallas import tpu as pltpu

    rays = jax.random.normal(jax.random.PRNGKey(1), (64, 6))
    pix = jax.random.uniform(jax.random.PRNGKey(2), (64, 3))

    def run(backend):
        cfg = _tiny_cfg(
            pose_opt=True, mip=True, backend=backend,
            contract=contract, compute_dtype="f32",
        )
        model = model_from_train_config(cfg)
        state = make_train_state(
            jax.random.PRNGKey(0), cfg, model, n_images=4
        )
        step = build_train_step(
            cfg, model, donate=False, rays_per_image=16, base_radius=0.02
        )
        with _warnings.catch_warnings():
            _warnings.simplefilter("error")  # any fallback warning fails
            s2, losses = step(state, rays, pix, jax.random.PRNGKey(3))
        return s2, losses

    s_x, l_x = run("xla")
    with pltpu.force_tpu_interpret_mode():
        s_p, l_p = run("pallas")

    np.testing.assert_allclose(np.asarray(l_p), np.asarray(l_x), rtol=2e-5)
    assert float(jnp.abs(s_x.params["cams"]["dr"]).max()) > 0
    for k in ("dr", "dt"):
        np.testing.assert_allclose(
            np.asarray(s_p.params["cams"][k]),
            np.asarray(s_x.params["cams"][k]),
            atol=1e-5,
            err_msg=f"{k} contract={contract}",
        )


@pytest.mark.slow
def test_pose_mip_proposal_pallas_matches_xla_step():
    """The full anti-aliased REAL-capture recipe: pose_opt + mip +
    proposal (+ interval distortion). The main field's pose gradients
    return through the mip kernel's input-grad output; the proposal
    MLP's pose gradients flow in XLA through its probe positions. Both
    backends must agree on losses and delta tables."""
    import warnings as _warnings

    from jax.experimental.pallas import tpu as pltpu

    rays = jax.random.normal(jax.random.PRNGKey(1), (64, 6))
    pix = jax.random.uniform(jax.random.PRNGKey(2), (64, 3))

    def run(backend):
        cfg = _tiny_cfg(
            pose_opt=True, mip=True, proposal=True, Np=4,
            prop_Lp=4, prop_D=2, prop_H=16,
            distortion_loss_weight=0.01,
            backend=backend, compute_dtype="f32",
        )
        model = model_from_train_config(cfg)
        state = make_train_state(
            jax.random.PRNGKey(0), cfg, model, n_images=4
        )
        step = build_train_step(
            cfg, model, donate=False, rays_per_image=16, base_radius=0.02
        )
        with _warnings.catch_warnings():
            _warnings.simplefilter("error")
            s2, losses = step(state, rays, pix, jax.random.PRNGKey(3))
        return s2, losses

    s_x, l_x = run("xla")
    with pltpu.force_tpu_interpret_mode():
        s_p, l_p = run("pallas")

    np.testing.assert_allclose(np.asarray(l_p), np.asarray(l_x), rtol=2e-5)
    assert float(jnp.abs(s_x.params["cams"]["dr"]).max()) > 0
    for k in ("dr", "dt"):
        np.testing.assert_allclose(
            np.asarray(s_p.params["cams"][k]),
            np.asarray(s_x.params["cams"][k]),
            atol=1e-5,
            err_msg=k,
        )
