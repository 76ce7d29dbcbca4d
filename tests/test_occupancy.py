"""Occupancy-grid accelerated sampling (ops/occupancy.py): lookup math,
PDF sampling, EMA refresh, train-step integration, checkpoint shim."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_simple_tpu.ops.occupancy import (
    binned_pdf_ts,
    init_occ_grid,
    occ_lookup,
    occupancy_ts,
    ray_bin_occupancy,
    update_occ_grid,
)


def test_occ_lookup_indexes_cells():
    R, aabb = 4, 2.0
    grid = jnp.arange(R**3, dtype=jnp.float32).reshape(R, R, R)
    # cell width = 1.0; point in cell (0,0,0) and cell (3,2,1)
    pts = jnp.array([[-1.9, -1.9, -1.9], [1.9, 0.1, -0.9]], jnp.float32)
    got = occ_lookup(grid, pts, aabb)
    want = np.array([grid[0, 0, 0], grid[3, 2, 1]])
    np.testing.assert_array_equal(np.asarray(got), want)
    # out-of-AABB clamps to boundary cells
    far = occ_lookup(grid, jnp.array([[9.0, -9.0, 0.1]], jnp.float32), aabb)
    assert float(far[0]) == float(grid[3, 0, 2])


def test_binned_pdf_ts_uniform_weights_cover_range(rng):
    B, Nb, N = 8, 16, 64
    w = jnp.ones((B, Nb))
    ts = binned_pdf_ts(jax.random.PRNGKey(0), w, N, 2.0, 6.0)
    a = np.asarray(ts)
    assert a.shape == (B, N)
    assert (np.diff(a, axis=-1) >= 0).all()  # sorted
    assert a.min() >= 2.0 and a.max() <= 6.0
    # roughly uniform: mean near range midpoint
    assert abs(a.mean() - 4.0) < 0.2


def test_binned_pdf_ts_concentrates_mass():
    B, Nb, N = 4, 8, 128
    w = jnp.zeros((B, Nb)).at[:, 5].set(1.0)  # all mass in bin 5
    ts = binned_pdf_ts(jax.random.PRNGKey(1), w, N, 0.0, 8.0)
    a = np.asarray(ts)
    assert (a >= 5.0).all() and (a <= 6.0).all()


def test_binned_pdf_ts_det_quantiles():
    w = jnp.ones((2, 4))
    t1 = binned_pdf_ts(jax.random.PRNGKey(0), w, 16, 0.0, 1.0, det=True)
    t2 = binned_pdf_ts(jax.random.PRNGKey(9), w, 16, 0.0, 1.0, det=True)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_occupancy_ts_skips_empty_space():
    """Grid occupied only at world x > 0; rays marching +x from x=-1 must
    land ~all samples at t > 1 (the occupied half)."""
    R, aabb = 8, 1.0
    grid = jnp.zeros((R, R, R)).at[R // 2 :, :, :].set(1.0)
    B, N = 16, 64
    rays = jnp.concatenate(
        [
            jnp.tile(jnp.array([[-1.0, 0.0, 0.0]]), (B, 1)),
            jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (B, 1)),
        ],
        axis=1,
    )
    ts = occupancy_ts(
        jax.random.PRNGKey(0), rays, grid, N, 0.0, 2.0, aabb,
        Nb=32, floor=1e-3,
    )
    frac_occupied = float(jnp.mean((ts > 1.0).astype(jnp.float32)))
    assert frac_occupied > 0.95, frac_occupied
    # floor keeps the empty half reachable across many draws
    ts2 = occupancy_ts(
        jax.random.PRNGKey(0), rays, grid, N, 0.0, 2.0, aabb,
        Nb=32, floor=0.5,
    )
    assert float(jnp.mean((ts2 <= 1.0).astype(jnp.float32))) > 0.1


def test_update_occ_grid_marks_density():
    R, aabb = 8, 1.0
    grid = init_occ_grid(R) * 0.0  # start empty to isolate the update

    def sigma_fn(pts):  # dense ball of density at the origin
        return jnp.where(
            jnp.linalg.norm(pts, axis=-1) < 0.5, 50.0, -50.0
        )

    g = update_occ_grid(grid, sigma_fn, jax.random.PRNGKey(0), aabb)
    a = np.asarray(g)
    center = a[3:5, 3:5, 3:5]
    corner = a[0, 0, 0]
    assert center.min() > 0.5
    assert corner < 1e-3
    # decay: occupied-then-empty cells fade by `decay` per refresh
    g2 = update_occ_grid(
        jnp.ones((R, R, R)), lambda p: jnp.full(p.shape[:1], -50.0),
        jax.random.PRNGKey(0), aabb, decay=0.9,
    )
    np.testing.assert_allclose(np.asarray(g2), 0.9, rtol=1e-5)


def test_ray_bin_occupancy_uses_unnormalized_dirs():
    """Probe points must use o + d_raw * t (the renderer's placement
    quirk), so a double-length dir reads cells twice as far."""
    R, aabb = 8, 4.0
    grid = jnp.zeros((R, R, R)).at[R - 1, R // 2, R // 2].set(1.0)
    o = jnp.array([[0.0, 0.0, 0.0]])
    d1 = jnp.array([[1.0, 0.0, 0.0]])
    occ1 = ray_bin_occupancy(
        grid, jnp.concatenate([o, d1], 1), 0.0, 4.0, 8, aabb
    )
    occ2 = ray_bin_occupancy(
        grid, jnp.concatenate([o, 2 * d1], 1), 0.0, 2.0, 8, aabb
    )
    np.testing.assert_array_equal(np.asarray(occ1), np.asarray(occ2))


@pytest.mark.slow
@pytest.mark.parametrize("backend", ["xla"])
def test_train_step_with_occupancy(backend):
    from nerf_simple_tpu.config import TrainConfig
    from nerf_simple_tpu.models import NerfMLP
    from nerf_simple_tpu.train.step import build_train_step, make_train_state

    model = NerfMLP(Lp=2, Ld=2, H=32)
    cfg = TrainConfig(
        datapath="",
        batch_size=128,
        Nf=16,
        num_iters=40,
        steps_per_call=20,
        occupancy=True,
        occ_R=8,
        occ_Nb=16,
        occ_update_every=4,
        backend=backend,
        net_H=32, net_Lp=2, net_Ld=2,
    )
    key = jax.random.PRNGKey(0)
    state = make_train_state(key, cfg, model)
    assert state.occ.shape == (8, 8, 8)
    assert float(state.occ.min()) == 1.0  # uniform until first refresh

    k = jax.random.PRNGKey(7)
    o = jax.random.normal(jax.random.fold_in(k, 0), (256, 3)) * 0.1
    d = jax.random.normal(jax.random.fold_in(k, 1), (256, 3))
    rays = jnp.concatenate([o, d], axis=1)
    pixels = jax.nn.sigmoid(
        jax.random.normal(jax.random.fold_in(k, 2), (256, 3))
    )
    step_fn = build_train_step(cfg, model, donate=False)
    state2, losses = step_fn(state, rays, pixels, k)
    assert bool(jnp.isfinite(losses).all())
    assert int(state2.step) == 20
    # the grid was refreshed (EMA'd away from the all-ones init)
    assert float(jnp.max(jnp.abs(state2.occ - 1.0))) > 0
    state3, losses2 = step_fn(state2, rays, pixels, jax.random.fold_in(k, 1))
    assert float(jnp.mean(losses2)) < float(jnp.mean(losses))


def test_build_occ_from_params_matches_density():
    from nerf_simple_tpu.ops.occupancy import build_occ_from_params

    R, aabb = 8, 1.0

    def sigma_fn(pts):
        return jnp.where(jnp.linalg.norm(pts, axis=-1) < 0.5, 50.0, -50.0)

    g = build_occ_from_params(sigma_fn, R, aabb, jax.random.PRNGKey(0))
    a = np.asarray(g)
    assert a[3:5, 3:5, 3:5].min() > 0.5  # ball marked occupied
    assert a[0, 0, 0] < 1e-3  # corner empty


@pytest.mark.slow
def test_occupancy_eval_concentrates_quality(tmp_path):
    """A trained tiny scene rendered with a SMALL sample budget: grid-
    informed quantile sampling must match or beat stratified sampling at
    the same N (the budget lands where the density is)."""
    from nerf_simple_tpu.config import TrainConfig
    from nerf_simple_tpu.data.blender import load_blender
    from nerf_simple_tpu.data.dataset import RayDataset
    from nerf_simple_tpu.data.synthetic import write_blender_scene
    from nerf_simple_tpu.models import NerfMLP, apply_model
    from nerf_simple_tpu.ops.occupancy import build_occ_from_params
    from nerf_simple_tpu.render.renderer import (
        RenderSettings,
        render_rays_chunked,
    )
    from nerf_simple_tpu.train.step import build_train_step, make_train_state

    model = NerfMLP(Lp=4, Ld=2, H=32)
    cfg = TrainConfig(
        datapath="", batch_size=512, Nf=32, num_iters=300,
        steps_per_call=50, net_H=32, net_Lp=4, net_Ld=2,
    )
    scene = str(tmp_path / "scene")
    write_blender_scene(scene, n_train=6, n_val=1, n_test=1, H=24, W=24)
    rd = RayDataset.from_blender(load_blender(scene, half_res=False))
    rays, pixels = rd.rays["train"], rd.pixels["train"]
    key = jax.random.PRNGKey(0)
    state = make_train_state(key, cfg, model)
    step_fn = build_train_step(cfg, model, donate=False)
    for i in range(cfg.num_iters // cfg.steps_per_call):
        state, losses = step_fn(state, rays, pixels, jax.random.fold_in(key, i))
    assert float(losses[-1]) < 0.01

    @jax.jit
    def sigma_fn(pts):
        v = jnp.concatenate(
            [pts, jnp.zeros_like(pts).at[:, 2].set(-1.0)], axis=-1
        )
        return apply_model(state.params, v, model, jnp.float32)[:, 3]

    occ = build_occ_from_params(sigma_fn, 16, 4.0, jax.random.PRNGKey(5))
    assert float(occ.max()) > 0.3  # the blob registered

    test_rays = rd.rays["test"][: 24 * 24]
    gt = np.asarray(rd.pixels["test"][: 24 * 24])
    N_small = 8
    s = RenderSettings(N=N_small, occ_aabb=4.0, occ_Nb=32)
    rgb_occ, _ = render_rays_chunked(
        state.params, test_rays, jax.random.PRNGKey(1), s, model, occ=occ
    )
    rgb_strat, _ = render_rays_chunked(
        state.params, test_rays, jax.random.PRNGKey(1), s, model
    )
    mse_occ = float(np.mean((np.asarray(rgb_occ) - gt) ** 2))
    mse_strat = float(np.mean((np.asarray(rgb_strat) - gt) ** 2))
    assert np.isfinite(mse_occ)
    # grid-informed sampling at N=8 must not be worse than stratified
    assert mse_occ <= mse_strat * 1.05, (mse_occ, mse_strat)


def test_occupancy_checkpoint_roundtrip_and_legacy_shim(tmp_path):
    from nerf_simple_tpu.config import TrainConfig
    from nerf_simple_tpu.models import NerfMLP
    from nerf_simple_tpu.train.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )
    from nerf_simple_tpu.train.step import make_train_state

    model = NerfMLP(Lp=2, Ld=2, H=32)
    cfg = TrainConfig(
        datapath="", occupancy=True, occ_R=8,
        net_H=32, net_Lp=2, net_Ld=2,
    )
    state = make_train_state(jax.random.PRNGKey(0), cfg, model)
    state = state._replace(
        step=jnp.int32(7), occ=state.occ * 0.5
    )
    save_checkpoint(str(tmp_path), state)
    template = make_train_state(jax.random.PRNGKey(1), cfg, model)
    back = restore_checkpoint(str(tmp_path / "ckpt_7"), template)
    assert int(back.step) == 7
    np.testing.assert_allclose(np.asarray(back.occ), 0.5)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        state.params,
        back.params,
    )

    # legacy (pre-occ) checkpoint restores with the template's fresh grid
    from typing import NamedTuple

    class _Old(NamedTuple):
        params: object
        opt_state: object
        step: object

    old = _Old(state.params, state.opt_state, jnp.int32(3))
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    p = str(tmp_path / "ckpt_3")
    ckptr.save(p, jax.device_get(old))
    ckptr.wait_until_finished()
    back2 = restore_checkpoint(p, template)
    assert int(back2.step) == 3
    np.testing.assert_allclose(np.asarray(back2.occ), 1.0)  # fresh grid


def test_occupancy_toggle_across_checkpoints(tmp_path):
    """occ is DERIVED state: a checkpoint written with occupancy OFF must
    resume cleanly with occupancy ON (template grid kept — orbax happily
    restores the checkpoint's () without raising, which used to crash the
    first refresh), and vice versa."""
    from nerf_simple_tpu.config import TrainConfig
    from nerf_simple_tpu.models import NerfMLP
    from nerf_simple_tpu.train.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )
    from nerf_simple_tpu.train.step import make_train_state

    model = NerfMLP(Lp=2, Ld=2, H=32)
    base = dict(datapath="", net_H=32, net_Lp=2, net_Ld=2)
    cfg_off = TrainConfig(**base)
    cfg_on = TrainConfig(occupancy=True, occ_R=8, **base)

    # off -> on: template grid survives
    state_off = make_train_state(jax.random.PRNGKey(0), cfg_off, model)
    save_checkpoint(str(tmp_path / "a"), state_off._replace(step=jnp.int32(5)))
    template_on = make_train_state(jax.random.PRNGKey(1), cfg_on, model)
    back = restore_checkpoint(str(tmp_path / "a" / "ckpt_5"), template_on)
    assert int(back.step) == 5
    assert hasattr(back.occ, "shape") and back.occ.shape == (8, 8, 8)

    # on -> off: the stale grid is dropped for the template's ()
    state_on = make_train_state(jax.random.PRNGKey(0), cfg_on, model)
    save_checkpoint(str(tmp_path / "b"), state_on._replace(step=jnp.int32(9)))
    template_off = make_train_state(jax.random.PRNGKey(1), cfg_off, model)
    back2 = restore_checkpoint(str(tmp_path / "b" / "ckpt_9"), template_off)
    assert int(back2.step) == 9
    assert back2.occ == ()

    # on -> on with a different occ_R: template resolution wins
    cfg_on16 = TrainConfig(occupancy=True, occ_R=16, **base)
    template_16 = make_train_state(jax.random.PRNGKey(1), cfg_on16, model)
    back3 = restore_checkpoint(str(tmp_path / "b" / "ckpt_9"), template_16)
    assert back3.occ.shape == (16, 16, 16)


def test_binned_pdf_ts_zero_mass_falls_back_to_uniform():
    """occ_floor=0.0 + an all-empty probe row must not produce NaNs: the
    zero-mass ray falls back to a uniform PDF (ADVICE r2)."""
    key = jax.random.PRNGKey(3)
    w = jnp.stack(
        [jnp.zeros(8), jnp.ones(8)]
    )  # ray 0: zero mass everywhere
    ts = binned_pdf_ts(key, w, 16, 2.0, 6.0)
    assert bool(jnp.all(jnp.isfinite(ts)))
    assert bool(jnp.all((ts >= 2.0) & (ts <= 6.0)))
    # zero-mass ray is spread over the range, not collapsed into one bin
    assert float(ts[0].max() - ts[0].min()) > 2.0
    # deterministic path too
    ts_det = binned_pdf_ts(key, w, 16, 2.0, 6.0, det=True)
    assert bool(jnp.all(jnp.isfinite(ts_det)))


def test_occupancy_ts_zero_floor_all_empty_grid():
    """End-to-end: floor=0 with an all-zero grid yields finite sorted ts."""
    key = jax.random.PRNGKey(4)
    grid = jnp.zeros((8, 8, 8))
    rays = jnp.concatenate(
        [jnp.zeros((4, 3)), jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (4, 1))],
        axis=1,
    )
    ts = occupancy_ts(key, rays, grid, 32, 2.0, 6.0, aabb=2.0, Nb=8, floor=0.0)
    assert bool(jnp.all(jnp.isfinite(ts)))
    assert bool(jnp.all(jnp.diff(ts, axis=-1) >= 0))


def test_occupancy_ts_probe_grouping_matches_per_ray_on_coherent_rays():
    """occ_group shares probes across adjacent coherent rays: on a batch
    of near-identical rays the grouped sampler must draw the same
    distribution as per-ray probes (identical PDFs -> identical det
    quantiles), and a non-dividing group falls back to per-ray."""
    key = jax.random.PRNGKey(7)
    grid = init_occ_grid(16).at[:, :, :8].set(0.0)  # front half empty
    base = jnp.array([0.0, 0.0, 0.0, 0.01, 0.01, -1.0])
    jitter = 1e-4 * jax.random.normal(key, (8, 6))
    rays = base[None, :] + jitter  # 8 nearly identical rays
    kw = dict(N=16, tn=2.0, tf=6.0, aabb=2.0, Nb=8, floor=0.01, det=True)
    ts1 = occupancy_ts(key, rays, grid, **kw)
    ts4 = occupancy_ts(key, rays, grid, **kw, group=4)
    np.testing.assert_allclose(np.asarray(ts1), np.asarray(ts4), atol=1e-5)
    # non-dividing group (8 % 3 != 0) silently uses per-ray probes
    ts3 = occupancy_ts(key, rays, grid, **kw, group=3)
    np.testing.assert_allclose(np.asarray(ts1), np.asarray(ts3), atol=0)
