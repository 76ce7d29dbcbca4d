"""Per-pixel parity against the ACTUAL reference implementation.

Imports the reference (read-only, mounted at /root/reference) and runs its
torch pipeline on CPU by monkeypatching ``.cuda()`` to a no-op and
``torch.rand`` to return pre-chosen stratification noise — no reference
code is copied or modified. Our JAX renderer is then evaluated with the
SAME weights, rays, and sample noise; rgb/disparity/weights must match
per-pixel to f32 tolerance.

This is the BASELINE "per-pixel match at equal iteration count" fidelity
check reduced to its deterministic core: identical inputs -> identical
render. (Training trajectories can't be bit-matched across frameworks —
different RNG streams — so end-to-end fidelity is additionally covered by
the PSNR-parity runs in docs/PERFORMANCE.md.)

Skipped automatically when /root/reference or torch is unavailable.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference"

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)


@pytest.fixture(scope="module")
def reference_modules(monkeypatch_module=None):
    """Import the reference's modules with CUDA calls neutralized."""
    # .cuda() -> identity on tensors and modules (reference hardcodes
    # .cuda() at rendering.py:30 etc.; this container has no GPU torch)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    sys.path.insert(0, REF)
    try:
        import utils.nets as ref_nets
        import utils.rendering as ref_rendering
    finally:
        sys.path.remove(REF)
    return ref_nets, ref_rendering


def _copy_params_to_torch(params, net):
    """Load our pytree params into the reference Nerf module (transposing
    to torch's (out, in) Linear layout)."""
    mapping = {
        "trunk0": "layers_0.0",
        "trunk1": "layers_0.2",
        "trunk2": "layers_0.4",
        "trunk3": "layers_0.6",
        "trunk4": "layers_0.8",
        "skip": "skip_conn_layer.0",
        "post0": "layers_1.0",
        "post1": "layers_1.2",
        "sigma": "sigma_fc.0",
        "feature": "layers_2",
        "color0": "color_fc.0",
        "color1": "color_fc.2",
    }
    sd = net.state_dict()
    for ours, theirs in mapping.items():
        sd[f"{theirs}.weight"] = torch.from_numpy(
            np.asarray(params[ours]["w"]).T.copy()
        )
        sd[f"{theirs}.bias"] = torch.from_numpy(
            np.asarray(params[ours]["b"]).copy()
        )
    net.load_state_dict(sd, strict=True)


def test_render_matches_reference_per_pixel(reference_modules):
    ref_nets, ref_rendering = reference_modules
    from nerf_simple_tpu.models.nerf import NerfMLP, init_nerf_params
    from nerf_simple_tpu.ops.sampling import stratified_ts
    from nerf_simple_tpu.ops.volume import composite
    from nerf_simple_tpu.render.renderer import RenderSettings

    B, N = 64, 32
    model = NerfMLP()
    params = init_nerf_params(jax.random.PRNGKey(0), model)

    net = ref_nets.Nerf()
    _copy_params_to_torch(params, net)

    rng = np.random.default_rng(11)
    rays = np.concatenate(
        [rng.normal(0, 0.1, (B, 3)), rng.normal(size=(B, 3))], -1
    ).astype(np.float32)
    u = rng.uniform(0, 1, (B, N)).astype(np.float32)

    # reference pipeline with pinned stratification noise
    orig_rand = torch.rand
    torch.rand = lambda *shape, **kw: torch.from_numpy(u)
    try:
        with torch.no_grad():
            ref_rgb, ref_disp, ref_alpha, ref_acc, ref_w = (
                ref_rendering.render_nerf(
                    torch.from_numpy(rays), net, N, tn=2, tf=6
                )
            )
    finally:
        torch.rand = orig_rand

    # our pipeline at the same ts: ts = width*u + edges (rendering.py:25-29)
    edges = np.linspace(2.0, 6.0, N + 1, dtype=np.float32)
    ts = jnp.asarray((4.0 / N) * u + edges[:-1])
    from nerf_simple_tpu.render.renderer import _render_at_ts

    out = _render_at_ts(
        params, jnp.asarray(rays), ts, RenderSettings(N=N), model
    )

    np.testing.assert_allclose(
        np.asarray(out.rgb), ref_rgb.numpy(), atol=3e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.weights), ref_w.numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.acc), ref_acc.numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.disp), ref_disp.numpy(), rtol=2e-4
    )


def test_encoder_matches_reference(reference_modules):
    """positional_encoder feature layout parity with utils/xyz.py."""
    sys.path.insert(0, REF)
    try:
        import utils.xyz as ref_xyz
    finally:
        sys.path.remove(REF)
    from nerf_simple_tpu.ops.encoding import positional_encoder

    rng = np.random.default_rng(3)
    v = rng.uniform(-1, 1, (32, 6)).astype(np.float32)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref_x, ref_d = ref_xyz.positional_encoder(torch.from_numpy(v))
    ours_x, ours_d = positional_encoder(jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(ours_x), ref_x.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours_d), ref_d.numpy(), atol=1e-6)


def test_camera_rays_match_reference(reference_modules):
    sys.path.insert(0, REF)
    try:
        import utils.xyz as ref_xyz
    finally:
        sys.path.remove(REF)
    from nerf_simple_tpu.ops.rays import camera_ray_dirs

    H, W, f = 12, 16, 20.0
    ref = ref_xyz.rays_single_cam([H, W, f]).numpy()  # (3, HW)
    ours = np.asarray(camera_ray_dirs(H, W, f))  # (HW, 3)
    np.testing.assert_allclose(ours, ref.T, atol=1e-6)
