"""torch .pth interop: weights travel BOTH ways between this framework
and the reference's torch.save(state_dict) format (train.py:84-91,
test.py:28) — a reference user can bring a trained .pth here, and our
exports load into the reference Nerf module with strict=True."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_simple_tpu.models.nerf import NerfMLP, init_nerf_params, nerf_apply
from nerf_simple_tpu.train.checkpoint import (
    export_params_pth,
    import_params_pth,
)

torch = pytest.importorskip("torch")
REF = "/root/reference"


def test_pth_roundtrip_exact(tmp_path):
    params = init_nerf_params(jax.random.PRNGKey(0))
    p = str(tmp_path / "w.pth")
    export_params_pth(p, jax.device_get(params))
    back = import_params_pth(p)
    for layer in params:
        np.testing.assert_array_equal(
            np.asarray(params[layer]["w"]), back[layer]["w"]
        )
        np.testing.assert_array_equal(
            np.asarray(params[layer]["b"]), back[layer]["b"]
        )


def test_hierarchical_export_needs_single_net(tmp_path):
    params = {
        "coarse": init_nerf_params(jax.random.PRNGKey(0)),
        "fine": init_nerf_params(jax.random.PRNGKey(1)),
    }
    with pytest.raises(ValueError, match="per-network"):
        export_params_pth(str(tmp_path / "w.pth"), params)
    export_params_pth(str(tmp_path / "fine.pth"), params["fine"])  # ok


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_pth_loads_into_reference_net_strict(tmp_path):
    """Our export must satisfy the reference's strict state_dict load and
    produce the same forward outputs."""
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    sys.path.insert(0, REF)
    try:
        from utils.nets import Nerf
    finally:
        sys.path.remove(REF)

    model = NerfMLP()
    params = init_nerf_params(jax.random.PRNGKey(3), model)
    p = str(tmp_path / "ours.pth")
    export_params_pth(p, jax.device_get(params))

    net = Nerf()
    net.load_state_dict(torch.load(p, map_location="cpu"), strict=True)

    rng = np.random.default_rng(5)
    v = np.zeros((64, 6), np.float32)
    v[:, :3] = rng.uniform(-2, 2, (64, 3))
    d = rng.normal(size=(64, 3))
    v[:, 3:] = d / np.linalg.norm(d, axis=-1, keepdims=True)

    with torch.no_grad():
        ref_out = net.forward(torch.from_numpy(v)).numpy()
    ours_out = np.asarray(nerf_apply(params, jnp.asarray(v), model))
    np.testing.assert_allclose(ours_out, ref_out, atol=2e-5)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_reference_pth_imports_and_renders(tmp_path):
    """A .pth saved by the reference itself imports into our pytree and
    evaluates identically (the switch-over path for reference users)."""
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    sys.path.insert(0, REF)
    try:
        from utils.nets import Nerf
    finally:
        sys.path.remove(REF)

    torch.manual_seed(7)
    net = Nerf()
    p = str(tmp_path / "ref.pth")
    torch.save(net.state_dict(), p)

    params = jax.tree.map(jnp.asarray, import_params_pth(p))
    rng = np.random.default_rng(9)
    v = np.zeros((64, 6), np.float32)
    v[:, :3] = rng.uniform(-2, 2, (64, 3))
    d = rng.normal(size=(64, 3))
    v[:, 3:] = d / np.linalg.norm(d, axis=-1, keepdims=True)

    with torch.no_grad():
        ref_out = net.forward(torch.from_numpy(v)).numpy()
    ours_out = np.asarray(nerf_apply(params, jnp.asarray(v)))
    np.testing.assert_allclose(ours_out, ref_out, atol=2e-5)
