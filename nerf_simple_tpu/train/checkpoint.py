"""Checkpoint / resume.

The reference only saves ``state_dict`` weights on a timer with no resume
path (train.py:84-91, TODO at train.py:44; load side is test-only,
test.py:28). Here checkpoints carry the FULL training state — params,
Adam state, and step — via Orbax, and training resumes exactly (the
PRNG stream is derived from the global step, so a resumed run replays the
same sample sequence it would have produced uninterrupted).

Layout: ``<savepath>/<exp_name>/ckpt_<step>/`` (Orbax StandardCheckpointer
directories). ``latest_checkpoint`` finds the newest by step number —
the loadpath interface of the reference config (configs/lego.yaml:20)
accepts either a specific ckpt dir or the experiment dir.
"""

from __future__ import annotations

import os
import re

import jax
import numpy as np
import orbax.checkpoint as ocp

from nerf_simple_tpu.train.step import TrainState


def save_checkpoint(direc: str, state: TrainState) -> str:
    """Save full train state; returns the checkpoint path. Overwrites an
    existing checkpoint at the same step (re-running an experiment with the
    same savepath/exp_name must not crash)."""
    import shutil

    step = int(state.step)
    path = os.path.abspath(os.path.join(direc, f"ckpt_{step}"))
    if os.path.exists(path):
        shutil.rmtree(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state))
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(direc: str) -> str | None:
    if not os.path.isdir(direc):
        return None
    best, best_step = None, -1
    for name in os.listdir(direc):
        m = re.fullmatch(r"ckpt_(\d+)", name)
        if m and int(m.group(1)) > best_step:
            best, best_step = os.path.join(direc, name), int(m.group(1))
    return best


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    """Restore a TrainState. ``path`` may be a ckpt dir or an experiment
    dir containing ckpt_<step> subdirs (latest wins).

    The occupancy grid (``TrainState.occ``) is DERIVED state: when the
    checkpoint predates the field (or was written with occupancy off and
    is resumed with it on), the template's freshly initialized grid is
    kept and the EMA rebuilds within one refresh cadence — only
    params/opt_state/step must round-trip exactly.
    """
    if not os.path.basename(path).startswith("ckpt_"):
        found = latest_checkpoint(path)
        if found is None:
            raise FileNotFoundError(f"no ckpt_* under {path}")
        path = found
    ckptr = ocp.StandardCheckpointer()
    abspath = os.path.abspath(path)

    # What does the checkpoint actually hold for occ? Drive the restore
    # off the stored METADATA, not exceptions: the stored occ may be an
    # (R, R, R) grid, the () of an occupancy-off run, or absent entirely
    # (pre-occ r1 checkpoints) — and orbax is strict about the template
    # matching what is stored (wrong-shape grids raise; () restores as
    # () even over a grid template).
    stored_occ = None  # absent (legacy 3-field checkpoint)
    try:
        tree = ckptr.metadata(abspath).item_metadata
        if "occ" in tree:
            stored_occ = tree["occ"]
    except Exception:
        # unreadable metadata: assume the modern layout and let the
        # restore below surface any real error
        stored_occ = template.occ

    if stored_occ is None:
        from typing import NamedTuple as _NT

        class _Legacy(_NT):
            params: object
            opt_state: object
            step: object

        legacy = _Legacy(template.params, template.opt_state, template.step)
        restored_l = ckptr.restore(
            abspath, jax.tree.map(ocp.utils.to_shape_dtype_struct, legacy)
        )
        return TrainState(
            params=restored_l.params,
            opt_state=restored_l.opt_state,
            step=restored_l.step,
            occ=template.occ,
        )

    # restore with a template matching the STORED occ structure ...
    occ_leaf = (
        jax.ShapeDtypeStruct(stored_occ.shape, stored_occ.dtype)
        if hasattr(stored_occ, "shape")
        else ()
    )
    restore_template = jax.tree.map(
        ocp.utils.to_shape_dtype_struct, template._replace(occ=occ_leaf)
    )
    restored = ckptr.restore(abspath, restore_template)
    # ... then let the CALLER's template decide what occ should be: keep
    # the restored grid only when it matches the requested resolution;
    # otherwise occ is derived state and the template's version (fresh
    # grid, or () when occupancy is off) wins — the EMA rebuilds within
    # one refresh cadence.
    t_is_grid = hasattr(template.occ, "shape")
    r_is_grid = hasattr(restored.occ, "shape")
    if t_is_grid != r_is_grid or (
        t_is_grid and restored.occ.shape != template.occ.shape
    ):
        restored = restored._replace(occ=template.occ)
    return restored


def save_model_meta(direc: str, model) -> str:
    """Write a ``model.json`` sidecar into the experiment dir so eval can
    rebuild the exact model (hash-grid statics like N_min/N_max/aabb are
    not recoverable from weight shapes alone)."""
    import json

    from nerf_simple_tpu.models import model_meta

    os.makedirs(direc, exist_ok=True)
    path = os.path.join(direc, "model.json")
    with open(path, "w") as fh:
        json.dump(model_meta(model), fh, indent=1)
    return path


def load_model_meta(loadpath: str):
    """Find and load a ``model.json`` for a loadpath (a ckpt_<step> dir,
    an experiment dir, or an exported npz/pth file — the sidecar lives in
    the experiment dir, i.e. the file's/ckpt dir's parent or the dir
    itself). Returns the model or None."""
    import json

    from nerf_simple_tpu.models import model_from_meta

    cand_dirs = []
    if os.path.isdir(loadpath):
        cand_dirs = [loadpath, os.path.dirname(os.path.abspath(loadpath))]
    else:
        cand_dirs = [os.path.dirname(os.path.abspath(loadpath))]
    for d in cand_dirs:
        p = os.path.join(d, "model.json")
        if os.path.exists(p):
            with open(p) as fh:
                return model_from_meta(json.load(fh))
    return None


def export_params_npz(path: str, params) -> None:
    """Flat-weights export (the .pth-equivalent interface): one npz with
    ``<layer>/w`` and ``<layer>/b`` arrays (nested coarse/fine prefixed)."""
    flat = {}

    def add(prefix, p):
        for k, v in p.items():
            if isinstance(v, dict):
                add(f"{prefix}{k}/", v)
            else:
                flat[f"{prefix}{k}"] = np.asarray(v)

    add("", params)
    np.savez(path, **flat)


def import_params_npz(path: str):
    """Inverse of export_params_npz."""
    data = np.load(path)
    nested: dict = {}
    for key in data.files:
        parts = key.split("/")
        d = nested
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = data[key]
    return nested


# --- torch .pth interop -----------------------------------------------------
#
# The reference saves/loads plain ``torch.save(net.state_dict())`` .pth
# files (train.py:84-91, test.py:28). These two functions translate
# between that format and our pytree so reference users can carry
# trained weights in BOTH directions. Layer-name map: our functional
# layers vs the reference Nerf module's children (utils/nets.py:16-32);
# weights transpose between our (in, out) and torch's (out, in).

_PTH_LAYER_MAP = {
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


def export_params_pth(path: str, params) -> None:
    """Write a reference-compatible ``state_dict`` .pth: the file loads
    into the reference ``Nerf`` module with ``strict=True``."""
    import torch

    if "coarse" in params and "trunk0" not in params:
        raise ValueError(
            ".pth export is per-network; pass params['coarse'] or "
            "params['fine'] for hierarchical checkpoints (the reference "
            "has no two-network format)"
        )
    sd = {}
    for ours, theirs in _PTH_LAYER_MAP.items():
        sd[f"{theirs}.weight"] = torch.from_numpy(
            np.asarray(params[ours]["w"], np.float32).T.copy()
        )
        sd[f"{theirs}.bias"] = torch.from_numpy(
            np.asarray(params[ours]["b"], np.float32).copy()
        )
    torch.save(sd, path)


def import_params_pth(path: str):
    """Load a reference ``torch.save(net.state_dict())`` .pth into our
    params pytree (the reverse of export_params_pth)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    params = {}
    for ours, theirs in _PTH_LAYER_MAP.items():
        w = sd.pop(f"{theirs}.weight").numpy()
        b = sd.pop(f"{theirs}.bias").numpy()
        params[ours] = {"w": np.ascontiguousarray(w.T), "b": b}
    if sd:
        raise ValueError(f"unrecognized keys in state_dict: {sorted(sd)}")
    return params
