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
    dir containing ckpt_<step> subdirs (latest wins)."""
    if not os.path.basename(path).startswith("ckpt_"):
        found = latest_checkpoint(path)
        if found is None:
            raise FileNotFoundError(f"no ckpt_* under {path}")
        path = found
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(
        os.path.abspath(path), jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
    )
    return restored


def export_params_npz(path: str, params) -> None:
    """Flat-weights export (the .pth-equivalent interface): one npz with
    ``<layer>/w`` and ``<layer>/b`` arrays (nested coarse/fine prefixed)."""
    flat = {}

    def add(prefix, p):
        for layer, d in p.items():
            for k, v in d.items():
                flat[f"{prefix}{layer}/{k}"] = np.asarray(v)

    if "coarse" in params and isinstance(params["coarse"], dict) and "trunk0" in params["coarse"]:
        add("coarse/", params["coarse"])
        add("fine/", params["fine"])
    else:
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
