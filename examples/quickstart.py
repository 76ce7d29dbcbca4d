"""Quickstart: generate a synthetic scene, train, evaluate, render a video.

Replaces the reference's stale notebook.ipynb as the guided tour. Runs on
any JAX backend (TPU, or CPU for a smoke test — shrink the sizes below).

    python examples/quickstart.py [workdir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_simple_tpu.config import TestConfig, TrainConfig
from nerf_simple_tpu.data.synthetic import write_blender_scene
from nerf_simple_tpu.evaluate import test
from nerf_simple_tpu.train.loop import train

work = sys.argv[1] if len(sys.argv) > 1 else "quickstart_out"
scene = os.path.join(work, "scene")

if not os.path.isdir(scene):
    print("generating synthetic scene ...")
    write_blender_scene(scene, n_train=16, n_val=2, n_test=2, H=128, W=128)

print("training ...")
train(
    TrainConfig(
        datapath=scene,
        savepath=os.path.join(work, "models"),
        exp_name="quickstart",
        Nf=64,
        num_iters=1000,
        ckpt_loss=100,
        ckpt_images=10**9,
        ckpt_model=10**9,
        batch_size=2048,
        half_res=False,
        num_train_imgs=-1,
        compute_dtype="bf16",
        backend="pallas",
        steps_per_call=20,
        log_dir=os.path.join(work, "logs"),
    )
)

print("rendering held-out stills + orbit video ...")
for animation in (False, True):
    test(
        TestConfig(
            loadpath=os.path.join(work, "models", "quickstart"),
            datapath=scene,
            savepath=os.path.join(work, "results"),
            exp_name="quickstart",
            batch_size=16384,
            half_res=False,
            im_set="test",
            im_idxs=(0, 1),
            animation=animation,
            num_poses=30,
            theta=30,
            N_samples=64,
            compute_dtype="bf16",
            backend="pallas",
        )
    )
print(f"done — see {work}/results/quickstart/")
