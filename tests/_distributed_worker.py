"""Worker for tests/test_distributed.py — one process of a 2-process
jax.distributed run on CPU devices (2 local devices each, 4 global).

Runs a sharded-dataset data-parallel train step over the GLOBAL mesh and
prints the per-iteration losses (replicated via pmean, so every process
must print identical values).
"""

import os
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_simple_tpu.config import TrainConfig  # noqa: E402
from nerf_simple_tpu.models.nerf import NerfMLP  # noqa: E402
from nerf_simple_tpu.parallel.distributed import (  # noqa: E402
    global_batch_array,
    maybe_initialize,
    process_info,
)
from nerf_simple_tpu.parallel.mesh import make_mesh  # noqa: E402
from nerf_simple_tpu.train.step import (  # noqa: E402
    build_train_step,
    make_train_state,
)


def main() -> None:
    assert maybe_initialize(), "env (JAX_COORDINATOR/NPROC/PROC_ID) missing"
    pi, pc = process_info()
    devs = jax.devices()
    assert len(devs) == 4, f"expected 4 global devices, got {devs}"

    cfg = TrainConfig(
        datapath="dist",
        Nf=8,
        num_iters=4,
        batch_size=16,
        steps_per_call=2,
        num_data_shards=-1,
        shard_dataset=True,
        ckpt_loss=10**9,
        ckpt_images=10**9,
        ckpt_model=10**9,
    )
    model = NerfMLP(H=32)
    mesh = make_mesh(num_data=4)

    # every process derives the same full dataset, keeps its half
    rng = np.random.default_rng(0)
    rays_full = rng.normal(size=(512, 6)).astype(np.float32)
    pix_full = rng.uniform(size=(512, 3)).astype(np.float32)
    lo, hi = pi * 256, (pi + 1) * 256
    rays = global_batch_array(mesh, rays_full[lo:hi])
    pixels = global_batch_array(mesh, pix_full[lo:hi])
    assert rays.shape == (512, 6)  # global shape spans both processes

    from jax.sharding import NamedSharding, PartitionSpec as P

    state = jax.device_put(
        make_train_state(jax.random.PRNGKey(0), cfg, model),
        NamedSharding(mesh, P()),
    )
    step_fn = build_train_step(cfg, model, mesh=mesh, donate=False)
    state, losses = step_fn(state, rays, pixels, jax.random.PRNGKey(1))
    losses = np.asarray(losses)
    assert losses.shape == (2,) and np.isfinite(losses).all()

    # multi-host sharded eval: chunks split over the 4-device global mesh
    # (2 non-addressable from each process's view); render_rays_chunked
    # must assemble the full image on BOTH hosts and match the local
    # single-chip render exactly
    from nerf_simple_tpu.render.renderer import (
        RenderSettings,
        render_rays_chunked,
    )

    es = RenderSettings(N=8)
    eval_rays = rng.normal(size=(256, 6)).astype(np.float32)
    host_params = jax.device_get(state.params)
    rgb_1, disp_1 = render_rays_chunked(
        host_params, eval_rays, jax.random.PRNGKey(2), es, model, chunk=32
    )
    rgb_n, disp_n = render_rays_chunked(
        host_params, eval_rays, jax.random.PRNGKey(2), es, model, chunk=32,
        mesh=mesh,
    )
    np.testing.assert_allclose(
        np.asarray(rgb_n), np.asarray(rgb_1), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(disp_n), np.asarray(disp_1), rtol=1e-5, atol=1e-6
    )

    print(f"RESULT {pi} {losses[0]:.10f} {losses[1]:.10f}", flush=True)
    print(f"EVAL_OK {pi}", flush=True)


if __name__ == "__main__":
    main()
