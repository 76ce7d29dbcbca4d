"""Headline benchmark: training throughput at the reference batch shape.

Measures steady-state training rays/sec on the flagship coarse-only NeRF
at the reference's exact shape — 4096 rays x Nf=128 samples per iteration
(configs/lego.yaml:6,12) — on whatever accelerator JAX provides (the real
TPU chip under the driver; falls back to CPU elsewhere).

Baseline: the reference trains lego 10k iters in ~30 min on its GPU
(README.md:16) = ~5.6 it/s = ~22.9K rays/s. ``vs_baseline`` is the speedup
over that number.

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

import jax


BASELINE_RAYS_PER_SEC = 10_000 / (30 * 60) * 4096  # ~22,756


def main() -> None:
    from nerf_simple_tpu.config import TrainConfig
    from nerf_simple_tpu.models.nerf import NerfMLP
    from nerf_simple_tpu.train.step import build_train_step, make_train_state

    cfg = TrainConfig(
        datapath="bench",
        Nf=128,
        num_iters=10_000,
        batch_size=4096,
        backend="pallas",  # fused VMEM-resident MLP kernel
        steps_per_call=240,  # r3 sweep: 240 ≈ 320 > 160 (11.61 ms/iter)
        compute_dtype="bf16",
        ckpt_loss=10**9,
        ckpt_images=10**9,
        ckpt_model=10**9,
    )
    model = NerfMLP()
    state = make_train_state(jax.random.PRNGKey(0), cfg, model)
    step_fn = build_train_step(cfg, model)

    # synthetic HBM-resident ray dataset at the lego half-res scale
    # (25 images x 400 x 400 rays)
    n_rays = 4_000_000
    rays = jax.random.normal(jax.random.PRNGKey(1), (n_rays, 6))
    pixels = jax.random.uniform(jax.random.PRNGKey(2), (n_rays, 3))
    key = jax.random.PRNGKey(3)

    # warmup / compile; the float() read is a real device sync
    # (block_until_ready is a no-op on some tunneled backends)
    try:
        state, losses = step_fn(state, rays, pixels, key)
        _ = float(losses[-1])
    except Exception as e:  # pragma: no cover - environment fallback
        print(
            f"# pallas backend failed ({type(e).__name__}); "
            "falling back to xla",
            file=__import__("sys").stderr,
        )
        import dataclasses

        cfg = dataclasses.replace(cfg, backend="xla")
        state = make_train_state(jax.random.PRNGKey(0), cfg, model)
        step_fn = build_train_step(cfg, model)
        state, losses = step_fn(state, rays, pixels, key)
        _ = float(losses[-1])

    n_calls = 20
    t0 = time.perf_counter()
    for i in range(n_calls):
        state, losses = step_fn(state, rays, pixels, jax.random.fold_in(key, i))
    _ = float(losses[-1])  # sync: all chained steps complete
    dt = time.perf_counter() - t0

    iters = n_calls * cfg.steps_per_call
    rays_per_sec = cfg.batch_size * iters / dt

    # Occupancy speed preset (configs/lego_occ.yaml shape: Nf=64
    # redistributed by the EMA grid — reaches the Nf=128 run's PSNR in
    # ~0.68x the wall, benchmarks/occ_train_bench.json). Reported as an
    # iters/s-equivalent so the two presets compare on the common unit:
    # wall clock per training iteration at equal quality trajectory.
    occ_iter_per_sec = None
    if cfg.backend == "pallas":
        try:
            import dataclasses

            ocfg = dataclasses.replace(
                cfg, Nf=64, occupancy=True, occ_R=64, occ_Nb=32,
                occ_update_every=16, occ_aabb=2.0, steps_per_call=160,
            )
            ostate = make_train_state(jax.random.PRNGKey(0), ocfg, model)
            ostep = build_train_step(ocfg, model)
            ostate, olosses = ostep(ostate, rays, pixels, key)
            _ = float(olosses[-1])
            t0 = time.perf_counter()
            for i in range(8):
                ostate, olosses = ostep(
                    ostate, rays, pixels, jax.random.fold_in(key, i)
                )
            _ = float(olosses[-1])
            odt = time.perf_counter() - t0
            occ_iter_per_sec = 8 * ocfg.steps_per_call / odt
        except Exception:  # pragma: no cover - keep the headline alive
            occ_iter_per_sec = None

    out = {
        "metric": "train_rays_per_sec_4096x128",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 2),
    }
    if occ_iter_per_sec:
        # reference: 5.6 iter/s (10k iters / 30 min)
        out["occ_preset_iters_per_sec"] = round(occ_iter_per_sec, 1)
        out["occ_preset_vs_baseline_iters"] = round(occ_iter_per_sec / (10_000 / 1800), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
