"""Probe: is a sub-128 contraction (K=72) MXU matmul cheaper than K=128?

Closes docs/ROADMAP.md's "sub-128 contraction padding" headroom item
empirically. The MXU processes one 128(K)x128(M) weight block per pass,
so a (256, 72) @ (72, TR) matmul should cost exactly the same as
(256, 128) @ (128, TR) — the K pad burns a full block either way. If
that holds, no kernel-layout rework (M-stacking, K-concatenation, head
relocation) can recover the padding: every merge is pass-neutral (see
docs/PERFORMANCE.md "Sub-128 contraction padding"). If K=72 were
instead proportionally cheaper (~0.56x), a tight-packed encoding layout
would be worth building.

Runs three shapes through an otherwise-identical single-matmul Pallas
kernel, 512 tiles x TR=1024 lanes (the fused train kernel's tile count
at the bench shape), scan-of-40 timing like the kernel benchmarks.

Usage: python scripts/pad_passes_probe.py   (real TPU; CPU interprets)
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


TR = 1024
TILES = 512
M = 256


def _kernel(k, x_ref, w_ref, o_ref):
    x = x_ref[:]
    w = w_ref[:]
    o_ref[:] = jax.lax.dot_general(
        w.astype(jnp.bfloat16),
        x.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def build(k: int):
    interpret = jax.devices()[0].platform == "cpu"
    f = pl.pallas_call(
        functools.partial(_kernel, k),
        grid=(TILES,),
        in_specs=[
            pl.BlockSpec((k, TR), lambda i: (0, i)),
            pl.BlockSpec((M, k), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((M, TR), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((M, TILES * TR), jnp.float32),
        interpret=interpret,
    )

    @jax.jit
    def run(x, w):
        # scan chains 40 launches so per-launch dispatch amortizes
        def body(c, _):
            return c, jnp.float32(f(x, w)[0, 0])

        _, outs = jax.lax.scan(body, 0, None, length=40)
        return outs

    return run


def main():
    results = {}
    for k in (40, 72, 128):
        run = build(k)
        x = jax.random.normal(jax.random.PRNGKey(0), (k, TILES * TR))
        w = jax.random.normal(jax.random.PRNGKey(1), (M, k))
        _ = run(x, w).block_until_ready()  # compile
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out = run(x, w)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / (reps * 40)
        results[f"K={k}"] = round(dt * 1e3, 4)
        print(f"K={k:3d}: {dt * 1e3:.4f} ms per (256,{k})@({k},{TILES * TR}) launch")
    r = results["K=72"] / results["K=128"]
    r40 = results["K=40"] / results["K=128"]
    print(json.dumps({"ms": results, "K72_over_K128": round(r, 3),
                      "K40_over_K128": round(r40, 3)}))
    if r > 0.9:
        print("=> pass-model confirmed: sub-128 K costs a full 128 block; "
              "layout reworks are pass-neutral")
    else:
        print("=> sub-128 K IS cheaper; a tight-packed layout has real upside")


if __name__ == "__main__":
    main()
