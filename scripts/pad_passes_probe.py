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

Measurement design (three earlier drafts measured nothing — each
documented here so the next probe author doesn't rediscover them):
- the matmul must be VMEM-resident and repeated INSIDE the kernel
  (R per launch): a grid-over-HBM-tiles probe is bandwidth-bound
  (reading a (K, 512*1024) operand scales with K regardless of MXU
  passes), which would "confirm" proportional cost for the wrong
  reason;
- the in-kernel repetition must be a recurrence THROUGH the matmul
  (x_{i+1} mixes in the i-th output): scaling x by a per-iteration
  factor distributes — dot(w, s*x) = s*dot(w, x) — and the compiler
  hoists one matmul out of the loop (observed: "1678 TFLOP/s" on a
  197-TFLOP/s chip);
- each scan launch's input must depend on the previous launch's output
  through a runtime-opaque epsilon operand (out * eps with eps=0.0 fed
  as data): a loop-invariant body lets XLA hoist the side-effect-free
  custom call out of the while loop, and `out * 0.0` folds back to a
  constant;
- timing must sync via a host SCALAR FETCH and difference two scan
  lengths: on tunneled backends (axon) block_until_ready returns
  before execution (bench.py carries the same note), and the ~26 ms
  fetch round-trip would otherwise swamp the signal equally for every
  K, biasing the ratio toward 1.

Usage: python scripts/pad_passes_probe.py   (real TPU). On CPU the
kernel runs in interpret mode at a smoke-test size — correctness-only;
interpret-mode timings are meaningless and are not printed as results.
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


TR = 1024
M = 256
R = 2048  # in-kernel matmul repetitions per launch


def _kernel(reps, x_ref, w_ref, o_ref):
    x = x_ref[:]  # (K, TR) f32, VMEM-resident
    w = w_ref[:]  # (M, K)
    K = x.shape[0]

    def body(i, acc):
        # recurrence THROUGH the matmul: the next input mixes in the
        # previous output, so no algebraic rewrite can hoist or merge
        # the R matmuls (1e-20 keeps values stable; the dependence is
        # structural, not numeric)
        xi = x + acc[:K] * 1e-20
        return acc + jax.lax.dot_general(
            w.astype(jnp.bfloat16),
            xi.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    o_ref[:] = jax.lax.fori_loop(
        0, reps, body, jnp.zeros((M, TR), jnp.float32)
    )


def build(k: int, reps: int, length: int):
    interpret = jax.devices()[0].platform == "cpu"
    f = pl.pallas_call(
        functools.partial(_kernel, reps),
        in_specs=[
            pl.BlockSpec((k, TR), lambda: (0, 0)),
            pl.BlockSpec((M, k), lambda: (0, 0)),
        ],
        out_specs=pl.BlockSpec((M, TR), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, TR), jnp.float32),
        interpret=interpret,
    )

    @jax.jit
    def run(x, w, eps):
        def body(c, _):
            out = f(x + c, w)[0, 0]
            return out * eps, out  # eps is runtime data: no 0-folding

        _, outs = jax.lax.scan(body, jnp.float32(0.0), None, length=length)
        return outs

    return run


def _timed(run, x, w, eps, length):
    """Wall for one run() of `length` launches, synced by scalar fetch."""
    t0 = time.perf_counter()
    _ = float(run(x, w, eps)[-1])  # the fetch is the only real sync here
    return time.perf_counter() - t0


def main():
    on_cpu = jax.devices()[0].platform == "cpu"
    # interpret mode cannot time anything useful; shrink to a smoke test
    reps = 2 if on_cpu else R
    short, long_ = (1, 2) if on_cpu else (8, 40)
    results = {}
    flops = {}
    for k in (40, 72, 128):
        runs = {n: build(k, reps, n) for n in (short, long_)}
        x = jax.random.normal(jax.random.PRNGKey(0), (k, TR)) * 0.1
        w = jax.random.normal(jax.random.PRNGKey(1), (M, k)) * 0.01
        eps = jnp.float32(0.0)
        for n, run in runs.items():
            _ = float(run(x, w, eps)[-1])  # compile + warm
        # median-of-3 differenced wall: (long - short) cancels the fetch
        # round-trip and any constant dispatch cost exactly
        dts = sorted(
            _timed(runs[long_], x, w, eps, long_)
            - _timed(runs[short], x, w, eps, short)
            for _ in range(3)
        )
        dt = dts[1] / (long_ - short)
        results[f"K={k}"] = round(dt * 1e3, 4)
        flops[f"K={k}"] = round(2 * M * k * TR * reps / dt / 1e12, 1)
        print(
            f"K={k:3d}: {dt * 1e3:.4f} ms per launch "
            f"({reps}x (256,{k})@({k},{TR}); {flops[f'K={k}']} TFLOP/s)"
        )
    if on_cpu:
        print(
            "CPU interpret smoke test only: kernels executed and returned "
            "finite values; timings above are meaningless — run on a TPU "
            "for the pass-model verdict."
        )
        return
    r = results["K=72"] / results["K=128"]
    r40 = results["K=40"] / results["K=128"]
    print(json.dumps({"ms": results, "tflops": flops,
                      "K72_over_K128": round(r, 3),
                      "K40_over_K128": round(r40, 3)}))
    if r > 0.9:
        print("=> pass-model confirmed: sub-128 K costs a full 128 block; "
              "layout reworks are pass-neutral")
    else:
        print("=> sub-128 K IS cheaper; a tight-packed layout has real upside")


if __name__ == "__main__":
    main()
