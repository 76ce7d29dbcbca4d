"""nerf_simple_tpu — a TPU-native NeRF framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
UCSD-Comp-Imaging/Nerf-Simple (reference mounted at /root/reference):

- ``ops``      — pure-jnp geometry/encoding/sampling/compositing math
                 (reference: utils/xyz.py, utils/rendering.py)
- ``models``   — the NeRF MLP as a functional pytree model
                 (reference: utils/nets.py)
- ``data``     — Blender-synthetic + LLFF loaders, device-resident ray
                 datasets, jitted batch sampling (reference: utils/dataload.py)
- ``render``   — fused ray rendering, tiled image rendering, orbit video
                 (reference: utils/rendering.py, test.py)
- ``train``    — jitted train step (scan-amortized), metrics, checkpoints,
                 TensorBoard logging (reference: train.py)
- ``parallel`` — device mesh + sharding helpers for multi-chip data
                 parallelism (no reference equivalent; designed TPU-first)
- ``kernels``  — Pallas TPU kernels for the fused render hot path

Design stance: everything on the hot path is a pure function of
``(params, rays, key)`` compiled once by XLA; the whole training ray set
lives in HBM; per-step batch selection happens on device inside the jitted
step, so steady-state training does zero host<->device transfers.
"""

__version__ = "0.1.0"
