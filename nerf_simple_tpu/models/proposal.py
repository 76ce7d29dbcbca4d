"""Density-only proposal MLP: learned sample placement (mip-NeRF 360).

The reference's roadmap coarse/fine scheme (stubs at reference
utils/nets.py:45-48) steers the fine samples with a SECOND full NeRF —
the coarse pass costs as much per sample as the fine one. The proposal
scheme (mip-NeRF 360, Barron et al. 2022, sec. 3) replaces it with a
tiny density-only network whose compositing weights are distilled from
the main field via an interlevel bound loss (ops/volume.py::
interlevel_loss): sample placement quality of hierarchical NeRF at
~1/30th of the coarse-pass FLOPs.

TPU shape: the proposal MLP is a handful of small dense matmuls — pure
MXU work that XLA fuses into the train step program; no gathers, no
dynamic shapes. It is deliberately kept in the XLA (autodiff) path: at
Np=64 samples x 64 hidden the whole forward+backward is < 3% of the
fused main-network kernel time, so a bespoke Pallas kernel would buy
nothing (cf. docs/PERFORMANCE.md speed-of-light accounting).

All statics are recoverable from weight shapes (``infer_proposal_arch``)
so checkpoints need no extra sidecar. Opt-in via TrainConfig.proposal;
mutually exclusive with ``hierarchical`` (they are alternative
quality-path samplers).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from nerf_simple_tpu.ops.encoding import gamma
from nerf_simple_tpu.ops.volume import weights_from_sigma

Params = dict[str, dict[str, jnp.ndarray]]


@dataclasses.dataclass(frozen=True)
class ProposalMLP:
    """Static architecture (hashable; safe as a jit static arg).

    Defaults follow mip-NeRF 360's proposal sizing translated to the
    PE-MLP family: low-frequency position encoding (coarse placement
    does not need octave-10 detail) and a narrow trunk.
    """

    Lp: int = 6  # position-encoding octaves
    D: int = 4  # hidden layers
    H: int = 64  # hidden width
    # scene contraction before encoding — must match the main field's
    # contract flag (models/__init__.py wires both from cfg.contract)
    contract: bool = False

    @property
    def in_Cx(self) -> int:
        return 6 * self.Lp + 3

    def layer_dims(self) -> dict[str, tuple[int, int]]:
        dims: dict[str, tuple[int, int]] = {"trunk0": (self.in_Cx, self.H)}
        for i in range(1, self.D):
            dims[f"trunk{i}"] = (self.H, self.H)
        dims["sigma"] = (self.H, 1)
        return dims


def proposal_from_train_config(cfg) -> ProposalMLP:
    return ProposalMLP(
        Lp=cfg.prop_Lp, D=cfg.prop_D, H=cfg.prop_H, contract=cfg.contract
    )


def infer_proposal_arch(params: Params) -> ProposalMLP:
    """Recover the ProposalMLP architecture from weight shapes (fully
    determined: Lp from trunk0's input dim, H from its output dim, D
    from the trunk layer count)."""
    Cx, H = params["trunk0"]["w"].shape
    D = sum(1 for name in params if name.startswith("trunk"))
    return ProposalMLP(Lp=(Cx - 3) // 6, D=D, H=H)


def init_proposal_params(
    key: jax.Array, model: ProposalMLP = ProposalMLP(), dtype=jnp.float32
) -> Params:
    """W, b ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — same family init as
    the main MLP (models/nerf.py) for comparable training dynamics."""
    params: Params = {}
    dims = model.layer_dims()
    keys = jax.random.split(key, len(dims))
    for k, (name, (fan_in, fan_out)) in zip(keys, dims.items()):
        bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, dtype=jnp.float32))
        kw, kb = jax.random.split(k)
        params[name] = {
            "w": jax.random.uniform(
                kw, (fan_in, fan_out), dtype, minval=-bound, maxval=bound
            ),
            "b": jax.random.uniform(
                kb, (fan_out,), dtype, minval=-bound, maxval=bound
            ),
        }
    return params


def proposal_sigma(
    params: Params,
    locs: jnp.ndarray,
    model: ProposalMLP = ProposalMLP(),
    compute_dtype: Any = jnp.float32,
) -> jnp.ndarray:
    """Raw (pre-softplus) density at (..., 3) sample positions -> (...,).

    bf16 compute_dtype runs the matmuls on the MXU with f32 accumulation
    (preferred_element_type), like the main model."""
    if model.contract:
        from nerf_simple_tpu.ops.encoding import scene_contraction

        locs = scene_contraction(locs)
    h = jnp.concatenate([locs, gamma(locs, model.Lp)], axis=-1).astype(
        compute_dtype
    )
    for i in range(model.D):
        p = params[f"trunk{i}"]
        h = jax.nn.relu(
            jnp.dot(
                h,
                p["w"].astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
            + p["b"]
        ).astype(compute_dtype)
    p = params["sigma"]
    out = (
        jnp.dot(
            h, p["w"].astype(compute_dtype), preferred_element_type=jnp.float32
        )
        + p["b"]
    )
    return out[..., 0].astype(jnp.float32)


def proposal_weights(
    params: Params,
    rays: jnp.ndarray,
    ts: jnp.ndarray,
    model: ProposalMLP = ProposalMLP(),
    compute_dtype: Any = jnp.float32,
) -> jnp.ndarray:
    """Compositing weights of the proposal density field along rays.

    Args:
      rays: (B, 6) packed ``[origin | direction]`` (direction
        unnormalized — sample placement uses the raw direction, the
        reference quirk shared with the main render path).
      ts: (B, N) sorted sample distances.

    Returns (B, N) weights — differentiable wrt ``params`` (the
    interlevel loss trains the proposal through this)."""
    origins, dirs = rays[:, :3], rays[:, 3:6]
    locs = origins[:, None, :] + dirs[:, None, :] * ts[..., None]
    sigma = proposal_sigma(params, locs, model, compute_dtype)
    unit_dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return weights_from_sigma(sigma, ts, unit_dirs)


def proposal_weights_intervals(
    params: Params,
    rays: jnp.ndarray,
    edges: jnp.ndarray,
    model: ProposalMLP = ProposalMLP(),
    compute_dtype: Any = jnp.float32,
    opaque_tail: bool = False,
) -> jnp.ndarray:
    """Interval-histogram proposal weights for cone-cast rendering (the
    mip x proposal composition): density queried at the probe interval
    MIDPOINTS, composited with the true finite interval widths
    (ops/volume.py::weights_from_sigma_intervals — no 1e10 tail).

    The proposal stays point-sampled even under mip: its job is coarse
    placement, and a midpoint probe of a smooth low-frequency density is
    the cheap sufficient approximation (mip-NeRF 360 itself anneals its
    proposal supervision rather than demanding IPE fidelity from it).

    Args: rays (B, >=6) packed ``[origin | direction | ...]`` — mip
    radius/weight columns beyond 6 are ignored; edges (B, N+1) ascending
    probe interval edges. Returns (B, N) weights, differentiable wrt
    ``params``.
    """
    from nerf_simple_tpu.ops.volume import weights_from_sigma_intervals

    origins, dirs = rays[:, :3], rays[:, 3:6]
    mids = 0.5 * (edges[:, 1:] + edges[:, :-1])
    locs = origins[:, None, :] + dirs[:, None, :] * mids[..., None]
    sigma = proposal_sigma(params, locs, model, compute_dtype)
    unit_dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return weights_from_sigma_intervals(
        sigma, edges, unit_dirs, opaque_tail=opaque_tail
    )
