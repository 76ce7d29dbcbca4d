"""CP-factorized grid NeRF (TensoRF-CP style) — the MXU-native grid family.

Third model family (opt-in via ``model_family: cpgrid``), implementing the
CP (CANDECOMP/PARAFAC) tensor-factorized radiance field of Chen et al.,
"TensoRF: Tensorial Radiance Fields" (ECCV 2022, arXiv 2203.09517): the
density/appearance volumes are rank-C sums of outer products of per-axis
1-D vectors, so a point query is three 1-D line interpolations multiplied
together — no 3-D grid is ever materialized.

Why this family exists, given the hash-grid family already does fast grid
training: the hash family is bound by the TPU gather/scatter OP-RATE
(~5 ns/row regardless of table size — measured and closed in
docs/PERFORMANCE.md "Hash-grid family"), and a Pallas VMEM-gather was
measured 2.4x SLOWER than XLA's gather (Mosaic has no vector-gather
primitive). This family is designed around that wall:

- **Line interpolation is a matmul, not a gather.** Linear interpolation
  of a C-channel table along an axis of V vertices is ``W @ table`` where
  ``W[b, i] = relu(1 - |u_b - i|)`` — the hat-function basis evaluated
  densely. Building W is one broadcast subtract + abs + relu on the VPU;
  the interpolation itself is a (B, V) x (V, C) matmul on the MXU.
- **The table gradient is a matmul too**: the VJP of ``W @ table`` is
  ``W.T @ g`` — dense MXU work, with none of XLA's scatter-add
  pathologies (the hash family's 2^14-row cap and Adam-eps surgery exist
  only because of sparse scatter gradients; here they are unnecessary).
- Everything downstream (component products, the appearance basis
  projection, the small decoder MLP) is elementwise VPU work and small
  MXU matmuls in the same fused XLA program.

Multi-resolution: ``Rs`` stacks several CP grids at geometric resolutions
(coarse levels stabilize early optimization the way TensoRF's
upsampling schedule does, without a schedule — all levels train jointly).

Output contract matches ``nerf_apply`` exactly — raw (B, 4)
``[rgb | sigma]``, no sigmoid / no sigma activation (compositing applies
softplus, ops/volume.py) — so every render/train/eval path (hierarchical,
proposal, occupancy, chunked eval, orbit video, shard_map DP) works
unchanged with this family. Capability superset of the reference model
(reference utils/nets.py:8-43) on the same (B, 6) -> (B, 4) surface.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from nerf_simple_tpu.ops.encoding import gamma

Params = dict


@dataclasses.dataclass(frozen=True)
class CPGridModel:
    """Static architecture config (hashable; safe as a jit static arg).

    Defaults target the framework's scene scale: two levels (64, 256)
    with 32 sigma + 96 appearance components each — total CP rank 64/192,
    between the paper's CP-192 and CP-384 presets — and the same small
    decoder head as the hash family.
    """

    Rs: tuple[int, ...] = (64, 256)  # per-level grid resolutions (cells
    # per axis; each level's line tables have R+1 vertex rows)
    Cs: int = 32  # sigma (density) components per level
    Ca: int = 96  # appearance components per level
    P: int = 27  # appearance feature width after the basis projection
    Ld: int = 4  # view-dir frequency octaves (reference gamma encoding)
    H: int = 64  # decoder MLP width
    aabb: float = 4.0  # scene half-extent: xyz in [-aabb, aabb] -> [0, 1]
    # mip-NeRF 360 scene contraction before the grid lookup (unbounded
    # scenes land in the radius-2 ball; pair with aabb=2.0). Model field
    # so checkpoints carry it — see models/nerf.py::NerfMLP.contract.
    contract: bool = False

    def __post_init__(self):
        # YAML lists arrive as python lists; the dataclass must stay
        # hashable (jit static arg), so coerce.
        object.__setattr__(self, "Rs", tuple(int(r) for r in self.Rs))

    @property
    def C(self) -> int:
        return self.Cs + self.Ca

    @property
    def n_levels(self) -> int:
        return len(self.Rs)

    @property
    def in_Cd(self) -> int:
        return 6 * self.Ld + 3  # raw-prepended dir encoding, like the MLP

    def layer_dims(self) -> dict[str, tuple[int, int]]:
        return {
            "color0": (self.P + self.in_Cd, self.H),
            "color1": (self.H, self.H),
            "color2": (self.H, 3),
        }


def init_cpgrid_params(
    key: jax.Array, model: CPGridModel = CPGridModel(), dtype=jnp.float32
) -> Params:
    """Line tables ~ 0.1 * N(0, 1) (the paper's grid init scale); the
    basis and decoder layers like torch.nn.Linear (U(+-1/sqrt(fan_in))),
    matching the framework's MLP init convention (models/nerf.py)."""
    k_lines, k_basis, k_mlp = jax.random.split(key, 3)
    params: Params = {}
    for lvl, (R, k) in enumerate(
        zip(model.Rs, jax.random.split(k_lines, model.n_levels))
    ):
        params[f"lines{lvl}"] = 0.1 * jax.random.normal(
            k, (3, R + 1, model.C), dtype
        )
    fan_in = model.Ca * model.n_levels
    bound = 1.0 / math.sqrt(fan_in)
    params["basis"] = jax.random.uniform(
        k_basis, (fan_in, model.P), dtype, minval=-bound, maxval=bound
    )
    dims = model.layer_dims()
    keys = jax.random.split(k_mlp, len(dims))
    for k, (name, (f_in, f_out)) in zip(keys, dims.items()):
        bound = 1.0 / math.sqrt(f_in)
        kw, kb = jax.random.split(k)
        params[name] = {
            "w": jax.random.uniform(
                kw, (f_in, f_out), dtype, minval=-bound, maxval=bound
            ),
            "b": jax.random.uniform(
                kb, (f_out,), dtype, minval=-bound, maxval=bound
            ),
        }
    return params


def hat_weights(u: jnp.ndarray, V: int) -> jnp.ndarray:
    """Dense linear-interpolation basis: (B,) vertex-space coords in
    [0, V-1] -> (B, V) hat-function weights, exactly two adjacent
    nonzeros summing to 1 (one at integer u).

    ``W @ table`` IS linear interpolation — the family's core move:
    the basis build is cheap VPU elementwise work and the interpolation
    (and its transpose, the table gradient) rides the MXU. Always f32:
    bf16 cannot carry vertex coordinates (8 mantissa bits ~ integer-only
    above 256)."""
    iota = jnp.arange(V, dtype=jnp.float32)
    return jax.nn.relu(1.0 - jnp.abs(u.astype(jnp.float32)[:, None] - iota))


def cp_encode(
    params: Params,
    x01: jnp.ndarray,
    model: CPGridModel,
    compute_dtype=jnp.float32,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """CP field query: (B, 3) points in [0, 1] -> ((B, 1) raw sigma,
    (B, P) appearance features).

    Per level: three hat-basis matmuls (one per axis) against the level's
    (V, C) line tables, multiplied elementwise over axes — the rank-C CP
    evaluation. Sigma is the sum of the first Cs components across all
    levels; appearance components concat across levels and project
    through the basis matrix (paper sec. 4.1's B)."""
    x01 = jnp.clip(x01, 0.0, 1.0)
    sig = None
    app_parts = []
    for lvl, R in enumerate(model.Rs):
        lines = params[f"lines{lvl}"]  # (3, V, C)
        u = x01 * R  # vertex-space coords in [0, R]
        prod = None
        for axis in range(3):
            W = hat_weights(u[:, axis], R + 1).astype(compute_dtype)
            e = jnp.dot(
                W,
                lines[axis].astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )  # (B, C) f32 accumulation
            prod = e if prod is None else prod * e
        s = jnp.sum(prod[:, : model.Cs], axis=-1, keepdims=True)
        sig = s if sig is None else sig + s
        app_parts.append(prod[:, model.Cs :])
    app = jnp.concatenate(app_parts, axis=-1)  # (B, Ca * n_levels)
    feat = jnp.dot(
        app.astype(compute_dtype),
        params["basis"].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )  # (B, P)
    return sig.astype(jnp.float32), feat


def _dense(p, x, dtype):
    return (
        jnp.dot(x, p["w"].astype(dtype), preferred_element_type=jnp.float32)
        + p["b"]
    )


def cpgrid_apply(
    params: Params,
    v: jnp.ndarray,
    model: CPGridModel = CPGridModel(),
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Forward pass: raw (B, 6) ``[xyz | unit dir]`` rows -> (B, 4)
    raw rgb+sigma — the same contract as ``nerf_apply`` so all render
    paths are model-agnostic."""
    xyz = v[..., 0:3]
    dirs = v[..., 3:6]
    if model.contract:
        from nerf_simple_tpu.ops.encoding import scene_contraction

        xyz = scene_contraction(xyz)
    x01 = (xyz + model.aabb) / (2.0 * model.aabb)
    sigma, feat = cp_encode(params, x01, model, compute_dtype)

    posd = jnp.concatenate([dirs, gamma(dirs, model.Ld)], axis=-1)
    h = jnp.concatenate(
        [feat.astype(compute_dtype), posd.astype(compute_dtype)], axis=-1
    )
    h = jax.nn.relu(_dense(params["color0"], h, compute_dtype)).astype(
        compute_dtype
    )
    h = jax.nn.relu(_dense(params["color1"], h, compute_dtype)).astype(
        compute_dtype
    )
    color = _dense(params["color2"], h, compute_dtype)  # (B, 3), f32 out

    return jnp.concatenate(
        [color.astype(jnp.float32), sigma.astype(jnp.float32)], axis=-1
    )
