"""The NeRF MLP as a functional pytree model.

Architecture is behavior-equivalent to the reference ``Nerf`` module
(reference utils/nets.py:8-43), including its quirks:

- positional encoding is applied INSIDE the model forward, not by the
  renderer (utils/nets.py:36) — inputs are raw (B, 6) rows;
- trunk: Linear(63->H)+ReLU, then 4x Linear(H->H)+ReLU (utils/nets.py:16-19);
- skip: Linear(H+63->H)+ReLU on ``concat([h, posx])`` (utils/nets.py:21,38);
- 2 more Linear(H->H)+ReLU (utils/nets.py:23-26);
- sigma head Linear(H->1) with NO activation (utils/nets.py:27,40);
- feature layer Linear(H->H) with NO activation (utils/nets.py:28,41);
- color head Linear(H+27->H//2)+ReLU -> Linear(H//2->3), NO sigmoid
  (utils/nets.py:30-32,42);
- output is ``concat([color, sigma])`` (B, 4) (utils/nets.py:43).

Implementation is a plain dict-of-arrays pytree with a pure ``apply``:
maximally transparent to XLA (nine dense matmuls it tiles straight onto
the MXU), trivially donate-able/shardable, and directly consumable by the
Pallas fused-render kernel which wants raw weight matrices in VMEM.

Weights are stored (in_features, out_features) so ``x @ W + b`` needs no
transposes. Init matches torch.nn.Linear's default distribution
(U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both W and b) so training dynamics
are comparable; exact values differ (different RNG), which is fine — parity
is defined at equal-iteration PSNR, not identical weights.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from nerf_simple_tpu.ops.encoding import positional_encoder

Params = dict[str, dict[str, jnp.ndarray]]

# Layer names in forward order. (in, out) dims are derived in init from
# (Lp, Ld, H). "trunk0".."trunk4" = reference layers_0; "skip" =
# skip_conn_layer; "post0","post1" = layers_1; "sigma" = sigma_fc;
# "feature" = layers_2; "color0","color1" = color_fc.
_LAYERS = (
    "trunk0",
    "trunk1",
    "trunk2",
    "trunk3",
    "trunk4",
    "skip",
    "post0",
    "post1",
    "sigma",
    "feature",
    "color0",
    "color1",
)


@dataclasses.dataclass(frozen=True)
class NerfMLP:
    """Static architecture config (hashable; safe as a jit static arg)."""

    Lp: int = 10
    Ld: int = 4
    H: int = 256
    # mip-NeRF 360 scene contraction (ops/encoding.py::scene_contraction):
    # positions are squashed into the radius-2 ball before encoding —
    # unbounded-scene support. A MODEL field (not a render setting) so
    # checkpoints carry it (model.json sidecar) and every consumer
    # (render/train/occupancy probes/normals/mesh) is consistent.
    contract: bool = False
    # NeRF-W-style per-image appearance conditioning: a code of this
    # width is appended to the view-direction encoding, so it feeds ONLY
    # the color head (density stays appearance-invariant — geometry is
    # shared across exposures). The codes themselves are per-image
    # trainable params owned by the train step ({"app": (n_images, A)}
    # group, train/step.py); the model only fixes the color head's
    # fan-in. 0 = off (reference behavior).
    app_dim: int = 0

    @property
    def in_Cx(self) -> int:
        return 6 * self.Lp + 3

    @property
    def in_Cd(self) -> int:
        return 6 * self.Ld + 3

    def layer_dims(self) -> dict[str, tuple[int, int]]:
        H, Cx, Cd = self.H, self.in_Cx, self.in_Cd
        return {
            "trunk0": (Cx, H),
            "trunk1": (H, H),
            "trunk2": (H, H),
            "trunk3": (H, H),
            "trunk4": (H, H),
            "skip": (H + Cx, H),
            "post0": (H, H),
            "post1": (H, H),
            "sigma": (H, 1),
            "feature": (H, H),
            "color0": (H + Cd + self.app_dim, H // 2),
            "color1": (H // 2, 3),
        }


def infer_arch(params: Params) -> NerfMLP:
    """Recover the NerfMLP architecture from a params pytree (layer
    shapes determine (Lp, Ld, H) uniquely) — lets eval/load paths adapt
    to whatever architecture a checkpoint was trained with. Hierarchical
    {coarse, fine} dicts infer from the fine net."""
    if "fine" in params and "trunk0" not in params:
        params = params["fine"]
    Cx, H = params["trunk0"]["w"].shape
    Cd = params["color0"]["w"].shape[0] - H
    if (Cd - 3) % 6:
        # an appearance-conditioned checkpoint (app_dim > 0) widens the
        # color head past any (Ld)-encoding width; (Ld, app_dim) cannot
        # both be recovered from shapes alone
        raise ValueError(
            f"color head fan-in {params['color0']['w'].shape[0]} does not "
            f"match any pure direction-encoding width (H={H} + 6*Ld + 3): "
            "this looks like an appearance-embedding checkpoint "
            "(app_dim > 0) — rebuild the model from the model.json "
            "sidecar the train driver writes next to every checkpoint"
        )
    return NerfMLP(Lp=(Cx - 3) // 6, Ld=(Cd - 3) // 6, H=H)


def init_nerf_params(
    key: jax.Array, model: NerfMLP = NerfMLP(), dtype=jnp.float32
) -> Params:
    """Initialize params: W, b ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    params: Params = {}
    dims = model.layer_dims()
    keys = jax.random.split(key, len(_LAYERS))
    for k, name in zip(keys, _LAYERS):
        fan_in, fan_out = dims[name]
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


def _dense(p: dict[str, jnp.ndarray], x: jnp.ndarray, dtype) -> jnp.ndarray:
    return (
        jnp.dot(x, p["w"].astype(dtype), preferred_element_type=jnp.float32)
        + p["b"]
    )


def nerf_apply(
    params: Params,
    v: jnp.ndarray,
    model: NerfMLP = NerfMLP(),
    compute_dtype: Any = jnp.float32,
    app: jnp.ndarray | None = None,
    enc_alpha: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Forward pass: raw (B, 6) ``[xyz | unit dir]`` rows -> (B, 4) rgb+sigma.

    ``compute_dtype=jnp.bfloat16`` casts activations/weights to bf16 for the
    MXU while accumulating in f32 (preferred_element_type) and returning f32
    outputs — the TPU fast path. f32 is the parity path.

    ``app``: (B, app_dim) per-row appearance codes, required iff
    ``model.app_dim > 0`` — appended to the direction encoding so they
    condition only the color head.

    ``enc_alpha``: optional BARF coarse-to-fine anneal progress in
    [0, 1] (traced scalar; ops/encoding.py::anneal_weights) — the
    pose-refinement companion (TrainConfig.pe_anneal_until). None = the
    standard full-frequency encoder.
    """
    if (app is None) != (model.app_dim == 0) or (
        app is not None and app.shape[-1] != model.app_dim
    ):
        raise ValueError(
            f"model.app_dim={model.app_dim} but app is "
            f"{None if app is None else app.shape} — appearance models "
            "need matching (B, app_dim) codes (and only they accept them)"
        )
    if model.contract:
        from nerf_simple_tpu.ops.encoding import scene_contraction

        v = jnp.concatenate(
            [scene_contraction(v[..., :3]), v[..., 3:]], axis=-1
        )
    posx, posd = positional_encoder(
        v, Lp=model.Lp, Ld=model.Ld, alpha=enc_alpha
    )
    if app is not None:
        posd = jnp.concatenate([posd, app.astype(posd.dtype)], axis=-1)
    return _apply_encoded(params, posx, posd, compute_dtype)


def nerf_apply_mip(
    params: Params,
    mean: jnp.ndarray,
    var: jnp.ndarray,
    dirs: jnp.ndarray,
    model: NerfMLP = NerfMLP(),
    compute_dtype: Any = jnp.float32,
) -> jnp.ndarray:
    """Mip forward pass: frustum Gaussians instead of points.

    Same trunk/heads/params as ``nerf_apply`` — only the position
    encoder differs (integrated PE over N(mean, diag var),
    ops/encoding.py::ipe_encoder), so mip checkpoints are
    arch-indistinguishable from point-sampled ones and every load/infer
    path works unchanged.

    Args: mean/var (B, 3) frustum Gaussian moments
    (ops/sampling.py::conical_gaussian); dirs (B, 3) unit view dirs.
    """
    if model.contract:
        # mip-NeRF 360: contract the frustum Gaussian via the
        # linearized warp (mean through contract, var through the
        # Jacobian) before the integrated encoding
        from nerf_simple_tpu.ops.encoding import contract_gaussian

        mean, var = contract_gaussian(mean, var)
    from nerf_simple_tpu.ops.encoding import ipe_encoder

    posx, posd = ipe_encoder(mean, var, dirs, Lp=model.Lp, Ld=model.Ld)
    return _apply_encoded(params, posx, posd, compute_dtype)


def _apply_encoded(
    params: Params,
    posx: jnp.ndarray,
    posd: jnp.ndarray,
    compute_dtype: Any,
) -> jnp.ndarray:
    posx = posx.astype(compute_dtype)
    posd = posd.astype(compute_dtype)

    h = posx
    for name in ("trunk0", "trunk1", "trunk2", "trunk3", "trunk4"):
        h = jax.nn.relu(_dense(params[name], h, compute_dtype)).astype(
            compute_dtype
        )
    h = jnp.concatenate([h, posx], axis=-1)
    h = jax.nn.relu(_dense(params["skip"], h, compute_dtype)).astype(
        compute_dtype
    )
    for name in ("post0", "post1"):
        h = jax.nn.relu(_dense(params[name], h, compute_dtype)).astype(
            compute_dtype
        )

    sigma = _dense(params["sigma"], h, compute_dtype)  # (B, 1), f32 out
    feat = _dense(params["feature"], h, compute_dtype).astype(compute_dtype)
    hc = jnp.concatenate([feat, posd], axis=-1)
    hc = jax.nn.relu(_dense(params["color0"], hc, compute_dtype)).astype(
        compute_dtype
    )
    color = _dense(params["color1"], hc, compute_dtype)  # (B, 3), f32 out

    return jnp.concatenate(
        [color.astype(jnp.float32), sigma.astype(jnp.float32)], axis=-1
    )
