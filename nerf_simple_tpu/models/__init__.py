"""Model families as functional pytree models.

Three families share one contract — ``apply(params, (B, 6) raw
``[xyz | unit dir]`` rows) -> (B, 4) raw ``[rgb | sigma]`` — so every
render/train/eval path is family-agnostic:

- ``NerfMLP`` (models/nerf.py): the reference architecture
  (utils/nets.py:8-43), frequency encoding + 256-wide MLP; the only
  family with a fused Pallas kernel path.
- ``HashGridModel`` (models/hashgrid.py): Instant-NGP multiresolution
  hash encoding + small MLP heads (opt-in ``model_family: hashgrid``).
- ``CPGridModel`` (models/cpgrid.py): TensoRF-CP factorized grids whose
  line interpolations are hat-basis MATMULS — the MXU-native grid family
  (opt-in ``model_family: cpgrid``).
"""

from __future__ import annotations

import dataclasses

import jax

from nerf_simple_tpu.models.cpgrid import (
    CPGridModel,
    cpgrid_apply,
    init_cpgrid_params,
)
from nerf_simple_tpu.models.hashgrid import (
    HashGridModel,
    hashgrid_apply,
    init_hashgrid_params,
)
from nerf_simple_tpu.models.nerf import (
    NerfMLP,
    infer_arch,
    init_nerf_params,
    nerf_apply,
)

__all__ = [
    "NerfMLP",
    "HashGridModel",
    "CPGridModel",
    "init_nerf_params",
    "init_hashgrid_params",
    "init_cpgrid_params",
    "nerf_apply",
    "hashgrid_apply",
    "cpgrid_apply",
    "apply_model",
    "init_model_params",
    "model_from_train_config",
    "infer_model",
    "model_meta",
    "model_from_meta",
]


def apply_model(params, v, model, compute_dtype, app=None, enc_alpha=None):
    """Family dispatch for the forward pass (same (B,6)->(B,4) contract).

    ``app``: (B, app_dim) appearance codes — NerfMLP-only (models/nerf.py),
    required iff ``model.app_dim > 0``. Density-only consumers (occupancy
    probes, normals, mesh export) pass zeros: sigma never sees the code.

    ``enc_alpha``: optional BARF anneal progress — NerfMLP-only (the
    hashgrid family's coarse-to-fine analogue would be level weighting,
    not built).
    """
    if isinstance(model, (HashGridModel, CPGridModel)):
        family = "hashgrid" if isinstance(model, HashGridModel) else "cpgrid"
        if app is not None:
            raise ValueError(
                f"appearance codes are NerfMLP-family only ({family} has "
                "no app_dim)"
            )
        if enc_alpha is not None:
            raise ValueError(
                "enc_alpha (PE annealing) is NerfMLP-family only"
            )
        fam_apply = (
            hashgrid_apply if isinstance(model, HashGridModel) else cpgrid_apply
        )
        return fam_apply(params, v, model, compute_dtype=compute_dtype)
    return nerf_apply(
        params, v, model, compute_dtype=compute_dtype, app=app,
        enc_alpha=enc_alpha,
    )


def zeros_app_for(model, n: int):
    """(n, app_dim) zero appearance codes for density-only forwards of an
    appearance-conditioned NerfMLP (sigma is independent of the code), or
    None when the model takes none."""
    if getattr(model, "app_dim", 0) > 0:
        import jax.numpy as jnp

        return jnp.zeros((n, model.app_dim), jnp.float32)
    return None


def init_model_params(key: jax.Array, model, dtype=None):
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    if isinstance(model, HashGridModel):
        return init_hashgrid_params(key, model, dtype)
    if isinstance(model, CPGridModel):
        return init_cpgrid_params(key, model, dtype)
    return init_nerf_params(key, model, dtype)


def model_from_train_config(cfg):
    """Build the training model from a TrainConfig (family + arch knobs)."""
    if cfg.model_family == "hashgrid":
        return HashGridModel(
            L=cfg.hash_L,
            F=cfg.hash_F,
            log2_T=cfg.hash_log2_T,
            N_min=cfg.hash_Nmin,
            N_max=cfg.hash_Nmax,
            Ld=cfg.net_Ld,
            H=cfg.hash_H,
            aabb=cfg.hash_aabb,
            grad_mode=cfg.hash_grad_mode,
            contract=cfg.contract,
        )
    if cfg.model_family == "cpgrid":
        return CPGridModel(
            Rs=tuple(cfg.cp_Rs),
            Cs=cfg.cp_Cs,
            Ca=cfg.cp_Ca,
            P=cfg.cp_P,
            Ld=cfg.net_Ld,
            H=cfg.cp_H,
            aabb=cfg.cp_aabb,
            contract=cfg.contract,
        )
    return NerfMLP(
        Lp=cfg.net_Lp, Ld=cfg.net_Ld, H=cfg.net_H, contract=cfg.contract,
        app_dim=cfg.appearance_dim,
    )


def model_meta(model) -> dict:
    """JSON-serializable model description (checkpoint sidecar)."""
    family = (
        "hashgrid"
        if isinstance(model, HashGridModel)
        else "cpgrid"
        if isinstance(model, CPGridModel)
        else "nerf"
    )
    return {"family": family, **dataclasses.asdict(model)}


def model_from_meta(meta: dict):
    meta = dict(meta)
    family = meta.pop("family", "nerf")
    if family == "hashgrid":
        return HashGridModel(**meta)
    if family == "cpgrid":
        return CPGridModel(**meta)  # __post_init__ re-tuples json's Rs list
    if family == "nerf":
        # NerfMLP field names differ from its YAML knobs; meta stores
        # dataclass fields directly
        return NerfMLP(**meta)
    raise ValueError(f"unknown model family {family!r} in model meta")


def infer_model(params):
    """Recover the model from a params pytree alone.

    NerfMLP architectures are fully determined by layer shapes
    (models/nerf.py::infer_arch). Hash-grid params determine (L, T, F)
    and the head dims but NOT the static floats (N_min/N_max/aabb) — those
    come from the ``model.json`` sidecar the train driver writes next to
    every checkpoint; without it we fall back to the family defaults for
    the unrecoverable fields and warn.
    """
    p = params
    if isinstance(p, dict) and "fine" in p and "tables" not in p:
        p = p["fine"]
    if isinstance(p, dict) and "basis" in p and "lines0" in p:
        import warnings

        Rs = []
        while f"lines{len(Rs)}" in p:
            Rs.append(p[f"lines{len(Rs)}"].shape[1] - 1)
        C = p["lines0"].shape[2]
        P = p["basis"].shape[1]
        H = p["color0"]["w"].shape[1]
        Ld = (p["color0"]["w"].shape[0] - P - 3) // 6
        # the Cs/Ca split and aabb are NOT recoverable from weight
        # shapes — they come from the model.json sidecar the train
        # driver writes; fall back to the family split only if it fits
        m = CPGridModel(Rs=tuple(Rs), P=P, Ld=Ld, H=H)
        if m.C != C or p["basis"].shape[0] != m.Ca * m.n_levels:
            raise ValueError(
                "cpgrid checkpoint has no model.json sidecar and its "
                f"component width C={C} does not match the family default "
                f"split Cs={m.Cs}/Ca={m.Ca}: the split cannot be recovered "
                "from weight shapes — keep the model.json the train "
                "driver writes next to every checkpoint"
            )
        warnings.warn(
            "cpgrid checkpoint has no model.json sidecar: the Cs/Ca "
            "component split and aabb are not recoverable from weights; "
            "the shapes match the family defaults, using those — renders "
            "will be wrong if training overrode cp_aabb",
            stacklevel=2,
        )
        return m
    if isinstance(p, dict) and "tables" in p:
        import warnings

        if p["tables"].ndim == 3:
            raise ValueError(
                "hash-grid checkpoint uses the old stacked (L, T, F) "
                f"table layout {tuple(p['tables'].shape)}; the family "
                "now stores one flat ragged (total_rows, F) table with "
                "dense coarse levels. Retrain, or migrate the tables by "
                "slicing each level to HashGridModel.level_sizes() rows "
                "and concatenating along axis 0"
            )
        total_rows, F = p["tables"].shape
        H, out1 = p["sigma1"]["w"].shape
        geo = out1 - 1
        in_c0 = p["color0"]["w"].shape[0]
        Ld = (in_c0 - geo - 3) // 6
        m = HashGridModel(F=F, Ld=Ld, H=H, geo_feat=geo)
        if m.total_rows != total_rows:
            raise ValueError(
                "hash-grid checkpoint has no model.json sidecar and its "
                f"table layout ({total_rows} rows) does not match the "
                f"family defaults ({m.total_rows} rows): the grid statics "
                "(L/log2_T/N_min/N_max/aabb) cannot be recovered from "
                "weight shapes — keep the model.json the train driver "
                "writes next to every checkpoint"
            )
        warnings.warn(
            "hash-grid checkpoint has no model.json sidecar: grid statics "
            "are not recoverable from weights; the table layout matches "
            "the family defaults, using those — renders will be wrong if "
            "training overrode aabb",
            stacklevel=2,
        )
        return m
    return infer_arch(params)
