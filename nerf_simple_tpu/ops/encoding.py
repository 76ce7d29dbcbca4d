"""Sinusoidal positional encoding, vectorized for the TPU VPU.

Behavior-equivalent to the reference encoder (reference utils/xyz.py:6-36)
but computed with a single broadcasted sin/cos over a frequency axis instead
of a Python loop of per-frequency tensor ops.

Reference semantics that matter for per-pixel parity:

- Per scalar channel ``u``, the encoding is ``[sin(2^i u), cos(2^i u)]``
  interleaved per frequency i=0..L-1 (reference utils/xyz.py:10-13), i.e.
  layout ``[sin(u), cos(u), sin(2u), cos(2u), ...]`` — 2L features.
- The *raw* values are prepended: the position branch emits
  ``[x, y, z, gamma(x), gamma(y), gamma(z)]`` -> 3 + 6*Lp features
  (63 for Lp=10); the direction branch analogously -> 3 + 6*Ld (27 for
  Ld=4) (reference utils/xyz.py:33-34).
- Inputs are NOT rescaled to [-1, 1]; the reference merely warns
  (utils/xyz.py:8-9). We replicate the un-rescaled behavior (no warning on
  the compiled hot path — a host-side check lives in the data layer).
"""

from __future__ import annotations

import jax.numpy as jnp


def gamma(
    x: jnp.ndarray, L: int = 4, alpha: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Frequency-encode each scalar feature of ``x``.

    Args:
      x: (..., C) array.
      L: number of frequency octaves.
      alpha: optional BARF anneal progress in [0, 1] (traced scalar) —
        octave k is scaled by ``anneal_weights(L, alpha)[k]``. None =
        the standard (full-frequency) encoder.

    Returns:
      (..., C * 2L) array. For each input channel the 2L outputs are
      interleaved ``[sin(2^0 x), cos(2^0 x), sin(2^1 x), ...]``, and
      channel blocks are concatenated in input-channel order — matching
      the reference layout when called per-channel (utils/xyz.py:10-13).
    """
    freqs = 2.0 ** jnp.arange(L, dtype=x.dtype)  # (L,)
    ang = x[..., None] * freqs  # (..., C, L)
    # (..., C, L, 2) with sin before cos, then flatten (C, L, 2) -> C*2L.
    enc = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    if alpha is not None:
        enc = enc * anneal_weights(L, alpha, x.dtype)[:, None]
    return enc.reshape(*x.shape[:-1], x.shape[-1] * 2 * L)


def anneal_weights(L: int, alpha: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """BARF coarse-to-fine octave weights (Lin et al. 2021, eqn. 14).

    ``alpha`` is the anneal PROGRESS in [0, 1]; octave k's weight is

        w_k = (1 - cos(pi * clip(alpha * L - k, 0, 1))) / 2

    — zero before the window reaches the octave, a smooth cosine ramp
    through it, one after. At alpha=0 every octave is off (only the
    raw-prepended values drive the MLP); at alpha>=1 this is the
    standard encoder. Rationale: full-frequency positional encoding
    makes photometric POSE gradients oscillate at 2^k, so joint pose
    refinement (TrainConfig.pose_opt) stalls in noise; annealing lets
    the smooth octaves align the rig before the sharp ones lock detail
    in. Returns (L,) weights, traced-alpha friendly (one compiled
    program serves the whole schedule)."""
    k = jnp.arange(L, dtype=dtype)
    ramp = jnp.clip(alpha * L - k, 0.0, 1.0)
    return (1.0 - jnp.cos(jnp.pi * ramp)) / 2.0


def scene_contraction(x: jnp.ndarray) -> jnp.ndarray:
    """Mip-NeRF 360 scene contraction (Barron et al. 2022, eqn. 10):

        contract(x) = x                        for ||x|| <= 1
                    = (2 - 1/||x||) * x/||x||  otherwise

    — the identity inside the unit ball, and a radially-monotone squash
    of ALL of R^3 into the radius-2 ball outside it, so an unbounded
    scene (background at any distance) lands in a bounded encoding
    domain. C1-continuous at the ball boundary. Applied at the MODEL
    boundary (models/nerf.py, models/hashgrid.py ``contract`` field), so
    every consumer — render, train, occupancy probes, normals (the VJP
    chains through it), mesh export — stays consistent automatically.

    Pure broadcast VPU math; fuses into the encoder's producer.
    """
    n = jnp.maximum(
        jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-10
    )
    return jnp.where(n <= 1.0, x, (2.0 - 1.0 / n) * (x / n))


def contract_gaussian(
    mean: jnp.ndarray, var: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Linearized scene contraction of diagonal Gaussians (mip-NeRF 360
    eqn. 8-9): the frustum Gaussian (mean, diag var) maps to

        mean' = contract(mean),   var' = diag(J Sigma J^T),

    with J the contraction Jacobian at the mean. For
    ``contract(x) = g(r) x`` with ``g(r) = (2 - 1/r)/r`` outside the
    unit ball (identity inside), ``J = g I + (g'/r) x x^T``, giving the
    closed-form diagonal

        var'_i = g^2 v_i + 2 g c m_i^2 v_i + c^2 m_i^2 (sum_j m_j^2 v_j)

    with ``c = g'(r)/r``. Inside the ball g=1, c=0 — exact identity.
    Pure broadcast VPU math, shared by the XLA mip forward
    (models/nerf.py::nerf_apply_mip) and mirrored in-kernel
    (kernels/mlp.py::_encode) for the fused path.
    """
    r = jnp.maximum(
        jnp.linalg.norm(mean, axis=-1, keepdims=True), 1e-10
    )
    inside = r <= 1.0
    g = jnp.where(inside, 1.0, (2.0 - 1.0 / r) / r)
    # g'(r) = -2/r^2 + 2/r^3 ; c = g'/r
    c = jnp.where(inside, 0.0, (-2.0 / r**2 + 2.0 / r**3) / r)
    m2 = mean**2
    m2v = jnp.sum(m2 * var, axis=-1, keepdims=True)
    var_out = g**2 * var + 2.0 * g * c * m2 * var + c**2 * m2 * m2v
    return g * mean, var_out


def gamma_ipe(mean: jnp.ndarray, var: jnp.ndarray, L: int = 10) -> jnp.ndarray:
    """Integrated positional encoding (mip-NeRF, Barron et al. 2021,
    eqn. 14): the EXPECTED frequency encoding of x ~ N(mean, diag(var)),

        E[sin(2^i x)] = sin(2^i mean) * exp(-0.5 * 4^i * var)

    (and likewise cos) — closed form, exact for Gaussians. Frequencies
    whose period is smaller than the Gaussian's support damp to zero, so
    a sample that integrates a wide conical frustum (a far/low-res
    pixel) stops aliasing against sub-footprint detail. Layout matches
    ``gamma`` exactly (interleaved sin/cos per channel); var -> 0
    recovers ``gamma(mean)`` bitwise.

    TPU shape: pure broadcast VPU math on the same (..., C, L) lattice
    as ``gamma`` — XLA fuses it into the consuming matmul's operand
    producer just like the plain encoder.
    """
    freqs = 2.0 ** jnp.arange(L, dtype=mean.dtype)  # (L,)
    ang = mean[..., None] * freqs
    damp = jnp.exp(-0.5 * var[..., None] * freqs * freqs)
    enc = jnp.stack([jnp.sin(ang) * damp, jnp.cos(ang) * damp], axis=-1)
    return enc.reshape(*mean.shape[:-1], mean.shape[-1] * 2 * L)


def ipe_encoder(
    mean: jnp.ndarray,
    var: jnp.ndarray,
    dirs: jnp.ndarray,
    Lp: int = 10,
    Ld: int = 4,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Mip positional encoder: IPE position branch + the ordinary
    direction branch (directions are points, not volumes).

    The raw-prepend quirk is kept — the position branch emits
    ``[mean, gamma_ipe(mean, var)]`` — so the SAME NerfMLP architecture
    (in_Cx = 6*Lp + 3) consumes either encoder and a mip-trained
    checkpoint round-trips through every existing load/infer path.
    """
    posx = jnp.concatenate([mean, gamma_ipe(mean, var, Lp)], axis=-1)
    posd = jnp.concatenate([dirs, gamma(dirs, Ld)], axis=-1)
    return posx, posd


def positional_encoder(
    vec: jnp.ndarray,
    Lp: int = 10,
    Ld: int = 4,
    alpha: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Encode packed ``[xyz | view-dir]`` rows.

    Args:
      vec: (..., 6) array of ``x, y, z, d1, d2, d3`` rows.
      Lp: octaves for the position channels.
      Ld: octaves for the direction channels.
      alpha: optional BARF anneal progress in [0, 1], applied to BOTH
        encoders on the same progress scale (each finishes its own L
        octaves at alpha=1). The raw-prepended values are never damped.

    Returns:
      ``(posx, posd)``: (..., 3 + 6*Lp) and (..., 3 + 6*Ld), raw values
      first then per-channel frequency blocks, matching the reference
      feature layout exactly (utils/xyz.py:33-34).
    """
    xyz = vec[..., 0:3]
    d = vec[..., 3:6]
    posx = jnp.concatenate([xyz, gamma(xyz, Lp, alpha)], axis=-1)
    posd = jnp.concatenate([d, gamma(d, Ld, alpha)], axis=-1)
    return posx, posd
