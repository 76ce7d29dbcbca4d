"""Fully-fused NeRF MLP as a single Pallas TPU kernel.

Replaces the XLA layer-by-layer MLP on the render hot path. One kernel
invocation computes, for a tile of sample rows held entirely in VMEM:

  positional encoding -> 5 trunk layers -> skip -> 2 post layers ->
  sigma + feature heads -> color head

so no inter-layer activation ever touches HBM (the XLA path writes ~2.6GB
of activations to HBM per training iteration at the reference batch
shape). Numerics match models/nerf.py (same math, reordered features).

Design notes (see pallas_guide.md for the hardware model):

- **Feature-major (transposed) layout.** Activations are (features, rows)
  with rows on the 128-wide lane axis and features on sublanes: every
  feature count is padded sublane-aligned (72, 256, 136, 128, 40, 8 for
  the flagship NerfMLP(10, 4, 256); derived from (Lp, Ld, H) in general),
  and the sample-row axis (thousands) gives long, aligned lanes. The
  caller passes x^T (8, rows) and gets out^T (8, rows).

- **Encoding as a spread matmul.** gamma's per-channel/per-frequency
  layout is produced WITHOUT reshapes or gathers: ``ang = S @ x`` with a
  constant (F, 8) "spread" matrix placing ``2^i * channel_c`` in each
  encoded row, then sin/cos evaluated on their own 8-row-aligned blocks
  (half the transcendentals of an interleaved layout; no row masks).
  Correctness vs the reference feature ORDER is restored by permuting the
  first-layer weight ROWS on the host (``x P^T (P W) == x W``) — see
  pack_weights.

- **Concats become split matmuls.** The skip layer's ``[h | posx] @ W``
  is ``Wh @ h + Wx @ posx`` (reference utils/nets.py:21,38), the color
  head's ``[feat | posd] @ W`` likewise (utils/nets.py:30,42). No
  in-kernel concatenation anywhere.

- **The feature layer is folded away at pack time.** The reference's
  feature layer has NO activation (utils/nets.py:28,41 — a quirk), so
  ``Wcf @ (Wf h + bf)`` == ``(Wcf Wf) h + Wcf bf`` exactly: pack_weights
  precomputes ``Wcs = [Wcf·Wf ; Wsigma]`` (H/2 + 8 rows, sigma at row
  H/2) in f32 on the host, and the kernel runs ONE (H/2+8, H) matmul
  where the old layout ran a 264-row feature+sigma head followed by a
  (H/2, H) color contraction — deleting ~10% of the MXU tile-passes in
  forward AND backward plus the ``feat`` residual buffer. Gradients for
  the original ``feature``/``color0``/``sigma`` params fall out of
  jax.vjp through pack_weights (the product rule on ``Wcf·Wf``).

- Weights stay resident in VMEM across the row-tile grid (~1.2-2.4 MB);
  activations per tile are a few hundred KB.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_simple_tpu.models.nerf import NerfMLP, Params

# Default architecture: the flagship NerfMLP(Lp=10, Ld=4, H=256). Every
# public entry point takes an optional ``model`` and derives its layout
# from (Lp, Ld, H) — e.g. for the flagship:
#   posx: rows 0..7 raw xyz (3) + pad, 8..39 sin (30) + pad, 40..71 cos
#   posd: rows 0..7 raw dir (3) + pad, 8..23 sin (12) + pad, 24..39 cos
FLAGSHIP = NerfMLP()


def supported(model) -> bool:
    """Can the fused kernels run this architecture? NerfMLP-family only
    (other families, e.g. HashGridModel, always take the XLA path), and
    needs sublane-aligned widths: H and H//2 multiples of 8 (so
    H % 16 == 0) and L >= 1. Appearance codes (model.app_dim) ride the
    x16 stream's rows 8..15, so at most 8 of them fit."""
    if not isinstance(model, NerfMLP):
        return False
    if not 0 <= model.app_dim <= 8:
        # wider appearance codes don't fit the (16, rows) input stream's
        # free rows; those models take the XLA path
        return False
    return model.H % 16 == 0 and model.H >= 16 and model.Lp >= 1 and model.Ld >= 1


def _ceil8(n: int) -> int:
    return -(-n // 8) * 8


def _sin_block(L: int) -> int:
    """Rows in the (8-aligned) sin block: 3 channels x L frequencies."""
    return _ceil8(3 * L)


def _enc_rows(L: int) -> int:
    """Padded encoded-feature rows: 8 raw + sin block + cos block."""
    return 8 + 2 * _sin_block(L)


def _fx(model: NerfMLP) -> int:
    return _enc_rows(model.Lp)


def _fd(model: NerfMLP) -> int:
    return _enc_rows(model.Ld)


def _perm(L: int) -> np.ndarray:
    """kernel-row -> reference encoded-feature index.

    Reference layout (utils/xyz.py:33, interleaved sin/cos per channel):
      0..2 raw; 3 + 2L*c + 2i = sin(2^i ch_c); 3 + 2L*c + 2i + 1 = cos.
    Kernel layout (8-aligned blocks): 0..2 raw (+pad to 8);
      8 + L*c + i = sin; 8 + sinblock + L*c + i = cos; rest pad.
    """
    sb = _sin_block(L)
    perm = np.zeros(_enc_rows(L), np.int64)
    perm[0:3] = [0, 1, 2]
    for c in range(3):
        for i in range(L):
            perm[8 + L * c + i] = 3 + 2 * L * c + 2 * i
            perm[8 + sb + L * c + i] = 3 + 2 * L * c + 2 * i + 1
    return perm


def _valid(L: int) -> np.ndarray:
    sb = _sin_block(L)
    v = np.zeros(_enc_rows(L), np.float32)
    v[0:3] = 1
    v[8 : 8 + 3 * L] = 1
    v[8 + sb : 8 + sb + 3 * L] = 1
    return v


def _spread(L: int, col0: int) -> np.ndarray:
    """S (_enc_rows(L), 8): ang = S @ x. Raw rows carry the coordinate
    itself; sin/cos rows carry 2^i * coord. ``col0`` selects the x rows
    holding the coordinates (0 for sample xyz, 3 for view dirs)."""
    sb = _sin_block(L)
    S = np.zeros((_enc_rows(L), 8), np.float32)
    for j in range(3):
        S[j, col0 + j] = 1.0
    for c in range(3):
        for i in range(L):
            S[8 + L * c + i, col0 + c] = 2.0**i
            S[8 + sb + L * c + i, col0 + c] = 2.0**i
    return S


def _perm_x(model: NerfMLP = FLAGSHIP) -> np.ndarray:
    return _perm(model.Lp)


def _valid_x(model: NerfMLP = FLAGSHIP) -> np.ndarray:
    return _valid(model.Lp)


def _perm_d(model: NerfMLP = FLAGSHIP) -> np.ndarray:
    return _perm(model.Ld)


def _valid_d(model: NerfMLP = FLAGSHIP) -> np.ndarray:
    return _valid(model.Ld)


def _spread_x(model: NerfMLP = FLAGSHIP) -> np.ndarray:
    return _spread(model.Lp, 0)


def _spread_d(model: NerfMLP = FLAGSHIP) -> np.ndarray:
    return _spread(model.Ld, 3)


def _spread_v(model: NerfMLP = FLAGSHIP) -> np.ndarray:
    """Sv (_enc_rows(Lp), 8) for the mip path: ``lam = Sv @ v8`` places
    ``4^i * var_c`` in each sin AND cos row of the posx layout (raw rows
    stay 0, so their damp factor exp(-lam/2) is exactly 1). ``v8`` is
    x16[8:16] with the per-sample diagonal variances on its rows 3..5
    (x16 rows 11..13 — rows 8..10 hold gt colors in the train kernel and
    are untouched by Sv)."""
    L = model.Lp
    sb = _sin_block(L)
    S = np.zeros((_enc_rows(L), 8), np.float32)
    for c in range(3):
        for i in range(L):
            S[8 + L * c + i, 3 + c] = 4.0**i
            S[8 + sb + L * c + i, 3 + c] = 4.0**i
    return S


class FusedWeights(NamedTuple):
    """Kernel-layout weights. All (out_features, in_features) f32; biases
    (out_features, 1)."""

    W1: jnp.ndarray  # (H, FX)   trunk0 (rows permuted, padded)
    b1: jnp.ndarray
    Wt1: jnp.ndarray  # (H, H) x4 trunk1..4
    bt1: jnp.ndarray
    Wt2: jnp.ndarray
    bt2: jnp.ndarray
    Wt3: jnp.ndarray
    bt3: jnp.ndarray
    Wt4: jnp.ndarray
    bt4: jnp.ndarray
    Wsh: jnp.ndarray  # (H, H)  skip, h half
    Wsx: jnp.ndarray  # (H, FX) skip, posx half (permuted, padded)
    bs: jnp.ndarray
    Wp0: jnp.ndarray  # (H, H)
    bp0: jnp.ndarray
    Wp1: jnp.ndarray  # (H, H)
    bp1: jnp.ndarray
    Wcs: jnp.ndarray  # (H//2 + 8, H): rows :H//2 = Wcf·Wfeature (the
    # folded no-activation feature layer), rows H//2: = sigma head
    # (1 real + 7 pad)
    bcs: jnp.ndarray  # (H//2 + 8, 1): [Wcf·b_feature + b_color0 ; b_sigma]
    Wcd: jnp.ndarray  # (H//2, FD)  color0, posd half (permuted, padded)
    Wc1: jnp.ndarray  # (8, H//2)   color1: rgb rows 0..2 + pad
    bc1: jnp.ndarray


class FusedWeightsApp(NamedTuple):
    """FusedWeights + the appearance rail: ``Wca`` (H//2, 8) is the
    color head's slice acting on per-ray appearance codes
    (models/nerf.py app_dim — reference has no analogue; NeRF-W-style
    extension). Codes ride the input stream's rows 8..15 (app_dim real
    + zero pad, so pad columns of Wca are dead). Field ORDER matters:
    Wca is appended last so refs[:N] unpacking in the kernels stays
    positional-compatible with FusedWeights."""

    W1: jnp.ndarray
    b1: jnp.ndarray
    Wt1: jnp.ndarray
    bt1: jnp.ndarray
    Wt2: jnp.ndarray
    bt2: jnp.ndarray
    Wt3: jnp.ndarray
    bt3: jnp.ndarray
    Wt4: jnp.ndarray
    bt4: jnp.ndarray
    Wsh: jnp.ndarray
    Wsx: jnp.ndarray
    bs: jnp.ndarray
    Wp0: jnp.ndarray
    bp0: jnp.ndarray
    Wp1: jnp.ndarray
    bp1: jnp.ndarray
    Wcs: jnp.ndarray
    bcs: jnp.ndarray
    Wcd: jnp.ndarray
    Wc1: jnp.ndarray
    bc1: jnp.ndarray
    Wca: jnp.ndarray  # (H//2, 8) appearance half of color0


def _wcls(model: NerfMLP):
    """Packed-weights class for this architecture (static per model)."""
    return FusedWeightsApp if model.app_dim > 0 else FusedWeights


def pack_weights(
    params: Params, dtype=jnp.float32, model: NerfMLP = FLAGSHIP
) -> FusedWeights:
    """Repack models/nerf.py params into kernel layout (transpose, permute
    encoding rows, pad to aligned feature counts, fold heads together)."""
    assert supported(model), (
        f"fused kernels need H % 16 == 0, H >= 16; got {model}"
    )
    H = model.H
    px, pd = _perm_x(model), _perm_d(model)
    vx, vd = _valid_x(model), _valid_d(model)

    def T(w):
        return jnp.asarray(w, dtype).T

    def bias(b, pad_to=None):
        b = jnp.asarray(b, dtype)
        if pad_to is not None and b.shape[0] < pad_to:
            b = jnp.pad(b, (0, pad_to - b.shape[0]))
        return b[:, None]

    def perm_pad(w, perm, valid):
        # w: (C, out) reference-order rows -> kernel-order (len(perm), out);
        # pad rows (perm maps them to row 0) are zeroed via the valid mask
        w = jnp.asarray(w, dtype)
        out = w[jnp.asarray(perm)] * jnp.asarray(valid, dtype)[:, None]
        return out.T  # (outF, fpad)

    w = params
    skip_w = jnp.asarray(w["skip"]["w"], dtype)  # (H+CX, H)
    color0_w = jnp.asarray(w["color0"]["w"], dtype)  # (H+CD[+A], H//2)
    CD = model.in_Cd  # raw-prepended dir-encoding width (rows H:H+CD)

    # Fold the no-activation feature layer into the color head (see the
    # module docstring): Wcf' = Wcf @ Wf, b' = Wcf @ bf + bc0, computed in
    # f32 here — exact algebra, one rounding of the product. Sigma rides
    # as 8 extra rows (1 real + 7 pad) so ONE (H//2+8, H) matmul replaces
    # the 264-row feature+sigma head and the (H//2, H) color contraction.
    Wcf = color0_w[:H].T  # (H//2, H), acts on feat
    Wf = jnp.asarray(w["feature"]["w"], dtype).T  # (H, H), acts on h7
    bf = jnp.asarray(w["feature"]["b"], dtype)
    Wcs = jnp.concatenate(
        [
            jnp.matmul(Wcf, Wf, preferred_element_type=jnp.float32),
            jnp.asarray(w["sigma"]["w"], dtype).T,  # (1, H)
            jnp.zeros((7, H), dtype),
        ],
        axis=0,
    )
    bcs = jnp.concatenate(
        [
            Wcf @ bf + jnp.asarray(w["color0"]["b"], dtype),
            jnp.asarray(w["sigma"]["b"], dtype),
            jnp.zeros((7,), dtype),
        ]
    )[:, None]

    Wc1 = jnp.concatenate(
        [jnp.asarray(w["color1"]["w"], dtype).T, jnp.zeros((5, H // 2), dtype)],
        axis=0,
    )
    bc1 = jnp.concatenate(
        [jnp.asarray(w["color1"]["b"], dtype), jnp.zeros((5,), dtype)]
    )[:, None]

    fields = dict(
        W1=perm_pad(w["trunk0"]["w"], px, vx),
        b1=bias(w["trunk0"]["b"]),
        Wt1=T(w["trunk1"]["w"]),
        bt1=bias(w["trunk1"]["b"]),
        Wt2=T(w["trunk2"]["w"]),
        bt2=bias(w["trunk2"]["b"]),
        Wt3=T(w["trunk3"]["w"]),
        bt3=bias(w["trunk3"]["b"]),
        Wt4=T(w["trunk4"]["w"]),
        bt4=bias(w["trunk4"]["b"]),
        Wsh=skip_w[:H].T,
        Wsx=perm_pad(skip_w[H:], px, vx),
        bs=bias(w["skip"]["b"]),
        Wp0=T(w["post0"]["w"]),
        bp0=bias(w["post0"]["b"]),
        Wp1=T(w["post1"]["w"]),
        bp1=bias(w["post1"]["b"]),
        Wcs=Wcs,
        bcs=bcs,
        Wcd=perm_pad(color0_w[H : H + CD], pd, vd),
        Wc1=Wc1,
        bc1=bc1,
    )
    if model.app_dim > 0:
        # appearance rail: the trailing app_dim rows of color0 act on
        # the per-ray codes riding x16 rows 8..15; pad columns are zero
        # (their code rows are zero too — doubly dead)
        fields["Wca"] = jnp.concatenate(
            [
                color0_w[H + CD :].T,
                jnp.zeros((H // 2, 8 - model.app_dim), dtype),
            ],
            axis=1,
        )
    return _wcls(model)(**fields)


def _cast_weights(wts: FusedWeights, dtype) -> FusedWeights:
    """Pre-cast the weight MATRICES to the compute dtype once, in XLA,
    before the kernel launches — the per-grid-step ``astype`` inside the
    kernel body then becomes a no-op (the grid re-executes the body
    hundreds of times per call; at the bench shape the repeated casts
    cost ~0.3 ms/iter of VPU time) and weight VMEM residency halves.
    Biases stay f32: they add into the f32 matmul accumulator."""
    if dtype == jnp.float32:
        return wts
    return type(wts)(
        *[w.astype(dtype) if w.shape[-1] > 1 else w for w in wts]
    )


def anneal_row_weights(model: NerfMLP, alpha) -> tuple:
    """BARF anneal weights in the kernel's encoded-row layout.

    Returns (wx (FX, 1), wd (FD, 1)) f32: raw rows (incl. the bias
    rail) carry 1; octave i's sin AND cos rows carry
    ops/encoding.py::anneal_weights(L, alpha)[i]; pad rows carry 1
    (their values are dead under zeroed weight columns). ``alpha`` is a
    traced scalar, so one compiled kernel serves the whole schedule."""
    from nerf_simple_tpu.ops.encoding import anneal_weights

    def rows(L):
        w = anneal_weights(L, alpha, jnp.float32)  # (L,)
        sb = _sin_block(L)
        blk = jnp.concatenate(
            [jnp.tile(w, 3), jnp.ones((sb - 3 * L,), jnp.float32)]
        )
        return jnp.concatenate([jnp.ones((8,), jnp.float32), blk, blk])[
            :, None
        ]

    return rows(model.Lp), rows(model.Ld)


def _mm(a, b, dtype):
    return jax.lax.dot_general(
        a.astype(dtype),
        b.astype(dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _encode(
    x, Sx, Sd, dtype, model: NerfMLP = FLAGSHIP, v8=None, Sv=None,
    wx=None, wd=None,
):
    """x: (8, TR) f32 -> posx (FX, TR), posd (FD, TR).

    ``wx``/``wd``: optional (FX, 1)/(FD, 1) per-row BARF anneal weights
    (anneal_row_weights) multiplied onto the encoded features — raw rows
    (incl. the bias rail) carry 1, octave k's sin AND cos rows carry
    w_k. Matches ops/encoding.py::gamma's alpha windowing exactly.

    Aligned raw/sin/cos row blocks: sin and cos each run on only their own
    block slice (pad rows evaluate to garbage under zeroed weight
    columns — harmless).

    Mip (integrated PE) when ``v8``/``Sv`` given: the sin/cos blocks are
    damped by ``exp(-0.5 * 4^i * var_c)`` — the closed-form expectation
    of the encoding over the sample's frustum Gaussian
    (ops/encoding.py::gamma_ipe). One extra (FX, 8) spread matmul + a
    VPU exp/multiply on the encoded lattice; raw rows (incl. the bias
    rail) are untouched (their Sv rows are zero -> damp 1).

    ``model.contract``: mip-NeRF 360 scene contraction applied to the
    position rows 0..2 before the spread matmul — elementwise VPU math
    on the (3, TR) block (ops/encoding.py::scene_contraction semantics;
    no gradient w.r.t. x is ever needed, so the backward recompute is
    automatically correct)."""
    if model.contract:
        xyz = x[0:3]
        n = jnp.sqrt(
            jnp.maximum(
                xyz[0:1] ** 2 + xyz[1:2] ** 2 + xyz[2:3] ** 2, 1e-20
            )
        )  # (1, TR)
        inside = n <= 1.0
        g = jnp.where(inside, 1.0, (2.0 - 1.0 / n) / n)
        if v8 is not None:
            # mip: linearized Gaussian contraction (mip-NeRF 360
            # eqn. 8-9; ops/encoding.py::contract_gaussian) — the
            # variance rows transform through the Jacobian diagonal
            c = jnp.where(inside, 0.0, (-2.0 / n**2 + 2.0 / n**3) / n)
            m2 = xyz**2  # (3, TR)
            v = v8[3:6]
            m2v = m2[0:1] * v[0:1] + m2[1:2] * v[1:2] + m2[2:3] * v[2:3]
            v_out = g**2 * v + 2.0 * g * c * m2 * v + c**2 * m2 * m2v
            v8 = jnp.concatenate([v8[0:3], v_out, v8[6:8]], axis=0)
        x = jnp.concatenate([xyz * g, x[3:]], axis=0)
    sbx, sbd = _sin_block(model.Lp), _sin_block(model.Ld)

    def raw_with_rail(ang8):
        # Bias-gradient rail: raw rows 3..7 are structural pad (zero under
        # zeroed weight columns — forward output is unaffected), so row 3
        # carries a constant 1. The backward dW matmuls against pos* then
        # emit the layer's BIAS gradient in pad column 3 for free on the
        # MXU (dW[:, 3] = Σ_rows g), replacing (H, TR) VPU row-sum
        # reductions; pack_weights' vjp drops pad columns via the valid
        # mask, so the rail never leaks into parameter gradients.
        rows = jax.lax.broadcasted_iota(jnp.int32, ang8.shape, 0)
        return jnp.where(rows == 3, 1.0, ang8)

    ang_x = _mm(Sx, x, jnp.float32)  # full precision angles
    sin_x = jnp.sin(ang_x[8 : 8 + sbx])
    cos_x = jnp.cos(ang_x[8 + sbx : 8 + 2 * sbx])
    if v8 is not None:
        lam = _mm(Sv, v8, jnp.float32)  # (FX, TR): 4^i * var_c rows
        damp = jnp.exp(-0.5 * lam)
        sin_x = sin_x * damp[8 : 8 + sbx]
        cos_x = cos_x * damp[8 + sbx : 8 + 2 * sbx]
    posx = jnp.concatenate(
        [raw_with_rail(ang_x[0:8]), sin_x, cos_x],
        axis=0,
    )
    ang_d = _mm(Sd, x, jnp.float32)
    posd = jnp.concatenate(
        [
            raw_with_rail(ang_d[0:8]),
            jnp.sin(ang_d[8 : 8 + sbd]),
            jnp.cos(ang_d[8 + sbd : 8 + 2 * sbd]),
        ],
        axis=0,
    )
    if wx is not None:
        posx = posx * wx
        posd = posd * wd
    return posx.astype(dtype), posd.astype(dtype)


def _forward_tile(
    x, wts: FusedWeights, Sx, Sd, dtype, model: NerfMLP = FLAGSHIP,
    v8=None, Sv=None, wx=None, wd=None, pre_enc=None, prefetch=None,
    app8=None,
):
    """Shared fwd math: x (8, TR) -> (out (8, TR), residuals for bwd).
    ``v8``/``Sv`` switch the encoder to integrated PE (mip); ``wx``/``wd``
    window it for BARF annealing — everything downstream (trunk, heads,
    backward) is unchanged: the damped/windowed posx lands in the
    residuals, so the existing dW matmuls are automatically the correct
    gradients (x itself is never differentiated by them).

    Software-pipelining hooks (the sub-block pipeline in _train_kernel):
    ``pre_enc`` supplies (posx, posd) computed earlier so the encoder is
    skipped here (the encoder args Sx/Sd/v8/Sv are then unused — pass
    None); ``prefetch`` is a thunk EMITTED RIGHT AFTER the first
    trunk matmul — its VPU work (the NEXT sub-block's sin/cos burst)
    issues while this block's MXU chain drains, hiding the encoding
    transcendentals that otherwise run exposed at tile start (the one
    serial VPU cost the r3 trace identified). Always returns the
    3-tuple ``(out, residuals, prefetch_result)`` — ``prefetch_result``
    is None when no thunk was given."""
    H = model.H
    if pre_enc is not None:
        posx, posd = pre_enc
    else:
        posx, posd = _encode(x, Sx, Sd, dtype, model, v8, Sv, wx, wd)
    relu = lambda v: jnp.maximum(v, 0.0)

    h0 = relu(_mm(wts.W1, posx, dtype) + wts.b1)
    pf = prefetch() if prefetch is not None else None
    h1 = relu(_mm(wts.Wt1, h0, dtype) + wts.bt1)
    h2 = relu(_mm(wts.Wt2, h1, dtype) + wts.bt2)
    h3 = relu(_mm(wts.Wt3, h2, dtype) + wts.bt3)
    h4 = relu(_mm(wts.Wt4, h3, dtype) + wts.bt4)
    h5 = relu(_mm(wts.Wsh, h4, dtype) + _mm(wts.Wsx, posx, dtype) + wts.bs)
    h6 = relu(_mm(wts.Wp0, h5, dtype) + wts.bp0)
    h7 = relu(_mm(wts.Wp1, h6, dtype) + wts.bp1)
    # folded color+sigma head: rows :H//2 pre-activation color (the
    # feature layer is folded into Wcs — see module docstring), rows
    # H//2: raw sigma (no activation)
    cs = _mm(wts.Wcs, h7, dtype) + wts.bcs  # (H//2 + 8, TR)
    sig8 = cs[H // 2 :, :]  # (8, TR), sigma at row 0
    hc_pre = cs[: H // 2, :] + _mm(wts.Wcd, posd, dtype)
    if app8 is not None:
        # appearance rail (FusedWeightsApp.Wca): per-ray codes enter
        # ONLY the color head, like the XLA path's posd-append
        # (models/nerf.py::nerf_apply)
        hc_pre = hc_pre + _mm(wts.Wca, app8, dtype)
    hc = relu(hc_pre)
    rgb8 = _mm(wts.Wc1, hc, dtype) + wts.bc1  # (8, TR), rgb rows 0..2

    rows = jax.lax.broadcasted_iota(jnp.int32, rgb8.shape, 0)
    out = jnp.where(rows < 3, rgb8, 0.0) + jnp.where(
        rows == 3, pltpu.roll(sig8, 3, axis=0), 0.0
    )
    # Residuals stored in the compute dtype: the backward kernel only uses
    # them as (re-cast-anyway) matmul operands and relu masks, and bf16
    # storage halves backward VMEM — letting larger tiles fit.
    residuals = tuple(
        r.astype(dtype)
        for r in (posx, posd, h0, h1, h2, h3, h4, h5, h6, h7, hc)
    )
    return out, residuals, pf


_N_W = len(FusedWeights._fields)


def _fwd_kernel(dtype, model, mip, anneal, x_ref, *refs):
    # refs: n_w weight refs, Sx, Sd[, Sv][, wx, wd], out_ref
    wcls = _wcls(model)
    n_w = len(wcls._fields)
    wts = wcls(*[r[:] for r in refs[:n_w]])
    i = n_w
    Sx, Sd = refs[i][:], refs[i + 1][:]
    i += 2
    Sv = None
    if mip:
        Sv = refs[i][:]
        i += 1
    wx = wd = None
    if anneal:
        wx, wd = refs[i][:], refs[i + 1][:]
        i += 2
    out_ref = refs[i]
    if mip:
        x16 = x_ref[:]
        out, _, _ = _forward_tile(
            x16[:8], wts, Sx, Sd, dtype, model, v8=x16[8:16], Sv=Sv,
            wx=wx, wd=wd,
        )
    elif model.app_dim > 0:
        # appearance codes ride input rows 8..15 (broadcast per sample)
        x16 = x_ref[:]
        out, _, _ = _forward_tile(
            x16[:8], wts, Sx, Sd, dtype, model, wx=wx, wd=wd,
            app8=x16[8:16],
        )
    else:
        out, _, _ = _forward_tile(
            x_ref[:], wts, Sx, Sd, dtype, model, wx=wx, wd=wd
        )
    out_ref[:] = out


@functools.partial(
    jax.jit, static_argnames=("tile_rows", "compute_dtype", "model", "mip")
)
def fused_mlp_forward(
    wts: FusedWeights,
    xT: jnp.ndarray,
    tile_rows: int = 1024,
    compute_dtype: Any = jnp.bfloat16,
    model: NerfMLP = FLAGSHIP,
    mip: bool = False,
    enc_w=None,
) -> jnp.ndarray:
    """Run the fused MLP forward.

    Args:
      wts: pack_weights output.
      xT: (8, rows) f32 — rows 0..2 sample xyz, rows 3..5 unit view dir,
        rows 6..7 zero. ``rows`` must be a multiple of tile_rows.
        With ``mip=True``: (16, rows) — rows 0..2 frustum Gaussian means,
        3..5 unit view dirs, 11..13 diagonal variances, rest zero (the
        encoder becomes integrated PE; models/nerf.py::nerf_apply_mip).
        With ``model.app_dim > 0`` (exclusive with mip): (16, rows) —
        rows 8..7+app_dim carry the per-ray appearance codes broadcast
        per sample, remaining rows zero.
      enc_w: optional (wx, wd) BARF anneal row weights
        (anneal_row_weights) — traced, so one compiled program serves
        the whole anneal schedule.

    Returns:
      (8, rows) f32 — rows 0..2 raw rgb, row 3 raw sigma.
    """
    rows = xT.shape[1]
    assert not (mip and model.app_dim > 0), (
        "appearance codes and the IPE encoder both need the 16-row "
        "stream's upper rows; render_rays rejects the combination"
    )
    in_rows = 16 if (mip or model.app_dim > 0) else 8
    assert rows % tile_rows == 0, (rows, tile_rows)
    assert xT.shape[0] == in_rows, (xT.shape, mip, model.app_dim)
    grid = (rows // tile_rows,)
    wts = _cast_weights(wts, compute_dtype)

    extras = [jnp.asarray(_spread_x(model)), jnp.asarray(_spread_d(model))]
    if mip:
        extras.append(jnp.asarray(_spread_v(model)))
    anneal = enc_w is not None
    if anneal:
        extras.extend(enc_w)

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    in_specs = (
        [
            pl.BlockSpec(
                (in_rows, tile_rows), lambda i: (0, i),
                memory_space=pltpu.VMEM,
            )
        ]
        + [full(w) for w in wts]
        + [full(e) for e in extras]
    )
    out_spec = pl.BlockSpec(
        (8, tile_rows), lambda i: (0, i), memory_space=pltpu.VMEM
    )

    return pl.pallas_call(
        functools.partial(_fwd_kernel, compute_dtype, model, mip, anneal),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((8, rows), jnp.float32),
    )(xT, *wts, *extras)


# ---------------------------------------------------------------------------
# Training path: custom VJP with a fused backward kernel (recompute-in-VMEM).
# ---------------------------------------------------------------------------


def _relu_mask(h):
    """relu derivative as f32 (Mosaic lacks bf16 compare on v5e)."""
    return (h.astype(jnp.float32) > 0).astype(jnp.float32)


def _bwd_kernel(dtype, model, mip, anneal, want_dx, x_ref, g_ref, *refs):
    """Per tile: recompute fwd activations in VMEM, backprop, accumulate
    weight/bias grads across the grid into the outputs (same block every
    step — revisited-block accumulation). With ``want_dx`` the LAST
    output ref is the per-tile input gradient dL/dx (tiled, not
    accumulated) — see _input_grad_tile; for appearance models it is
    (16, TR) with rows 8..15 the per-sample code gradient."""
    wcls = _wcls(model)
    n_w = len(wcls._fields)
    wts = wcls(*[r[:] for r in refs[:n_w]])
    i = n_w
    Sx, Sd = refs[i][:], refs[i + 1][:]
    i += 2
    Sv = None
    if mip:
        Sv = refs[i][:]
        i += 1
    wx = wd = None
    if anneal:
        wx, wd = refs[i][:], refs[i + 1][:]
        i += 2
    grad_refs = refs[i:]
    dx_ref = None
    if want_dx:
        grad_refs, dx_ref = grad_refs[:-1], grad_refs[-1]
    assert len(grad_refs) == n_w

    x = x_ref[:]
    app8 = x[8:16] if model.app_dim > 0 else None
    if mip:
        _, res, _ = _forward_tile(
            x[:8], wts, Sx, Sd, dtype, model, v8=x[8:16], Sv=Sv,
            wx=wx, wd=wd,
        )
    else:
        _, res, _ = _forward_tile(
            x[:8], wts, Sx, Sd, dtype, model, wx=wx, wd=wd, app8=app8
        )

    g = g_ref[:]  # (8, TR) f32: rows 0..2 d_rgb, row 3 d_sigma
    rows_i = jax.lax.broadcasted_iota(jnp.int32, g.shape, 0)
    g_rgb8 = jnp.where(rows_i < 3, g, 0.0)  # feeds Wc1 backprop
    # sigma grad back at fs row H: build (8, TR) with row 0 = d_sigma
    g_sig8 = jnp.where(rows_i == 0, pltpu.roll(g, 5, axis=0), 0.0)

    if want_dx:
        grads, (g_posx, g_posd, g_app) = _backprop_tile(
            wts, res, g_rgb8, g_sig8, dtype, model, want_pos_grads=True,
            app8=app8,
        )
        if mip:
            dx = _input_grad_tile_mip(
                x[:8], x[8:16], g_posx, g_posd, Sx, Sd, Sv, model,
                wx=wx, wd=wd,
            )
        else:
            dx = _input_grad_tile(
                x[:8], g_posx, g_posd, Sx, Sd, model, wx=wx, wd=wd
            )
            if g_app is not None:
                dx = jnp.concatenate([dx, g_app], axis=0)
        dx_ref[:] = dx
    else:
        grads = _backprop_tile(
            wts, res, g_rgb8, g_sig8, dtype, model, app8=app8
        )
    _accumulate_grads(grad_refs, grads)


def _backprop_tile(
    wts, res, g_rgb8, g_sig8, dtype, model: NerfMLP = FLAGSHIP,
    want_pos_grads: bool = False, app8=None,
):
    """Backprop through the MLP given per-sample output cotangents
    (g_rgb8 rows 0..2, g_sig8 row 0) and saved activations ``res``.
    Returns this tile's weight-gradient contribution; with
    ``want_pos_grads`` additionally the encoded-INPUT cotangents
    ``(g_posx, g_posd, g_app)`` — extra skinny mTg matmuls — for input
    gradients (dL/dx, the pose-refinement path; _input_grad_tile) and
    the per-sample appearance-code gradient (``g_app`` (8, TR), or
    None when the model carries no appearance rail). ``app8`` is the
    forward's appearance input block, required iff wts is
    FusedWeightsApp."""
    H = model.H
    posx, posd, h0, h1, h2, h3, h4, h5, h6, h7, hc = res

    def mmT_acc(gout, act):  # dW = gout @ act^T   (contract over rows)
        return jax.lax.dot_general(
            gout.astype(dtype),
            act.astype(dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def mTg(w, gout):  # dact = w^T @ gout
        return jax.lax.dot_general(
            w.astype(dtype),
            gout.astype(dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def dbias(gout):
        return jnp.sum(gout, axis=1, keepdims=True)

    def rail(dW):
        """Extract bias-rail column 3 of a pos* dW (see _encode) as an
        offset-0 (rows, 1) vector. A masked lane-reduce rather than a
        [:, 3:4] slice: Mosaic propagates the slice's lane offset into
        the result layout and then cannot concatenate/store it against
        offset-0 vectors ("result/input offset mismatch"). The reduce is
        over FX~68 lanes vs the (rows, TR) row-sum it replaces."""
        lanes = jax.lax.broadcasted_iota(jnp.int32, dW.shape, 1)
        return jnp.sum(
            jnp.where(lanes == 3, dW, 0.0), axis=1, keepdims=True
        )

    # color1
    dWc1 = mmT_acc(g_rgb8, hc)
    dbc1 = dbias(g_rgb8)
    g_hc = mTg(wts.Wc1, g_rgb8) * _relu_mask(hc)
    # posd half of the color head; its pad column 3 is the bias rail
    # (see _encode): dWcd[:, 3] = Σ g_hc = the color half of dbcs
    dWcd = mmT_acc(g_hc, posd)
    # folded color+sigma head: one gradient pass over the stacked rows
    g_cs = jnp.concatenate([g_hc, g_sig8], axis=0)  # (H//2 + 8, TR)
    dWcs = mmT_acc(g_cs, h7)
    dbcs = jnp.concatenate([rail(dWcd), dbias(g_sig8)], axis=0)
    g_h7 = mTg(wts.Wcs, g_cs) * _relu_mask(h7)
    # post layers
    dWp1 = mmT_acc(g_h7, h6)
    dbp1 = dbias(g_h7)
    g_h6 = mTg(wts.Wp1, g_h7) * _relu_mask(h6)
    dWp0 = mmT_acc(g_h6, h5)
    dbp0 = dbias(g_h6)
    g_h5 = mTg(wts.Wp0, g_h6) * _relu_mask(h5)
    # skip layer; dWsx pad column 3 = Σ g_h5 via the bias rail
    dWsh = mmT_acc(g_h5, h4)
    dWsx = mmT_acc(g_h5, posx)
    dbs = rail(dWsx)
    g_h4 = mTg(wts.Wsh, g_h5) * _relu_mask(h4)
    # trunk
    dWt4 = mmT_acc(g_h4, h3)
    dbt4 = dbias(g_h4)
    g_h3 = mTg(wts.Wt4, g_h4) * _relu_mask(h3)
    dWt3 = mmT_acc(g_h3, h2)
    dbt3 = dbias(g_h3)
    g_h2 = mTg(wts.Wt3, g_h3) * _relu_mask(h2)
    dWt2 = mmT_acc(g_h2, h1)
    dbt2 = dbias(g_h2)
    g_h1 = mTg(wts.Wt2, g_h2) * _relu_mask(h1)
    dWt1 = mmT_acc(g_h1, h0)
    dbt1 = dbias(g_h1)
    g_h0 = mTg(wts.Wt1, g_h1) * _relu_mask(h0)
    dW1 = mmT_acc(g_h0, posx)
    db1 = rail(dW1)

    fields = dict(
        W1=dW1, b1=db1,
        Wt1=dWt1, bt1=dbt1, Wt2=dWt2, bt2=dbt2,
        Wt3=dWt3, bt3=dbt3, Wt4=dWt4, bt4=dbt4,
        Wsh=dWsh, Wsx=dWsx, bs=dbs,
        Wp0=dWp0, bp0=dbp0, Wp1=dWp1, bp1=dbp1,
        Wcs=dWcs, bcs=dbcs, Wcd=dWcd,
        Wc1=dWc1, bc1=dbc1,
    )
    has_app = isinstance(wts, FusedWeightsApp)
    if has_app:
        assert app8 is not None, "FusedWeightsApp backward needs app8"
        fields["Wca"] = mmT_acc(g_hc, app8)
    grads = type(wts)(**fields)
    if not want_pos_grads:
        # rays/ts carry no trainable state: dL/dx is dead code
        return grads
    # posx feeds layer 1 AND the skip layer; posd feeds the color head.
    # Zeroed weight columns at pad rows make the pad-row cotangents
    # exactly zero, so no validity masking is needed here.
    g_posx = mTg(wts.W1, g_h0) + mTg(wts.Wsx, g_h5)
    g_posd = mTg(wts.Wcd, g_hc)
    g_app = mTg(wts.Wca, g_hc) if has_app else None
    return grads, (g_posx, g_posd, g_app)


def _input_grad_tile(
    x, g_posx, g_posd, Sx, Sd, model: NerfMLP = FLAGSHIP, wx=None, wd=None,
):
    """Encoder-transpose: encoded-feature cotangents -> dL/dx (8, TR).

    ``wx``/``wd``: the forward's BARF anneal row weights, if any — the
    window is elementwise on the encoded features, so its transpose is
    the same multiply on the cotangents before the encoder transpose.

    Forward was ``pos* = f(S @ xc)`` with f = identity on the raw rows
    (row 3 is the constant bias rail -> zero grad), sin/cos on their
    blocks — so ``dang = g_pos * f'(ang)`` elementwise and
    ``dxc = Sx^T dang_x + Sd^T dang_d`` (two skinny MXU matmuls; the
    spread matrices route position rows to x rows 0..2 and dir rows to
    3..5 automatically). With ``model.contract`` the mip-NeRF 360
    contraction Jacobian chains on top: y = g(n)x with n=|x| gives
    dL/dx = g*dy + (g'(n)/n)(x . dy)x, and g'(n)/n is the same ``c``
    the forward's Gaussian-variance transform uses. Angle math in f32
    like _encode (bf16 angles would corrupt high-octave derivatives).

    Used by the pose-refinement train path: dL/dx flows out of the
    kernel into XLA's autodiff of ray generation (apply_cam_deltas).
    The IPE (mip) analogue, with d/d(variance) rows and the coupled
    contraction Jacobian, is _input_grad_tile_mip."""
    if wx is not None:
        g_posx = g_posx * wx
        g_posd = g_posd * wd
    if model.contract:
        xyz = x[0:3]
        n = jnp.sqrt(
            jnp.maximum(xyz[0:1] ** 2 + xyz[1:2] ** 2 + xyz[2:3] ** 2, 1e-20)
        )
        inside = n <= 1.0
        g = jnp.where(inside, 1.0, (2.0 - 1.0 / n) / n)
        c = jnp.where(inside, 0.0, (-2.0 / n**2 + 2.0 / n**3) / n)
        xc = jnp.concatenate([xyz * g, x[3:]], axis=0)
    else:
        xc = x

    def dang(S, gp, L):
        sb = _sin_block(L)
        ang = _mm(S, xc, jnp.float32)
        gp = gp.astype(jnp.float32)
        rows = jax.lax.broadcasted_iota(jnp.int32, (8,) + gp.shape[1:], 0)
        return jnp.concatenate(
            [
                jnp.where(rows == 3, 0.0, gp[0:8]),  # rail row: constant
                gp[8 : 8 + sb] * jnp.cos(ang[8 : 8 + sb]),
                -gp[8 + sb :] * jnp.sin(ang[8 + sb :]),
            ],
            axis=0,
        )

    def sT(S, d):  # S^T @ d: contract the encoded-row axis
        return jax.lax.dot_general(
            S, d, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dxc = sT(Sx, dang(Sx, g_posx, model.Lp)) + sT(
        Sd, dang(Sd, g_posd, model.Ld)
    )
    if model.contract:
        dy = dxc[0:3]
        dot = xyz[0:1] * dy[0:1] + xyz[1:2] * dy[1:2] + xyz[2:3] * dy[2:3]
        dxyz = g * dy + c * dot * xyz
        dxc = jnp.concatenate([dxyz, dxc[3:]], axis=0)
    return dxc


def _input_grad_tile_mip(
    x, v8, g_posx, g_posd, Sx, Sd, Sv,
    model: NerfMLP = FLAGSHIP, wx=None, wd=None,
):
    """IPE-encoder transpose: encoded-feature cotangents -> dL/d(x16)
    (16, TR) — rows 0..2 d/d(frustum Gaussian MEAN), 3..5 d/d(unit
    dir), 11..13 d/d(diagonal VARIANCE), rest zero.

    Forward (_encode mip branch) was ``posx = f(Sx @ xc) * damp`` with
    ``damp = exp(-0.5 * Sv @ v8c)`` on the sin/cos blocks, so the
    transpose splits per chain:
      dang = g_pos * f'(ang) * damp            (angle chain, damped)
      dlam = -0.5 * (g_pos ⊙ pos)              (damp chain: g*f(ang)*
                                                damp*(-1/2) per row)
      dxc  = Sx^T dang_x + Sd^T dang_d ;  dv8c = Sv^T dlam
    With ``model.contract`` the mip-NeRF 360 LINEARIZED-GAUSSIAN warp
    Jacobian chains on top — and unlike the point case it couples mean
    and variance: y = g(n)x and v_out = g^2 v + 2gc m2 v + c^2 m2 (m2.v)
    with n=|x|, m2=x^2 both functions of the mean, so d/d(mean) gains
    the variance-transform-through-mean terms (closed form below;
    g' = c*n, c' = 6/n^4 - 8/n^5 outside the unit ball, both 0 inside).
    Angle math in f32 like _encode.

    Used by the anti-aliased pose-refinement path (pose_opt + mip):
    dL/d(mean, dir, var) flows out of the kernel into XLA's autodiff of
    frustum_gaussians_T and apply_cam_deltas."""
    if wx is not None:
        g_posx = g_posx * wx
        g_posd = g_posd * wd
    xyz = x[0:3]
    v_in = v8[3:6]  # diagonal variances (x16 rows 11..13)
    if model.contract:
        n = jnp.sqrt(
            jnp.maximum(xyz[0:1] ** 2 + xyz[1:2] ** 2 + xyz[2:3] ** 2, 1e-20)
        )
        inside = n <= 1.0
        g = jnp.where(inside, 1.0, (2.0 - 1.0 / n) / n)
        c = jnp.where(inside, 0.0, (-2.0 / n**2 + 2.0 / n**3) / n)
        m2 = xyz**2
        m2v = m2[0:1] * v_in[0:1] + m2[1:2] * v_in[1:2] + m2[2:3] * v_in[2:3]
        vc = g**2 * v_in + 2.0 * g * c * m2 * v_in + c**2 * m2 * m2v
        xc = jnp.concatenate([xyz * g, x[3:]], axis=0)
    else:
        vc = v_in
        xc = x
    v8c = jnp.concatenate([v8[0:3], vc, v8[6:8]], axis=0)

    sbx = _sin_block(model.Lp)
    ang = _mm(Sx, xc, jnp.float32)
    lam = _mm(Sv, v8c, jnp.float32)
    damp = jnp.exp(-0.5 * lam)
    gp = g_posx.astype(jnp.float32)
    sin_d = jnp.sin(ang[8 : 8 + sbx]) * damp[8 : 8 + sbx]
    cos_d = jnp.cos(ang[8 + sbx :]) * damp[8 + sbx :]
    rows = jax.lax.broadcasted_iota(jnp.int32, (8,) + gp.shape[1:], 0)
    dang_x = jnp.concatenate(
        [
            jnp.where(rows == 3, 0.0, gp[0:8]),  # rail row: constant
            gp[8 : 8 + sbx] * jnp.cos(ang[8 : 8 + sbx]) * damp[8 : 8 + sbx],
            -gp[8 + sbx :] * jnp.sin(ang[8 + sbx :]) * damp[8 + sbx :],
        ],
        axis=0,
    )
    # damp chain: d(loss)/d(lam_row) = g_row * f(ang)_row * damp * (-1/2)
    dlam = jnp.concatenate(
        [
            jnp.zeros_like(gp[0:8]),
            -0.5 * gp[8 : 8 + sbx] * sin_d,
            -0.5 * gp[8 + sbx :] * cos_d,
        ],
        axis=0,
    )

    def sT(S, d):  # S^T @ d: contract the encoded-row axis
        return jax.lax.dot_general(
            S, d, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    sbd = _sin_block(model.Ld)
    ang_d = _mm(Sd, xc, jnp.float32)
    gpd = g_posd.astype(jnp.float32)
    dang_d = jnp.concatenate(
        [
            jnp.where(rows == 3, 0.0, gpd[0:8]),
            gpd[8 : 8 + sbd] * jnp.cos(ang_d[8 : 8 + sbd]),
            -gpd[8 + sbd :] * jnp.sin(ang_d[8 + sbd :]),
        ],
        axis=0,
    )
    dxc = sT(Sx, dang_x) + sT(Sd, dang_d)  # (8, TR)
    dvc8 = sT(Sv, dlam)  # (8, TR): rows 3..5 = d/d(contracted var)
    dvo = dvc8[3:6]
    if model.contract:
        dy = dxc[0:3]
        dot = xyz[0:1] * dy[0:1] + xyz[1:2] * dy[1:2] + xyz[2:3] * dy[2:3]
        # d/d(pre-contraction variance): vout_j is diagonal in v plus
        # the rank-one c^2 m2 (m2 . v) coupling
        Cv = m2[0:1] * dvo[0:1] + m2[1:2] * dvo[1:2] + m2[2:3] * dvo[2:3]
        dv = (g**2 + 2.0 * g * c * m2) * dvo + c**2 * m2 * Cv
        # d/d(mean): mean path + the variance transform's n- and
        # m2-dependence (A = dvo.v, Bv = dvo.(m2 v))
        gp_n = c * n  # g'(n)
        cp_n = jnp.where(inside, 0.0, 6.0 / n**4 - 8.0 / n**5)
        A = dvo[0:1] * v_in[0:1] + dvo[1:2] * v_in[1:2] + dvo[2:3] * v_in[2:3]
        Bv = (
            dvo[0:1] * m2[0:1] * v_in[0:1]
            + dvo[1:2] * m2[1:2] * v_in[1:2]
            + dvo[2:3] * m2[2:3] * v_in[2:3]
        )
        term_n = (
            2.0 * g * gp_n * A
            + 2.0 * (gp_n * c + g * cp_n) * Bv
            + 2.0 * c * cp_n * m2v * Cv
        ) / n
        dxyz = (
            g * dy
            + c * dot * xyz
            + term_n * xyz
            + (4.0 * g * c * v_in + 2.0 * c**2 * m2v) * xyz * dvo
            + 2.0 * c**2 * v_in * xyz * Cv
        )
        dmean = dxyz
    else:
        dv = dvo
        dmean = dxc[0:3]
    zero1 = jnp.zeros_like(dmean[0:1])
    return jnp.concatenate(
        [
            dmean,          # rows 0..2: d/d(mean)
            dxc[3:6],       # rows 3..5: d/d(unit dir)
            zero1, zero1,   # rows 6..7: widths/near edges — no MLP path
            jnp.zeros_like(dmean),  # rows 8..10 (gt / unused v8 rows)
            dv,             # rows 11..13: d/d(variance)
            zero1, zero1,   # rows 14..15
        ],
        axis=0,
    )


def _accumulate_grads(grad_refs, grads) -> None:
    """Revisited-block accumulation: init on grid step 0, add after."""
    is_first = pl.program_id(0) == 0
    for gref, gval in zip(grad_refs, grads):
        @pl.when(is_first)
        def _(gref=gref, gval=gval):
            gref[:] = gval

        @pl.when(jnp.logical_not(is_first))
        def _(gref=gref, gval=gval):
            gref[:] = gref[:] + gval


@functools.partial(
    jax.jit,
    static_argnames=("tile_rows", "compute_dtype", "model", "mip", "want_dx"),
)
def _fused_mlp_bwd(
    wts: FusedWeights,
    xT: jnp.ndarray,
    gT: jnp.ndarray,
    tile_rows: int = 512,
    compute_dtype: Any = jnp.bfloat16,
    model: NerfMLP = FLAGSHIP,
    mip: bool = False,
    want_dx: bool = False,
    enc_w=None,
):
    rows = xT.shape[1]
    in_rows = 16 if (mip or model.app_dim > 0) else 8
    assert rows % tile_rows == 0
    grid = (rows // tile_rows,)
    wts = _cast_weights(wts, compute_dtype)

    extras = [jnp.asarray(_spread_x(model)), jnp.asarray(_spread_d(model))]
    if mip:
        extras.append(jnp.asarray(_spread_v(model)))
    anneal = enc_w is not None
    if anneal:
        extras.extend(enc_w)

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    def tile(nr):
        return pl.BlockSpec(
            (nr, tile_rows), lambda i: (0, i), memory_space=pltpu.VMEM
        )

    in_specs = (
        [tile(in_rows), tile(8)]
        + [full(w) for w in wts]
        + [full(e) for e in extras]
    )
    out_specs = tuple(full(w) for w in wts)
    out_shape = tuple(
        jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wts
    )
    if want_dx:
        # appearance models: the input-grad output carries the code
        # gradients on rows 8..15, so it spans the full 16-row stream
        out_specs = out_specs + (tile(in_rows),)
        out_shape = out_shape + (
            jax.ShapeDtypeStruct((in_rows, rows), jnp.float32),
        )

    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel, compute_dtype, model, mip, anneal, want_dx
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
    )(xT, gT, *wts, *extras)
    if want_dx:
        return type(wts)(*outs[:-1]), outs[-1]
    return type(wts)(*outs)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6)
)
def fused_mlp(
    wts: FusedWeights,
    xT: jnp.ndarray,
    tile_rows: int = 1024,
    compute_dtype: Any = jnp.bfloat16,
    model: NerfMLP = FLAGSHIP,
    mip: bool = False,
    want_dx: bool = False,
    enc_w=None,
) -> jnp.ndarray:
    """Differentiable fused MLP. Gradients w.r.t. weights always; with
    ``want_dx`` the VJP also emits dL/dxT from the backward kernel
    (_input_grad_tile) so upstream ray math can be differentiated — the
    pose-refinement (TrainConfig.pose_opt) train path. Default off: the
    extra encoder-transpose matmuls and the (8, rows) HBM write are dead
    weight when ray geometry carries no trainable state.

    ``enc_w``: optional (wx, wd) BARF anneal row weights
    (anneal_row_weights) applied inside the kernel's encoder — traced,
    schedule-friendly, treated as a constant by the VJP (the anneal
    progress is a schedule, not a trainable)."""
    return fused_mlp_forward(
        wts, xT, tile_rows, compute_dtype, model, mip, enc_w
    )


def _fused_mlp_fwd(
    wts, xT, tile_rows, compute_dtype, model=FLAGSHIP, mip=False,
    want_dx=False, enc_w=None,
):
    out = fused_mlp_forward(
        wts, xT, tile_rows, compute_dtype, model, mip, enc_w
    )
    return out, (wts, xT, enc_w)


def _fused_mlp_bwd_rule(
    tile_rows, compute_dtype, model, mip, want_dx, res, g
):
    wts, xT, enc_w = res
    d_enc_w = (
        None if enc_w is None else jax.tree.map(jnp.zeros_like, enc_w)
    )
    bwd_tile = min(tile_rows, 1024)  # bf16 residuals fit 1024-wide tiles
    if want_dx:
        dw, dx = _fused_mlp_bwd(
            wts, xT, g, bwd_tile, compute_dtype, model, mip, want_dx=True,
            enc_w=enc_w,
        )
        return dw, dx.astype(xT.dtype), d_enc_w
    dw = _fused_mlp_bwd(
        wts, xT, g, bwd_tile, compute_dtype, model, mip, enc_w=enc_w
    )
    return dw, jnp.zeros_like(xT), d_enc_w


fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd_rule)


# ---------------------------------------------------------------------------
# Fully-fused training kernel: fwd + compositing + MSE grad + bwd in ONE
# kernel — activations stay in VMEM between forward and backward, deleting
# the backward pass's forward recompute (~25% of training FLOPs).
# ---------------------------------------------------------------------------
#
# Tile structure: tile_rows = R rays x N samples, samples contiguous on the
# lane axis (N lanes per ray segment). Compositing is done with segmented
# lane operations:
#   - segmented inclusive cumsum: Hillis-Steele shifts masked at segment
#     boundaries (log2(N) steps of pltpu.roll);
#   - per-ray reductions / broadcasts: contractions with a constant 0/1
#     segment matrix ST (R, tile) on the MXU.
#
# The loss is the reference's raw-color MSE (train.py:52): per-ray
# sum_c (rgb_c - gt_c)^2 / (3B), accumulated across the grid into a
# dedicated output block. Gradients w.r.t. ts/rays are not materialized
# (no trainable state there).


def _seg_cumsum(x, segpos, N):
    """Inclusive cumsum along lanes within length-N segments. x: (1, T)."""
    s = 1
    while s < N:
        shifted = pltpu.roll(x, s, axis=1)
        x = x + jnp.where(segpos >= s, shifted, 0.0)
        s *= 2
    return x


def _composite_grad_block(
    out8, x16b, N, ST, scale, mip, dist=None, opaque_tail=False
):
    """Compositing forward + MSE loss + loss gradient back to per-sample
    rgb/sigma, on one lane block (ops/volume.py math, segmented on lanes).

    out8: (8, T) MLP outputs; x16b: (16, T) the matching input slice;
    ST: (T//N, T) 0/1 segment matrix. Returns (loss, g_rgb8, g_sig8, w8)
    — w8 is the per-sample compositing weights broadcast row (row 0),
    consumed by the hierarchical path's importance sampler.

    ``dist``: ``(dist_scale, tn, tf, disparity)`` enables the IN-KERNEL
    distortion regularizer (mip-NeRF 360 eqn. 15): positions are
    s-normalized (train/step.py::_s_norm semantics — affine for linear
    spacing, 1/t-affine for disparity) and the loss gradient enters the
    sigma backprop through the same generic d_w -> d_alpha conversion
    as the MSE term. Point form (non-mip; ops/volume.py::
    distortion_loss): positions are the sample ts, the last sample is
    excluded (its 1e10 tail delta is artificial). Interval form (mip;
    ops/volume.py::distortion_loss_intervals): positions are s-space
    interval midpoints from rows 7 (t0) and 6 (width), the self term
    uses true s-space widths, no tail drop. Either way: two extra
    segmented cumsums + one (2-row) segment-total matmul pair — O(N)
    on lanes, no new HBM traffic."""
    tile = out8.shape[1]
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (8, tile), 0)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
    segpos = lane1 % N

    sig = out8[3:4, :]
    if mip:
        # interval compositing (ops/volume.py::composite_intervals): row 6
        # carries the true finite frustum widths — no 1e10 tail, leftover
        # transmittance stays unabsorbed. ``opaque_tail`` (mip-NeRF 360
        # opaque_background) extends the LAST frustum to infinity — the
        # point form's boundary absorber, required for unbounded scenes.
        delta = x16b[6:7, :]
        if opaque_tail:
            delta = jnp.where(segpos == N - 1, 1e10, delta)
    else:
        ts = x16b[6:7, :]  # (1, tile)
        ts_next = pltpu.roll(ts, tile - 1, axis=1)  # value at lane+1
        delta = jnp.where(segpos == N - 1, 1e10, ts_next - ts)
    sp = jax.nn.softplus(sig)
    alpha = 1.0 - jnp.exp(-sp * delta)
    m = jnp.maximum(1.0 - alpha, 1e-10)
    logm = jnp.log(m)
    excl = _seg_cumsum(logm, segpos, N) - logm
    T = jnp.exp(excl)
    w = alpha * T  # (1, tile)

    def dotT(a, b):  # (8, tile) x (R, tile) -> (8, R), contract lanes
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    rgbw = jnp.where(rows_i < 3, out8 * w, 0.0)
    rgb_ray = dotT(rgbw, ST)  # (8, R), rows 0..2
    gt8 = x16b[8:16, :]  # rows 0..2 = gt broadcast per sample
    head = (segpos == 0).astype(jnp.float32)
    gt_ray = dotT(jnp.where(rows_i < 3, gt8 * head, 0.0), ST)

    err = rgb_ray - gt_ray  # (8, R), rows 0..2 valid
    if mip:
        # per-ray loss weight rides x16 row 14 (1.0 except multiscale
        # training, where it is the pixel's footprint area weight)
        lw = x16b[14:15, :]
        wr = dotT(
            jnp.where(
                rows_i < 3, jnp.broadcast_to(lw * head, (8, tile)), 0.0
            ),
            ST,
        )  # (8, R) rows 0..2 = w_ray
        loss_tile = jnp.sum(wr * err * err) * scale
        d_rgb_ray = 2.0 * scale * wr * err  # rows 0..2
    else:
        loss_tile = jnp.sum(err * err) * scale

        # --- loss gradient back to per-sample rgb/sigma ---
        d_rgb_ray = 2.0 * scale * err  # rows 0..2
    d_rgb_b = jax.lax.dot_general(  # (8, R) @ (R, tile) -> (8, tile)
        d_rgb_ray, ST, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    g_rgb8 = jnp.where(rows_i < 3, w * d_rgb_b, 0.0)

    prod = jnp.where(rows_i < 3, out8 * d_rgb_b, 0.0)
    d_w = jnp.sum(prod, axis=0, keepdims=True)  # (1, tile)

    if dist is not None:
        d_scale, dn, df, disp = dist

        def s_of(t):
            if disp:
                return (1.0 / dn - 1.0 / jnp.maximum(t, 1e-10)) / (
                    1.0 / dn - 1.0 / df
                )
            return (t - dn) / (df - dn)

        if mip:
            # INTERVAL form (ops/volume.py::distortion_loss_intervals):
            # positions are s-space interval midpoints, the self term
            # uses true s-space interval widths, and no tail is dropped
            # (interval compositing has no artificial absorber). Row 7
            # carries t0 per interval, row 6 its t-width (NOT ``delta``,
            # which is 1e10 at the tail under opaque_tail). With
            # opaque_tail the last interval IS an artificial absorber
            # and drops out of the regularizer like the point form's
            # tail sample.
            width = x16b[6:7, :]
            s0 = s_of(x16b[7:8, :])
            s1 = s_of(x16b[7:8, :] + width)
            s_pos = 0.5 * (s0 + s1)
            d_s = s1 - s0
            if opaque_tail:
                last = segpos == N - 1
                d_s = jnp.where(last, 0.0, d_s)
                wm = jnp.where(last, 0.0, w)
            else:
                wm = w
        else:
            ts_r = x16b[6:7, :]
            s_pos = s_of(ts_r)
            s_next = pltpu.roll(s_pos, tile - 1, axis=1)  # value at lane+1
            last = segpos == N - 1
            d_s = jnp.where(last, 0.0, s_next - s_pos)  # gap to next sample
            wm = jnp.where(last, 0.0, w)  # point form drops the tail sample
        wms = wm * s_pos
        A_in = _seg_cumsum(wm, segpos, N)
        A_ex = A_in - wm
        Bm_in = _seg_cumsum(wms, segpos, N)
        Bm_ex = Bm_in - wms
        # per-segment totals broadcast back to every lane: pack the two
        # running sums on rows 0/1, one (8,R) + (8,tile) matmul pair
        pack2 = jnp.where(
            rows_i == 0, jnp.broadcast_to(wm, (8, tile)), 0.0
        ) + jnp.where(rows_i == 1, jnp.broadcast_to(wms, (8, tile)), 0.0)
        tot2_b = jax.lax.dot_general(
            dotT(pack2, ST), ST,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        SA = tot2_b[0:1, :] - A_in  # suffix sums (j > k)
        SBm = tot2_b[1:2, :] - Bm_in
        # L = 2 sum_k w_k (m_k A^excl_k - B^excl_k) + sum w_k^2 d_k / 3
        cross_b = s_pos * A_ex - Bm_ex
        loss_tile = loss_tile + d_scale * jnp.sum(
            wm * (2.0 * cross_b) + wm * wm * d_s / 3.0
        )
        d_w_dist = (
            2.0 * (cross_b + SBm - s_pos * SA) + (2.0 / 3.0) * wm * d_s
        )
        if not mip or opaque_tail:
            # the loss doesn't touch the excluded tail weight, so its
            # d_w contribution there must be exactly zero
            d_w_dist = jnp.where(last, 0.0, d_w_dist)
        d_w = d_w + d_scale * d_w_dist

    y = d_w * w
    y8 = jnp.where(rows_i == 0, jnp.broadcast_to(y, (8, tile)), 0.0)
    tot = dotT(y8, ST)  # (8, R) row 0 = per-ray total
    tot_b = jax.lax.dot_general(
        tot, ST, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[0:1, :]
    suffix = tot_b - _seg_cumsum(y, segpos, N)  # sum over i > k
    d_alpha = d_w * T - jnp.where(1.0 - alpha > 1e-10, suffix / m, 0.0)
    d_sigma = (
        d_alpha * jnp.exp(-sp * delta) * delta * jax.nn.sigmoid(sig)
    )  # (1, tile)
    g_sig8 = jnp.where(
        rows_i == 0, jnp.broadcast_to(d_sigma, (8, tile)), 0.0
    )
    w8 = jnp.where(rows_i == 0, jnp.broadcast_to(w, (8, tile)), 0.0)
    return loss_tile, g_rgb8, g_sig8, w8


def _train_kernel(
    dtype, N, scale, want_w, model, mip, dist, opq, x16_ref, *refs
):
    """Per grid step: a software-pipelined loop over lane sub-blocks.

    The tile is split into K = tile/TS blocks (TS = the ST matrix's lane
    width, chosen in fused_train_step). Block k+1's positional-encoding
    transcendentals are emitted right after block k's FIRST trunk matmul
    (_forward_tile's ``prefetch`` hook), so the VPU sin/cos burst issues
    while block k's MXU chain drains — hiding the one serial VPU cost the
    r3 trace found exposed (~0.85 ms/iter at the bench shape; Mosaic only
    software-pipelines DMA across grid steps, not compute, so the overlap
    must be staged inside the kernel body). Weight-gradient contributions
    accumulate across blocks in registers and hit the output refs once."""
    wts = FusedWeights(*[r[:] for r in refs[:_N_W]])
    Sx = refs[_N_W][:]
    Sd = refs[_N_W + 1][:]
    n_s = 3 if mip else 2
    Sv = refs[_N_W + 2][:] if mip else None
    ST = refs[_N_W + n_s][:]  # (TS//N, TS) 0/1 segment matrix
    grad_refs = refs[_N_W + n_s + 1 : _N_W + n_s + 1 + _N_W]
    loss_ref = refs[_N_W + n_s + 1 + _N_W]
    w_ref = refs[_N_W + n_s + 2 + _N_W] if want_w else None

    x16 = x16_ref[:]
    tile = x16.shape[1]
    TS = ST.shape[1]
    K = tile // TS

    def enc_block(k):
        xb = x16[:, k * TS : (k + 1) * TS]
        return xb, _encode(
            xb[:8], Sx, Sd, dtype, model,
            xb[8:16] if mip else None, Sv,
        )

    blk = enc_block(0)
    acc = None
    loss_acc = None
    for k in range(K):
        xb, pe = blk
        pf = (lambda kk=k + 1: enc_block(kk)) if k + 1 < K else None
        out8, res, blk = _forward_tile(
            xb[:8], wts, None, None, dtype, model,
            pre_enc=pe, prefetch=pf,
        )
        loss_k, g_rgb8, g_sig8, w8 = _composite_grad_block(
            out8, xb, N, ST, scale, mip, dist, opaque_tail=opq
        )
        if want_w:
            # per-sample compositing weights (row 0) — consumed by the
            # hierarchical path's inverse-CDF importance sampler
            w_ref[:, k * TS : (k + 1) * TS] = w8
        grads = _backprop_tile(wts, res, g_rgb8, g_sig8, dtype, model)
        acc = (
            grads
            if acc is None
            else FusedWeights(*[a + b for a, b in zip(acc, grads)])
        )
        loss_acc = loss_k if loss_acc is None else loss_acc + loss_k
    _accumulate_grads(grad_refs, acc)

    cols_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    loss_block = jnp.where((rows8 == 0) & (cols_i == 0), loss_acc, 0.0)
    _accumulate_grads([loss_ref], [loss_block])


@functools.partial(
    jax.jit,
    static_argnames=(
        "N", "tile_rows", "compute_dtype", "out_weights", "model", "mip",
        "pipeline_blocks", "dist", "opaque_tail",
    ),
)
def fused_train_step(
    wts: FusedWeights,
    x16: jnp.ndarray,
    N: int,
    tile_rows: int = 1024,
    compute_dtype: Any = jnp.bfloat16,
    out_weights: bool = False,
    model: NerfMLP = FLAGSHIP,
    mip: bool = False,
    pipeline_blocks: int = 1,
    dist: tuple | None = None,
    opaque_tail: bool = False,
):
    """One fused fwd+composite+MSE-grad+bwd pass.

    Args:
      wts: pack_weights output.
      x16: (16, B*N) f32 — rows 0..2 sample xyz, 3..5 unit view dirs,
        6 ts, 7 zero, 8..10 gt color broadcast per sample, 11..15 zero.
        B*N must be a multiple of tile_rows and tile_rows of N.
        With ``mip=True``: rows 0..2 frustum Gaussian means, 6 the true
        interval widths t1-t0 (composited directly — no 1e10 tail),
        7 the interval near edges t0 (consumed only by the interval
        distortion rail), 11..13 diagonal variances (IPE encoder),
        14 per-ray loss weight (1.0 except multiscale training), 15
        zero (train/step.py::_build_x16_mip).
      N: samples per ray.
      out_weights: also return the per-sample compositing weights (B, N)
        (used by the hierarchical path to drive importance sampling).
      pipeline_blocks: software-pipeline the encode across lane
        sub-blocks (see _train_kernel). The actual block count is the
        smallest power of 2 >= this value whose sub-block width stays a
        multiple of lcm(N, 128) and divides tile_rows (the halving loop
        below only produces power-of-2 counts — e.g. a request of 3
        yields 4 sub-blocks). Default 1 = full-width, the
        measured-fastest layout on v5e.
      dist: optional ``(weight, tn, tf, disparity)`` — adds the
        mip-NeRF 360 distortion regularizer (s-normalized; point form,
        or exact interval-histogram form under ``mip``) to the
        in-kernel loss AND its gradient to the sigma backprop
        (_composite_grad_block). This keeps the 360 recipes (proposal
        + distortion, and the mip x proposal composition) on the
        single fused train kernel instead of the autodiff fallback.
      opaque_tail: (mip only) mip-NeRF 360's opaque_background — the
        last frustum's compositing delta becomes 1e10 (the point
        path's boundary absorber) and the tail interval drops out of
        the distortion rail like the point form's tail sample
        (ops/volume.py::composite_intervals opaque_tail).

    Returns:
      (loss scalar, weight gradients in kernel layout[, weights (B, N)]).
    """
    rows = x16.shape[1]
    assert model.app_dim == 0, (
        "the single fused train kernel has no appearance slot (its x16 "
        "rows 8..10 carry gt colors); appearance training runs the "
        "2-kernel custom-vjp path (train/step.py pallas_aux)"
    )
    assert tile_rows % N == 0 and rows % tile_rows == 0, (rows, tile_rows, N)
    B = rows // N
    grid = (rows // tile_rows,)
    scale = 1.0 / (3.0 * B)
    wts = _cast_weights(wts, compute_dtype)

    # Sub-block width for the in-kernel software pipeline (_train_kernel):
    # must hold whole rays (multiple of N) on whole lane tiles (multiple
    # of 128). MEASURED ON v5e: pipeline_blocks=4 runs ~38% SLOWER than
    # the full-width kernel (255K vs 352K rays/s at the bench shape) —
    # narrow-lane matmuls pay MXU fill/drain latency and per-block weight
    # reloads that far outweigh the ~0.85 ms/iter of encode VPU time the
    # overlap hides. Default 1 (full width); the knob stays for parity
    # testing and for re-evaluation on future hardware.
    TS = tile_rows
    if pipeline_blocks > 1:
        base = int(np.lcm(N, 128))
        while TS > base and tile_rows // TS < pipeline_blocks:
            half = TS // 2
            if half % base != 0 or tile_rows % half != 0:
                break
            TS = half
    lane = np.arange(TS)
    ST = (lane[None, :] // N == np.arange(TS // N)[:, None]).astype(
        np.float32
    )
    extras = [_spread_x(model), _spread_d(model)]
    if mip:
        extras.append(_spread_v(model))
    extras.append(ST)

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    in_specs = (
        [pl.BlockSpec((16, tile_rows), lambda i: (0, i), memory_space=pltpu.VMEM)]
        + [full(w) for w in wts]
        + [full(e) for e in extras]
    )
    out_specs = tuple(full(w) for w in wts) + (
        pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
    )
    out_shape = tuple(
        jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wts
    ) + (jax.ShapeDtypeStruct((8, 128), jnp.float32),)
    if out_weights:
        out_specs = out_specs + (
            pl.BlockSpec(
                (8, tile_rows), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        )
        out_shape = out_shape + (
            jax.ShapeDtypeStruct((8, rows), jnp.float32),
        )

    # distortion: λ * mean-over-rays -> per-tile sums scale by λ/B
    dist_k = (
        (dist[0] / B, dist[1], dist[2], dist[3]) if dist is not None else None
    )
    outs = pl.pallas_call(
        functools.partial(
            _train_kernel, compute_dtype, N, scale, out_weights, model, mip,
            dist_k, opaque_tail,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
    )(x16, *wts, *[jnp.asarray(e) for e in extras])
    if out_weights:
        loss = outs[_N_W][0, 0]
        w_bn = outs[-1][0, :].reshape(B, N)
        return loss, FusedWeights(*outs[:_N_W]), w_bn
    return outs[-1][0, 0], FusedWeights(*outs[:-1])


# ---------------------------------------------------------------------------
# Fused render kernel (eval path): fwd MLP + compositing in one kernel.
# Outputs per-ray rgb/depth/acc packed at ray-segment head lanes; the
# caller strides them out ([..., ::N]). No backward (eval only).
# ---------------------------------------------------------------------------


def _render_kernel(dtype, N, model, x16_ref, *refs):
    wts = FusedWeights(*[r[:] for r in refs[:_N_W]])
    Sx = refs[_N_W][:]
    Sd = refs[_N_W + 1][:]
    ST = refs[_N_W + 2][:]
    out_ref = refs[_N_W + 3]

    x16 = x16_ref[:]
    out8, _, _ = _forward_tile(x16[:8], wts, Sx, Sd, dtype, model)

    tile = x16.shape[1]
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (8, tile), 0)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
    segpos = lane1 % N

    ts = x16[6:7, :]
    sig = out8[3:4, :]
    ts_next = pltpu.roll(ts, tile - 1, axis=1)
    delta = jnp.where(segpos == N - 1, 1e10, ts_next - ts)
    sp = jax.nn.softplus(sig)
    alpha = 1.0 - jnp.exp(-sp * delta)
    m = jnp.maximum(1.0 - alpha, 1e-10)
    logm = jnp.log(m)
    excl = _seg_cumsum(logm, segpos, N) - logm
    w = alpha * jnp.exp(excl)

    def dotT(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    rgb_ray = dotT(jnp.where(rows_i < 3, out8 * w, 0.0), ST)  # rows 0..2
    wts_row = jnp.where(rows_i == 0, jnp.broadcast_to(w, (8, tile)), 0.0)
    depth_ray = pltpu.roll(
        dotT(wts_row * jnp.broadcast_to(ts, (8, tile)), ST), 3, axis=0
    )  # per-ray sum(w*t) moved to row 3
    acc_ray = pltpu.roll(dotT(wts_row, ST), 4, axis=0)  # row 4
    rows_r = jax.lax.broadcasted_iota(jnp.int32, rgb_ray.shape, 0)
    ray_vals = (
        jnp.where(rows_r < 3, rgb_ray, 0.0)
        + jnp.where(rows_r == 3, depth_ray, 0.0)
        + jnp.where(rows_r == 4, acc_ray, 0.0)
    )  # (8, R)
    # broadcast per segment, keep only the head lane of each ray
    back = jax.lax.dot_general(
        ray_vals, ST, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = jnp.where(segpos == 0, back, 0.0)


@functools.partial(
    jax.jit, static_argnames=("N", "tile_rows", "compute_dtype", "model")
)
def fused_render(
    wts: FusedWeights,
    x16: jnp.ndarray,
    N: int,
    tile_rows: int = 1024,
    compute_dtype: Any = jnp.bfloat16,
    model: NerfMLP = FLAGSHIP,
) -> jnp.ndarray:
    """Fused fwd+composite render. x16 as in fused_train_step (rows 8..15
    unused). Returns (8, rows) with per-ray values at lanes ray*N:
    rows 0..2 raw rgb, 3 depth, 4 acc."""
    rows = x16.shape[1]
    assert model.app_dim == 0, (
        "the fused eval render kernel has no appearance slot; appearance "
        "eval renders via fused_mlp + XLA compositing"
    )
    assert tile_rows % N == 0 and rows % tile_rows == 0
    R = tile_rows // N
    grid = (rows // tile_rows,)
    wts = _cast_weights(wts, compute_dtype)
    lane = np.arange(tile_rows)
    ST = (lane[None, :] // N == np.arange(R)[:, None]).astype(np.float32)
    extras = [_spread_x(model), _spread_d(model), ST]

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    in_specs = (
        [pl.BlockSpec((16, tile_rows), lambda i: (0, i), memory_space=pltpu.VMEM)]
        + [full(w) for w in wts]
        + [full(e) for e in extras]
    )
    return pl.pallas_call(
        functools.partial(_render_kernel, compute_dtype, N, model),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (8, tile_rows), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((8, rows), jnp.float32),
    )(x16, *wts, *[jnp.asarray(e) for e in extras])
