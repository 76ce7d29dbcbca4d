"""Typed configuration with the reference's YAML schema.

The reference feeds a raw ``yaml.load`` dict straight into train()/test()
(train.py:100-102, test.py:53-55; key inventory in SURVEY.md §5). We keep
the exact same YAML keys for interface parity — a reference lego.yaml
works unmodified — but validate into frozen dataclasses, with additive
TPU-native extensions (mesh/precision/hierarchical/perf knobs) that all
default to reference-compatible behavior.
"""

from __future__ import annotations

import dataclasses
import warnings
from typing import Any

import yaml


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    # --- reference keys (configs/lego.yaml:1-15) ---
    datapath: str
    savepath: str = "./models"
    exp_name: str = "exp"
    lr_init: float = 5e-4
    lr_final: float = 4e-4
    Nf: int = 128
    Nc: int = 64  # live only when hierarchical=True (reference stub)
    num_iters: int = 4000
    ckpt_model: int = 2000
    ckpt_loss: int = 100
    ckpt_images: int = 500
    batch_size: int = 4096
    half_res: bool = True
    val_idxs: tuple[int, ...] = (0, 1)
    num_train_imgs: int = 25

    # --- TPU-native extensions (additive; defaults = reference behavior) ---
    tn: float = 2.0
    tf: float = 6.0
    seed: int = 0
    # The reference hardcodes Adam lr=5e-4, ignoring lr_init (train.py:43).
    # Default replicates that quirk; set honor_lr_init=True to fix it.
    honor_lr_init: bool = False
    # hierarchical coarse+fine sampling (reference roadmap item)
    hierarchical: bool = False
    # proposal-network sampling (mip-NeRF 360; models/proposal.py): a
    # tiny density-only MLP places the Nf main samples, trained by the
    # interlevel bound loss (ops/volume.py::interlevel_loss) — the
    # hierarchical scheme's sample quality at ~1/30th the coarse-pass
    # FLOPs, and the main net evaluates Nf points instead of Nc + Nf.
    # Mutually exclusive with ``hierarchical``.
    proposal: bool = False
    Np: int = 64  # proposal probes per ray (when proposal=True)
    prop_Lp: int = 6  # proposal position-encoding octaves
    prop_D: int = 4  # proposal hidden layers
    prop_H: int = 64  # proposal hidden width
    proposal_loss_weight: float = 1.0
    # Resampling anneal (mip-NeRF 360 / MultiNeRF ``anneal_slope``
    # analogue, linear ramp): for the first prop_anneal_frac * num_iters
    # steps, the histogram that PLACES the main field's samples is
    # raised to a power ramping 0 -> 1 (uniform -> true weights), so
    # early random proposal weights cannot lock sample placement into a
    # degenerate attractor. Load-bearing for the anti-aliased unbounded
    # composition (mip x proposal x disparity): without it the tiny
    # near-plane intervals' undamped IPE sharpness pulls ALL density
    # into a per-view canvas at t = tn (train 38 dB / test 13 dB,
    # measured — docs/PERFORMANCE.md anti-aliased-360 section). 0 = off.
    prop_anneal_frac: float = 0.0
    # mip-NeRF cone casting (Barron et al. 2021): samples become conical
    # frustum Gaussians and the position encoding integrates over them
    # (ops/encoding.py::gamma_ipe) — anti-aliased rendering across
    # scales. NerfMLP family; backend="pallas" runs the fused train
    # kernel with the in-kernel IPE encoder (kernels/mlp.py mip=True).
    # Mutually exclusive with the resampling schemes
    # (hierarchical/proposal/occupancy place POINT samples). The
    # per-frame cone radius is derived from the dataset focal by the
    # drivers.
    mip: bool = False
    # 2 = the full mip-NeRF algorithm: a SINGLE shared MLP renders Nf
    # coarse frustums, the fine level resamples Nf new interval edges
    # from the (dilated) coarse weight histogram
    # (ops/sampling.py::resample_edges), and the loss is
    # mip_coarse_weight * coarse + fine (paper sec. 3.3 — half the
    # parameters of classic hierarchical, which keeps two nets)
    mip_levels: int = 1
    mip_coarse_weight: float = 0.1
    # Exploration floor for interval-edge resampling (resample_edges
    # ``blur``, mip-NeRF's alpha): uniform mass added per histogram bin
    # before drawing the fine edges, for both mip_levels=2 and the
    # mip x proposal composition. Note the scale: 0.01 per bin over Np
    # bins scatters a double-digit fraction of the fine edges uniformly
    # along every ray, where the point sampler's floor (importance_ts)
    # is 1e-5 per bin — see the anti-aliased-360 notes in
    # docs/PERFORMANCE.md before changing it.
    resample_blur: float = 0.01
    # mip-NeRF 360's opaque_background: extend the LAST cone frustum to
    # infinity so interval compositing gets the same boundary absorber
    # the point path has built in (its 1e10 tail delta). REQUIRED for
    # unbounded (contract) scenes under mip: without an absorber the
    # field has nowhere to charge background misses and collapses into
    # per-view near-plane canvases (measured 40 dB train / 13 dB test —
    # docs/PERFORMANCE.md "Mip × proposal"). The artificial tail
    # interval is excluded from the distortion/interlevel losses exactly
    # like the point form's tail sample. No-op without mip.
    opaque_background: bool = False
    # mip-NeRF multiscale training (paper sec. 4): train on the union of
    # the image pyramid at scales 1..1/8 with per-ray cone radii and
    # footprint-area loss weights (data/dataset.py::
    # multiscale_train_arrays) — the fix for coarse-scale rendering
    # quality; eval any scale with test_params mip
    mip_multiscale: bool = False
    # mip-NeRF 360 unbounded-scene support: scene_contraction squashes
    # positions into the radius-2 ball at the MODEL boundary (a model
    # field — checkpoints carry it), and sampling_space: "disparity"
    # places stratified bins uniformly in 1/t so a tf of hundreds of
    # units gets a sane sample prior. Pair them for 360 captures
    # (e.g. contract: true, sampling_space: disparity, tf: 100).
    contract: bool = False
    sampling_space: str = "linear"
    # train-time Gaussian sigma-noise regularizer std (reference TODO at
    # utils/rendering.py:63); 0.0 = off
    sigma_noise: float = 0.0
    # composite RGBA onto white at load (original-NeRF convention; the
    # reference drops alpha). Off = reference behavior.
    white_bkgd: bool = False
    # depth-supervised training (DS-NeRF-style): add
    # weight * L2(expected termination depth, metric GT depth) to the
    # loss. Requires <datapath>/depth/train/r_<i>.npy sidecars
    # (data/synthetic.py write_depth=True emits them; the reference
    # PARSES test-split depth PNGs, utils/dataload.py:87-99, but nothing
    # consumes them — this consumes the metric counterpart). 0.0 = off.
    # Runs the autodiff XLA loss path (the fused kernel is MSE-only).
    depth_loss_weight: float = 0.0
    # mip-NeRF 360 distortion regularizer weight (ops/volume.py::
    # distortion_loss): penalizes weight mass spread along rays
    # ("fog"/floaters — what makes vanilla-NeRF density-gradient
    # normals noisy). 0.0 = off. Typical: 1e-3..1e-2. Runs IN-KERNEL
    # on the fused pallas train path (kernels/mlp.py dist rail, point
    # and interval forms); XLA path computes the same loss in jnp.
    distortion_loss_weight: float = 0.0
    # --- per-image trainable extras (the real-capture toolkit; both ride
    # a {"field": ..., "cams"/"app": ...} param wrapper with their own
    # optimizer groups — train/step.py — and force the autodiff XLA loss
    # path: the fused kernel differentiates only wrt weights, and pose/
    # appearance gradients flow through the ray stream itself) ---
    # NeRF-W-style appearance embeddings: a trainable
    # (num_train_images, appearance_dim) code table; each sampled ray
    # appends its source image's code to the view-direction encoding, so
    # per-image exposure/white-balance/lighting variation lands in the
    # color head while density stays shared. 0 = off. Eval renders with
    # the mean code by default (TestConfig.appearance_idx). NerfMLP
    # family, point-sampled paths (mip IPE not plumbed).
    appearance_dim: int = 0
    # BARF-style joint camera-pose refinement: per-train-image se(3)
    # deltas (axis-angle rotation about the camera center + world
    # translation), applied to every sampled ray inside the jitted step
    # (ops/rays.py::apply_cam_deltas) and trained by the photometric
    # loss through ray generation — corrects miscalibrated COLMAP/real
    # poses. Own Adam schedule (pose_lr_init -> pose_lr_final,
    # exponential, like the main schedule).
    pose_opt: bool = False
    pose_lr_init: float = 1e-3
    pose_lr_final: float = 1e-5
    # steps before pose updates engage (pose lr = 0 until then). While
    # the field is random, photometric pose gradients are pure noise and
    # Adam normalizes them into full-size steps — the rig random-walks
    # away within the first chunk (measured: |dr| drifts to ~0.08 rad in
    # 100 iters, never recovers). A short warmup lets the field develop
    # structure first, so pose gradients point at each image's actual
    # misalignment. Rule of thumb: ~3-5% of num_iters.
    pose_warmup: int = 300
    # two-phase refinement: at this step the trained pose deltas are
    # BAKED into the HBM ray dataset (one jitted pass over all rays,
    # ops/rays.py::bake_cam_deltas), the {"field","cams"} params wrapper
    # is dropped (Adam moments and schedule counts carry over), and the
    # run continues as a plain config — re-eligible for the fused
    # Pallas train kernel. Rationale: pose_opt rides the autodiff XLA
    # path at ~5.5x the fused step (benchmarks/poseapp_bench.json), but
    # pose deltas converge early; freezing amortizes refinement to near
    # zero. The deltas are persisted as <exp_dir>/cam_deltas.npz (resume
    # re-bakes from it; train-split eval renders keep using it). 0 = off
    # (poses train the whole run). Costs one extra step compile at the
    # freeze boundary. Pose-only: rejected with appearance_dim > 0.
    pose_freeze_at: int = 0
    # BARF coarse-to-fine PE annealing (Lin et al. 2021 eqn. 14), the
    # pose-refinement companion: octave k of the positional encoding is
    # cosine-ramped in as training progresses, reaching the full
    # encoder at this step (ops/encoding.py::anneal_weights). Rationale:
    # full-frequency PE makes photometric POSE gradients oscillate at
    # 2^k, so joint refinement stalls in noise — the smooth octaves must
    # align the rig before the sharp ones lock detail in (measured:
    # without annealing pose_opt recovers ~1 dB of a ~10 dB
    # miscalibration gap; benchmarks/pose_freeze_bench.json). Traced
    # from the step counter: one compiled program serves the whole
    # schedule. Requires pose_opt (its reason to exist here) and, with
    # pose_freeze_at, must finish by the freeze (phase B's fused kernel
    # computes the standard full-frequency encoder). 0 = off.
    pe_anneal_until: int = 0
    # restrict training ray sampling to these train-image indices — the
    # reference's commented-out select_imgs mode (train.py:48,
    # dataload.py:155-179). Empty = sample the whole split (default).
    train_im_idxs: tuple[int, ...] = ()
    # "f32" (parity) or "bf16" (MXU fast path)
    compute_dtype: str = "f32"
    # "xla" (oracle path) or "pallas" (fused VMEM-resident MLP kernel)
    backend: str = "xla"
    # network architecture (reference Nerf defaults, utils/nets.py:8);
    # the fused kernels support any H % 16 == 0 >= 16 — eval infers the
    # arch from checkpoint shapes, so only training needs these
    net_H: int = 256
    net_Lp: int = 10
    net_Ld: int = 4
    # model family: "nerf" (the reference MLP; default) or "hashgrid"
    # (Instant-NGP multiresolution hash encoding, models/hashgrid.py —
    # much faster convergence per iteration; XLA backend only)
    model_family: str = "nerf"
    # hash-grid knobs (used when model_family == "hashgrid"); see
    # models/hashgrid.py::HashGridModel for semantics
    hash_L: int = 8
    hash_F: int = 4
    # per-level table cap: 2^14 matches HashGridModel's TPU default (XLA
    # scatter-add degrades ~30x at 2^19 rows — models/hashgrid.py)
    hash_log2_T: int = 14
    hash_Nmin: int = 16
    hash_Nmax: int = 256
    hash_H: int = 64
    hash_aabb: float = 4.0
    # table-gradient estimator: "sample" (one stochastic corner per
    # query/level; 8x fewer scatter updates — the TPU training fast
    # path) or "exact" (full trilinear transpose)
    hash_grad_mode: str = "sample"
    # TRAINING forward: "sample" draws ONE corner per query/level with
    # P(c) = trilinear weight instead of interpolating all 8 — 8x fewer
    # gather rows (the step-time bottleneck), unbiased, with per-query
    # vertex-snap noise. Eval/checkpoint renders stay exact.
    hash_fwd_mode: str = "exact"
    # CP-grid knobs (used when model_family == "cpgrid"); see
    # models/cpgrid.py::CPGridModel for semantics — the MXU-native
    # factorized-grid family (line interpolation as hat-basis matmuls;
    # no gather/scatter anywhere)
    cp_Rs: tuple = (64, 256)  # per-level grid resolutions
    cp_Cs: int = 32  # sigma components per level
    cp_Ca: int = 96  # appearance components per level
    cp_P: int = 27  # appearance feature width after the basis projection
    cp_H: int = 64  # decoder MLP width
    cp_aabb: float = 4.0
    # grid-parameter learning rate (TensoRF sec. 5: grids train at ~20x
    # the MLP lr; decays by the SAME per-step factor as the main
    # schedule). The decoder MLP and basis use the regular lr schedule.
    cp_lr_grid: float = 2e-2
    # --- occupancy-grid accelerated sampling (ops/occupancy.py) ---
    # Redistributes the N training samples per ray into density-occupied
    # space via an EMA'd occupancy grid (TPU-static empty-space skipping;
    # the NerfAcc/Instant-NGP acceleration structure). Off = reference
    # stratified sampling.
    occupancy: bool = False
    occ_R: int = 64  # grid resolution per axis
    occ_Nb: int = 64  # per-ray probe bins for the sampling PDF (probe
    # cost is linear in Nb: ~9 ns/probe gather on v5e)
    occ_update_every: int = 16  # grid EMA refresh cadence (steps)
    occ_decay: float = 0.95  # EMA decay per refresh
    occ_floor: float = 0.01  # minimum per-bin sampling mass
    occ_aabb: float = 4.0  # grid extent: [-aabb, aabb]^3
    # steps fused into one jitted lax.scan call (dispatch amortization)
    steps_per_call: int = 20
    # data-parallel chips; 0/1 = single chip, -1 = all (global) devices
    num_data_shards: int = 1
    # multi-host launch: call jax.distributed.initialize() (coordinates
    # via JAX_COORDINATOR/NPROC/PROC_ID env vars, or TPU-pod
    # auto-discovery) before any array work — parallel/distributed.py
    distributed: bool = False
    # shard the HBM-resident ray/pixel dataset over the data mesh axis
    # instead of replicating it (divides dataset HBM by mesh size; each
    # chip samples its own 1/n slice)
    shard_dataset: bool = False
    # dataset family: "blender" or "llff"
    dataset: str = "blender"
    # LLFF-only knobs (used when dataset == "llff")
    llff_factor: int = 8
    ndc: bool = True
    # resume from latest checkpoint in savepath/exp_name if present
    resume: bool = False
    log_dir: str = "logs"
    # if set, capture a jax.profiler device trace of the first few chunks
    # into this directory (view with TensorBoard / Perfetto)
    profile_dir: str = ""
    # wrap the train step with checkify NaN/Inf/OOB guards
    # (utils/guards.checked); any non-finite value raises host-side with a
    # location instead of silently poisoning training. Debug-only: adds
    # overhead and disables buffer donation.
    debug_nan: bool = False

    def __post_init__(self):
        if self.batch_size <= 0:
            raise ValueError(f"batch_size must be positive, got {self.batch_size}")
        if self.Nf <= 0:
            raise ValueError(f"Nf must be positive, got {self.Nf}")
        if self.hierarchical and self.Nc <= 0:
            raise ValueError(
                f"hierarchical=True needs Nc > 0 coarse samples, got Nc={self.Nc}"
            )
        if self.proposal and self.hierarchical:
            raise ValueError(
                "proposal and hierarchical are alternative sampling "
                "schemes (proposal replaces the coarse NeRF with a tiny "
                "density MLP); enable at most one"
            )
        if self.proposal and self.Np <= 0:
            raise ValueError(
                f"proposal=True needs Np > 0 probe samples, got Np={self.Np}"
            )
        if self.proposal and min(self.prop_Lp, self.prop_D, self.prop_H) <= 0:
            raise ValueError(
                "proposal MLP dims must be positive, got "
                f"prop_Lp={self.prop_Lp} prop_D={self.prop_D} "
                f"prop_H={self.prop_H}"
            )
        if self.proposal_loss_weight < 0:
            raise ValueError(
                "proposal_loss_weight must be >= 0, got "
                f"{self.proposal_loss_weight}"
            )
        if not 0.0 <= self.prop_anneal_frac <= 1.0:
            raise ValueError(
                "prop_anneal_frac must be in [0, 1] (fraction of "
                f"num_iters), got {self.prop_anneal_frac}"
            )
        if self.prop_anneal_frac > 0 and not self.proposal:
            raise ValueError(
                "prop_anneal_frac > 0 anneals proposal-guided sample "
                "placement and needs proposal=True"
            )
        if self.mip:
            # proposal COMPOSES with mip (proposal-placed interval edges
            # + IPE frustums + optionally distortion = the published
            # mip-NeRF 360 model; renderer.py::render_rays_proposal), as
            # does distortion_loss_weight (interval-histogram form,
            # ops/volume.py::distortion_loss_intervals). Occupancy /
            # hierarchical / non-MLP families stay point-sampled only.
            bad = [
                name
                for name, on in (
                    ("hierarchical", self.hierarchical),
                    ("occupancy", self.occupancy),
                    (
                        f"model_family={self.model_family}",
                        self.model_family != "nerf",
                    ),
                )
                if on
            ]
            if bad:
                raise ValueError(
                    f"mip=True is incompatible with {', '.join(bad)}: cone "
                    "casting integrates frustum VOLUMES (NerfMLP IPE only) "
                    "and draws its own interval edges"
                )
        if self.mip_levels not in (1, 2):
            raise ValueError(
                f"mip_levels must be 1 or 2, got {self.mip_levels}"
            )
        if self.resample_blur < 0:
            raise ValueError(
                f"resample_blur must be >= 0, got {self.resample_blur}"
            )
        if self.opaque_background and not self.mip:
            raise ValueError(
                "opaque_background modifies INTERVAL compositing and "
                "needs mip=True (the point path already has the 1e10 "
                "tail absorber built in)"
            )
        if self.mip_levels == 2 and not self.mip:
            raise ValueError(
                "mip_levels=2 (coarse+fine cone casting) requires mip=True"
            )
        if self.mip_levels == 2 and self.proposal:
            raise ValueError(
                "mip_levels=2 and proposal=True both define the coarse "
                "level (shared-MLP cone resampling vs the proposal "
                "histogram); pick one — the mip-NeRF 360 recipe is "
                "proposal=True with mip_levels=1"
            )
        if self.mip_levels == 2 and self.distortion_loss_weight > 0:
            raise ValueError(
                "distortion_loss_weight > 0 with mip_levels=2 is not "
                "supported (the fine level's interval edges live inside "
                "the two-level renderer); the published recipe is the "
                "proposal composition: proposal=True, mip_levels=1"
            )
        if self.mip_multiscale:
            if not self.mip:
                raise ValueError(
                    "mip_multiscale=True (pyramid training) requires "
                    "mip=True"
                )
            if self.depth_loss_weight > 0:
                raise ValueError(
                    "mip_multiscale is incompatible with depth supervision "
                    "(the pyramid pixels carry no depth sidecars)"
                )
            if self.train_im_idxs:
                raise ValueError(
                    "mip_multiscale is incompatible with train_im_idxs "
                    "(pyramid rays break the per-image H*W row mapping)"
                )
            if self.dataset != "blender":
                raise ValueError(
                    "mip_multiscale needs dataset=blender (the pyramid "
                    "builder downsamples pinhole frames); LLFF mip uses "
                    "per-ray radii instead"
                )
        if self.sampling_space not in ("linear", "disparity"):
            raise ValueError(
                "sampling_space must be 'linear' or 'disparity', got "
                f"{self.sampling_space!r}"
            )
        if self.sampling_space == "disparity" and self.tn <= 0:
            raise ValueError(
                f"sampling_space='disparity' needs tn > 0 (bins are "
                f"uniform in 1/t); got tn={self.tn}"
            )
        if (
            self.sampling_space == "disparity"
            and self.dataset == "llff"
            and self.ndc
        ):
            raise ValueError(
                "sampling_space='disparity' with NDC is redundant (the "
                "NDC warp already makes linear-in-t linear-in-disparity) "
                "and its t-range starts at 0; use ndc: false"
            )
        if self.sampling_space == "disparity" and self.occupancy:
            raise ValueError(
                "sampling_space='disparity' is dead under occupancy=True "
                "(the occupancy grid redistributes LINEAR bins of "
                "[tn, tf] and its aabb cannot cover an unbounded far "
                "field); drop one of the two"
            )
        if self.contract:
            # mip + contract composes: the frustum Gaussians warp through
            # the linearized contraction (ops/encoding.py::
            # contract_gaussian) before the integrated encoding
            if self.dataset == "llff" and self.ndc:
                raise ValueError(
                    "contract=True is redundant/incompatible with NDC "
                    "(both are unbounded-scene warps); set ndc: false "
                    "for contracted LLFF captures"
                )
        if self.mip_coarse_weight < 0:
            raise ValueError(
                f"mip_coarse_weight must be >= 0, got {self.mip_coarse_weight}"
            )
        if self.compute_dtype not in ("f32", "bf16"):
            raise ValueError(
                f"compute_dtype must be 'f32' or 'bf16', got {self.compute_dtype!r}"
            )
        if self.backend not in ("xla", "pallas"):
            raise ValueError(
                f"backend must be 'xla' or 'pallas', got {self.backend!r}"
            )
        if self.num_data_shards > 1 and self.batch_size % self.num_data_shards:
            raise ValueError(
                f"batch_size={self.batch_size} must be divisible by "
                f"num_data_shards={self.num_data_shards} (each chip draws an "
                f"equal ray sub-batch); pick batch_size="
                f"{-(-self.batch_size // self.num_data_shards) * self.num_data_shards}"
            )
        if self.num_iters <= 0:
            raise ValueError(f"num_iters must be positive, got {self.num_iters}")
        if self.depth_loss_weight < 0:
            raise ValueError(
                f"depth_loss_weight must be >= 0, got {self.depth_loss_weight}"
            )
        if self.distortion_loss_weight < 0:
            raise ValueError(
                "distortion_loss_weight must be >= 0, got "
                f"{self.distortion_loss_weight}"
            )
        if self.steps_per_call <= 0:
            raise ValueError(
                f"steps_per_call must be positive, got {self.steps_per_call}"
            )
        if self.model_family not in ("nerf", "hashgrid", "cpgrid"):
            raise ValueError(
                f"model_family must be 'nerf', 'hashgrid' or 'cpgrid', got "
                f"{self.model_family!r}"
            )
        if self.model_family == "cpgrid":
            if len(tuple(self.cp_Rs)) == 0 or min(self.cp_Rs) < 2:
                raise ValueError(
                    f"cp_Rs needs at least one level of resolution >= 2, "
                    f"got {self.cp_Rs!r}"
                )
            if self.cp_Cs <= 0 or self.cp_Ca <= 0:
                raise ValueError(
                    "cpgrid component counts must be positive, got "
                    f"cp_Cs={self.cp_Cs} cp_Ca={self.cp_Ca}"
                )
            if self.cp_lr_grid <= 0:
                raise ValueError(
                    f"cp_lr_grid must be positive, got {self.cp_lr_grid}"
                )
        if self.hash_grad_mode not in ("sample", "exact"):
            raise ValueError(
                f"hash_grad_mode must be 'sample' or 'exact', got "
                f"{self.hash_grad_mode!r}"
            )
        if self.hash_fwd_mode not in ("sample", "exact"):
            raise ValueError(
                f"hash_fwd_mode must be 'sample' or 'exact', got "
                f"{self.hash_fwd_mode!r}"
            )
        if self.hash_fwd_mode == "sample" and self.hash_grad_mode == "exact":
            raise ValueError(
                "hash_fwd_mode='sample' cannot honor hash_grad_mode="
                "'exact': gradients can only flow through the one corner "
                "the sampled forward gathered (the exact 8-corner "
                "transpose doesn't exist for that forward) — use "
                "hash_grad_mode='sample', or hash_fwd_mode='exact'"
            )
        if self.model_family != "nerf" and self.backend == "pallas":
            raise ValueError(
                "backend='pallas' (the fused MLP kernels) supports only the "
                f"'nerf' model family; {self.model_family} runs the XLA "
                "path (hashgrid is gather-bound; cpgrid is already "
                "matmul-native under XLA) — set backend: xla"
            )
        if self.model_family == "hashgrid" and self.steps_per_call > 20:
            warnings.warn(
                f"steps_per_call={self.steps_per_call} with the hashgrid "
                "family: scan lengths > 20 over the gather/scatter step "
                "trip a pathological libtpu compile (observed > 20 min at "
                "50 vs ~45 s at 10-20 on v5e); consider steps_per_call<=20",
                stacklevel=3,
            )
        if self.train_im_idxs and self.shard_dataset:
            raise ValueError(
                "train_im_idxs cannot combine with shard_dataset: image "
                "pixel ranges straddle dataset shards; drop one of the two"
            )
        if self.appearance_dim < 0:
            raise ValueError(
                f"appearance_dim must be >= 0, got {self.appearance_dim}"
            )
        if self.appearance_dim > 0 or self.pose_opt:
            what = (
                "appearance_dim > 0" if self.appearance_dim > 0 else "pose_opt"
            )
            if self.shard_dataset:
                raise ValueError(
                    f"{what} cannot combine with shard_dataset: per-image "
                    "params need the global row -> image mapping, but each "
                    "chip samples rows of its LOCAL dataset slice"
                )
            if self.mip_multiscale:
                raise ValueError(
                    f"{what} cannot combine with mip_multiscale: the "
                    "pyramid ray pool breaks the per-image H*W row mapping"
                )
        if self.appearance_dim > 0:
            if self.model_family != "nerf":
                raise ValueError(
                    "appearance_dim > 0 is NerfMLP-family only (the code "
                    "rides the direction encoding into the color head)"
                )
            if self.mip:
                raise ValueError(
                    "appearance_dim > 0 is not plumbed through the mip IPE "
                    "path; use point-sampled configs (plain/hierarchical/"
                    "proposal/occupancy)"
                )
        if self.pose_opt:
            if self.dataset == "llff" and self.ndc:
                raise ValueError(
                    "pose_opt needs world-space rays: NDC-warped rays have "
                    "no meaningful se(3) delta (set ndc: false for "
                    "refinable LLFF captures)"
                )
            if self.pose_lr_init <= 0 or self.pose_lr_final <= 0:
                raise ValueError(
                    "pose_lr_init/pose_lr_final must be positive, got "
                    f"{self.pose_lr_init}/{self.pose_lr_final}"
                )
        if self.pose_freeze_at < 0:
            raise ValueError(
                f"pose_freeze_at must be >= 0, got {self.pose_freeze_at}"
            )
        if self.pose_freeze_at > 0:
            if not self.pose_opt:
                raise ValueError(
                    "pose_freeze_at > 0 without pose_opt: there are no "
                    "pose deltas to freeze"
                )
            if self.appearance_dim > 0:
                raise ValueError(
                    "pose_freeze_at cannot combine with appearance_dim: "
                    "freezing drops the per-image params wrapper, but "
                    "appearance codes must stay trainable for the whole "
                    "run (freeze is pose-only)"
                )
            if self.pose_freeze_at <= self.pose_warmup:
                raise ValueError(
                    f"pose_freeze_at ({self.pose_freeze_at}) must exceed "
                    f"pose_warmup ({self.pose_warmup}): pose lr is zero "
                    "through the warmup, so freezing before it ends "
                    "would bake untrained (identity) deltas"
                )
            if self.pose_freeze_at >= self.num_iters:
                raise ValueError(
                    f"pose_freeze_at ({self.pose_freeze_at}) must be < "
                    f"num_iters ({self.num_iters}); for poses trained to "
                    "the end just leave pose_freeze_at at 0"
                )
        if self.pe_anneal_until < 0:
            raise ValueError(
                f"pe_anneal_until must be >= 0, got {self.pe_anneal_until}"
            )
        if self.pe_anneal_until > 0:
            if not self.pose_opt:
                raise ValueError(
                    "pe_anneal_until > 0 without pose_opt: PE annealing "
                    "exists to stabilize joint pose refinement (and by "
                    "itself only slows convergence)"
                )
            if self.mip:
                raise ValueError(
                    "pe_anneal_until is not plumbed through the mip IPE "
                    "encoder (IPE's variance damping plays the same "
                    "low-pass role)"
                )
            if self.model_family != "nerf":
                raise ValueError(
                    "pe_anneal_until is NerfMLP-family only (the "
                    "hashgrid analogue — level weighting — is not built)"
                )
            if self.pose_freeze_at and self.pe_anneal_until > self.pose_freeze_at:
                raise ValueError(
                    f"pe_anneal_until ({self.pe_anneal_until}) must "
                    f"finish by pose_freeze_at ({self.pose_freeze_at}): "
                    "the post-freeze fused kernel computes the standard "
                    "full-frequency encoder"
                )

    @property
    def render_dtype(self):
        import jax.numpy as jnp

        return jnp.bfloat16 if self.compute_dtype == "bf16" else jnp.float32


@dataclasses.dataclass(frozen=True)
class TestConfig:
    # --- reference keys (configs/lego.yaml:17-28) ---
    loadpath: str
    datapath: str
    savepath: str = "./results"
    exp_name: str = "exp"
    batch_size: int = 16000
    half_res: bool = True
    im_set: str = "test"
    im_idxs: tuple[int, ...] = (0,)
    animation: bool = False
    num_poses: int = 30
    theta: float = 30.0

    # --- extensions ---
    tn: float = 2.0
    tf: float = 6.0
    N_samples: int = 128  # hardcoded 128 in the reference (rendering.py:102)
    Nc: int = 0  # >0 = hierarchical eval
    # >0 = proposal-guided eval: Np deterministic probes of the
    # checkpoint's proposal net place the N_samples budget (needs a
    # proposal-trained checkpoint; models/proposal.py)
    Np: int = 0
    # mip-NeRF cone-cast eval (anti-aliased; pairs with mip-trained
    # checkpoints but renders any NerfMLP checkpoint); mip_levels=2 adds
    # the paper's fine-level resampling pass (single shared MLP)
    mip: bool = False
    mip_levels: int = 1
    # interval-edge resampling floor (see TrainConfig.resample_blur) —
    # match the training value so eval places edges the same way
    resample_blur: float = 0.01
    # mip-NeRF 360 opaque background (see TrainConfig.opaque_background)
    # — match the training value: a field trained WITH the boundary
    # absorber parks background mass in the tail frustum and renders
    # holes without it
    opaque_background: bool = False
    # eval-side sampler spacing ("disparity" for contracted unbounded
    # checkpoints; the model's own contract field rides the sidecar)
    sampling_space: str = "linear"
    compute_dtype: str = "f32"
    backend: str = "xla"
    seed: int = 0
    orbit_radius: float = 4.0  # hardcoded r=4 at test.py:33
    dataset: str = "blender"
    llff_factor: int = 8
    ndc: bool = True
    # occupancy-informed eval sampling: rebuild the (derived) occupancy
    # grid from the loaded density field, then draw the N_samples budget
    # as deterministic quantiles of the grid PDF — same quality at a
    # fraction of the samples (ops/occupancy.py)
    occupancy: bool = False
    occ_R: int = 64
    occ_Nb: int = 64
    occ_floor: float = 0.01
    occ_aabb: float = 4.0
    # eval probe sharing: one grid probe per run of occ_group adjacent
    # pixel rays — divides the probe gather cost by the group. Default 1
    # (per-ray probes, exact); set 4 for cheap probes (~free on smooth
    # scenes, costs ~1 dB on thin-structure scenes where adjacent rays
    # straddle geometry — see docs/PERFORMANCE.md eval sweeps).
    occ_group: int = 1
    # data-parallel eval chips: render chunks sharded over the mesh data
    # axis (bit-identical to single-chip); 0/1 = single chip, -1 = all
    num_data_shards: int = 1
    # also render per-pixel surface normals (from density gradients —
    # render/renderer.py::render_normals_chunked) and save
    # normal_<i>.png beside each still. The reference LOADS GT normal
    # maps (dataload.py:38-40) but never consumes them; this produces
    # the predicted counterpart.
    normals: bool = False
    # appearance-embedding checkpoints (TrainConfig.appearance_dim > 0):
    # which train image's code conditions the render. -1 (default) = the
    # mean code — the NeRF-W "canonical appearance" for novel views;
    # >= 0 picks that train image's look.
    appearance_idx: int = -1

    def __post_init__(self):
        if self.Np > 0 and self.Nc > 0:
            raise ValueError(
                "Np > 0 (proposal-guided eval) and Nc > 0 (hierarchical "
                "eval) are alternative samplers; set at most one"
            )
        if self.mip and (self.Nc > 0 or self.occupancy):
            # Np composes with mip (the mip-NeRF 360 eval: proposal-
            # placed interval edges + IPE frustums, renderer.py
            # render_rays_proposal under settings.mip); Nc/occupancy
            # are point-resampling schemes with no interval form
            raise ValueError(
                "mip=True (cone-cast eval) draws its own interval edges; "
                "it excludes Nc/occupancy point-resampling (use Np for "
                "proposal-placed cone casting; mip_levels: 2 is the "
                "cone-cast hierarchical scheme)"
            )
        if self.mip and self.mip_levels == 2 and self.Np > 0:
            raise ValueError(
                "mip_levels=2 and Np > 0 both define the coarse level; "
                "pick one (the mip-NeRF 360 eval is Np > 0 with "
                "mip_levels=1)"
            )
        if self.mip_levels not in (1, 2):
            raise ValueError(
                f"mip_levels must be 1 or 2, got {self.mip_levels}"
            )
        if self.mip_levels == 2 and not self.mip:
            raise ValueError(
                "mip_levels=2 (coarse+fine cone casting) requires mip=True"
            )
        if self.sampling_space not in ("linear", "disparity"):
            raise ValueError(
                "sampling_space must be 'linear' or 'disparity', got "
                f"{self.sampling_space!r}"
            )
        if self.sampling_space == "disparity" and self.tn <= 0:
            raise ValueError(
                f"sampling_space='disparity' needs tn > 0 (bins are "
                f"uniform in 1/t); got tn={self.tn}"
            )
        if (
            self.sampling_space == "disparity"
            and self.dataset == "llff"
            and self.ndc
        ):
            raise ValueError(
                "sampling_space='disparity' with NDC is redundant (the "
                "NDC warp already makes linear-in-t linear-in-disparity) "
                "and its t-range starts at 0; use ndc: false"
            )
        if self.sampling_space == "disparity" and self.occupancy:
            raise ValueError(
                "sampling_space='disparity' is dead under occupancy "
                "(the occupancy grid redistributes LINEAR bins of "
                "[tn, tf]); drop one of the two"
            )

    @property
    def render_dtype(self):
        import jax.numpy as jnp

        return jnp.bfloat16 if self.compute_dtype == "bf16" else jnp.float32


# keys legitimately present in a full reference YAML but not fields of the
# config being built (train dicts carry the nested test section and vice
# versa) — never warn about these
_CROSS_SECTION_KEYS = {"test_params"}


def _filter_kwargs(cls, d: dict[str, Any]) -> dict[str, Any]:
    names = {f.name for f in dataclasses.fields(cls)}
    out = {}
    for k, v in d.items():
        if k in names:
            out[k] = tuple(v) if isinstance(v, list) else v
        elif k not in _CROSS_SECTION_KEYS:
            # a typo'd key (e.g. "heirarchical") silently reverting to a
            # default is a classic footgun — surface it loudly
            warnings.warn(
                f"unknown config key {k!r} ignored by {cls.__name__} "
                f"(check for typos; known keys: "
                f"{', '.join(sorted(names))})",
                stacklevel=3,
            )
    return out


def load_yaml(path: str) -> dict[str, Any]:
    with open(path) as fh:
        return yaml.load(fh, Loader=yaml.FullLoader)


def train_config_from_dict(params: dict[str, Any]) -> TrainConfig:
    """Build a TrainConfig from a reference-schema YAML dict (ignores the
    nested ``test_params`` section and unknown keys)."""
    return TrainConfig(**_filter_kwargs(TrainConfig, params))


def test_config_from_dict(params: dict[str, Any]) -> TestConfig:
    """Build a TestConfig from the ``test_params`` sub-dict (or a full
    reference dict containing one)."""
    if "test_params" in params:
        params = params["test_params"]
    return TestConfig(**_filter_kwargs(TestConfig, params))
