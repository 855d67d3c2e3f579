"""Configuration for the gdn-tpu framework.

The reference (tjqansthd/GDN-Pytorch) configures everything through
per-script argparse flags (SURVEY.md §2.13).  Here every knob lives in
one place as frozen dataclasses so that configs are hashable (usable as
jit static args), serializable, and overridable from the CLI wrappers in
``scripts/`` which mirror the reference's flag names.

NOTE ON PROVENANCE: the reference checkout is empty (SURVEY.md §0), so
details below the paper/BASELINE level — exact channel widths, loss
weights λ, activation choices — are *defensible defaults*, isolated
here and documented as assumptions to re-verify against the real repo.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


def _exec_field(default):
    """Execution-strategy field (kernel backends, custom VJPs, composed
    execution, compute dtype): changes no trained parameter and belongs
    to the CURRENT environment.  `cli.apply_saved_model_config` derives
    its keep-from-environment set from this metadata, so new fields
    self-classify instead of relying on a hand-maintained denylist
    (tests/test_cli.py asserts every ModelConfig field is categorized).
    """
    return dataclasses.field(default=default, metadata={"execution": True})


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture of the two-stage guided depth network.

    Both stages share an encoder/decoder skeleton (SURVEY.md §2.2/§2.3):
    the stage-1 D-net autoencodes depth; the stage-2 G-net encodes RGB
    and decodes through a (transferred) depth-domain decoder with
    multi-scale guidance feature fusion.
    """

    # Input resolution (H, W).  KITTI: (128, 416); NYU: (228, 304).
    image_size: Tuple[int, int] = (128, 416)
    # Encoder channel widths per scale; len == number of /2 downsamplings.
    # ASSUMPTION: widths follow the common DispNet-style doubling ladder.
    enc_channels: Tuple[int, ...] = (32, 64, 128, 256, 512)
    # Decoder channel widths, mirror of the encoder (latent -> full res).
    dec_channels: Tuple[int, ...] = (256, 128, 64, 32, 16)
    # Normalization: "group" is batch-size independent and multi-chip
    # friendly (no cross-device sync needed, unlike BatchNorm).
    norm: str = "group"
    group_norm_groups: int = 8
    # GroupNorm statistics formulation (ops/groupnorm.py): "chanreduce"
    # (single contiguous HW reduce + one-hot group matmul) or "grouped"
    # (reshape to (B,HW,G,C/G), reduce axes (1,3), two-pass variance).
    # The GN chains are the profiled per-step hot spot; chanreduce
    # measured +6.5% full-step throughput at B=128 (BASELINE.md).
    gn_impl: str = _exec_field("chanreduce")
    # Analytic custom-VJP GroupNorm+ELU (ops/groupnorm.py
    # group_norm_elu_analytic): forward bit-identical to chanreduce, but
    # the backward saves only the normalized tensor (not the conv output
    # + ELU pre-activation autodiff keeps) and needs just two
    # full-tensor reduces — built against the round-3 closing profile
    # (GN stats = 18.5 ms of the 63 ms step).  TPU-measured win:
    # stage-2 B=128 1908->1991 imgs/sec (+4.3%), two runs (BASELINE.md).
    gn_analytic_vjp: bool = _exec_field(True)
    # Activation inside conv blocks. ELU is standard in depth nets.
    activation: str = "elu"
    # Upsampling style: "resize_conv" (bilinear resize + conv) or
    # "deconv" (stride-2 conv_transpose — the reference's own style,
    # SURVEY §2.3).  History: round 3 flipped the default to deconv on
    # TINY-RES (32x64) convergence parity (a1 0.932 vs 0.927) at +36%
    # step throughput — but the round-4 OPERATING-RESOLUTION protocol
    # (128x416, B=32, 1500 steps/stage, 3 seeds; BASELINE.md "Full-res
    # convergence") reversed it decisively: resize_conv a1 0.9702 /
    # abs_rel 0.0638 / RMSE 1.163 vs deconv-bilinear 0.9323 / 0.0821 /
    # 1.441.  The accuracy contract (BASELINE.json north star: metrics
    # within 1%, THEN speed) picks resize_conv; deconv remains available
    # via --upsample deconv for the throughput-first regime.
    upsample: str = "resize_conv"
    # Composed resize_conv execution: run the resize_conv branch's
    # bilinear-2x + conv3x3 as ONE stride-2 conv_transpose with the
    # 6x6 kernel composed from the SAME 3x3 parameter each step, plus
    # an exact thin-slab edge correction (ops/resize.py
    # composed_resize_conv2x).  Same trained function and identical
    # checkpoints (exact to float rounding, fwd ~3e-6 / grads ~5e-7
    # rel) — just skips materializing the 4x-resized intermediate.
    # TPU A/B (two interleaved passes each, /tmp/ab_composed.py r4):
    # B=128 2166/2169 vs 1997/1988 imgs/sec (+8.8%), B=32 675/674 vs
    # 636/634 (+6.4%) — default ON (BASELINE.md round 4).
    resize_conv_composed: bool = _exec_field(True)
    # GroupNorm+activation epilogue on the deconv upsample branch.
    # Measured (round 3, BASELINE.md): costs ~9% step throughput (2494
    # vs 2731 imgs/sec at B=128) and does NOT close the deconv
    # convergence gap vs resize_conv (a1 0.785/0.858/0.843 over 3 seeds
    # vs 0.921) — the round-2 "missing norm" confound hypothesis is
    # answered negative.  Default off = the reference's own
    # deconv+activation style.
    deconv_gn: bool = False
    # Deconv kernel initialization: "lecun" (flax default on a 4x4
    # kernel) or "bilinear" — a 6x6 kernel composed as
    # bilinear-2x-upsample ∘ lecun-3x3-conv (ops/resize.py
    # compose_bilinear_deconv_kernel), so at init the deconv decoder
    # computes the SAME function as the resize_conv decoder on interior
    # pixels (no checkerboard).  Built to de-confound the deconv
    # convergence comparison (round-2/3 rejected deconv on a1; both
    # rejected variants started from checkerboard-prone random inits).
    # At tiny res it reached parity, but the full-res protocol still
    # favors resize_conv (see `upsample`); bilinear stays the default
    # INIT for anyone choosing --upsample deconv.
    deconv_init: str = "bilinear"
    # Output-form custom VJP for the deconv branch's bare ELU
    # (ops/elu.py): the backward derives elu' from the OUTPUT (y>0 ? 1
    # : y+1, exact), so the pre-activation is never materialized as a
    # residual — saves a feature-map HBM write+read per decoder scale.
    # TPU-measured on the stage-2 step (B=128, two interleaved A/B
    # pairs): on 2647.0/2641.0 vs off 2614.8/2535.9 imgs/sec (+1-4%),
    # neutral at B=32 — default on (BASELINE.md).
    elu_outform_vjp: bool = _exec_field(True)
    # Guidance fusion: how encoder-skip / guidance features enter the
    # decoder: "concat" (concat + conv) or "add".
    fusion: str = "concat"
    # Multi-scale depth heads: emit a depth prediction at every decoder
    # scale (coarse->fine) for multi-scale supervision (SURVEY §2.3
    # "possibly multi-scale outputs" — the DispNet-style scheme the
    # reference family trains with).  Off by default: the single-head
    # parameter tree stays round-2 checkpoint compatible.
    multiscale_heads: bool = False
    # Max depth in meters; the output head emits depth = sigmoid(x)*max_depth.
    max_depth: float = 80.0
    min_depth: float = 1e-3
    # Compute dtype for the conv stack (params stay float32).
    dtype: str = _exec_field("bfloat16")
    # Post-training int8 inference ("none" | "int8", ops/quant.py):
    # interior convs run s8 x s8 -> s32 on the MXU with per-channel
    # weight scales from the SAME fp32 param tree and static activation
    # scales calibrated by ops.quant.calibrate_quant (the "quant"
    # collection).  Deployment-time only: the step builders refuse it
    # (round has a zero gradient), the depth head stays fp32, and the
    # Pallas / composed execution paths are bypassed.  MEASURED
    # NEGATIVE for THIS model (BASELINE.md round 5: full forward
    # 0.88-0.97x of bf16 — quantize glue + int8 relayouts outweigh the
    # per-conv 1.5-2.9x win on an already bandwidth-bound net); ships
    # default-off as a tested capability for MXU-bound deployments.
    quant: str = _exec_field("none")
    # Partial quantization threshold: only conv sites whose INPUT
    # channel count is >= this run int8; shallower layers (large
    # feature maps, few channels — bandwidth-cheap convs but expensive
    # quantize passes) stay in the compute dtype.  0 quantizes every
    # interior conv.  Measured sweep in BASELINE.md round 5.
    quant_min_channels: int = _exec_field(0)
    # Use Pallas kernels for fused blocks where available.
    use_pallas: bool = _exec_field(True)
    # Fused fusion/upsample block kernels: TPU-validated correct but
    # MEASURED SLOWER than XLA convs at these channel widths (the
    # 128-lane padding tax; see BASELINE.md) — default off, kept as a
    # capability with equivalence tests.
    use_pallas_fusion: bool = _exec_field(False)
    # Fused GroupNorm+ELU kernel (kernels/groupnorm.py): one op per
    # layer instead of XLA's 3-4 latency-bound fusions — built against
    # the round-2 profile; default off until TPU-measured (CLAUDE.md
    # gating policy).
    use_pallas_gn: bool = _exec_field(False)
    # Epilogue-fused conv3x3+GN+ELU kernel (kernels/conv_gn_elu.py):
    # ONE op per ConvBlock instead of conv + 2 stat reduces + 2
    # elementwise fusions, one HBM write instead of three feature-map
    # round-trips.  Applies only to stride-1 lane-aligned blocks (the
    # deep encoder refining convs); default off until TPU-measured
    # (CLAUDE.md gating policy).
    use_pallas_convgn: bool = _exec_field(False)
    # v2 batch-tiled + column-packed + analytic-VJP variant
    # (kernels/conv_gn_elu.py fused_conv_gn_elu_bt): fixes the three
    # measured defects of v1 — per-image grid underfill (T images per
    # tap matmul), the 128-lane padding tax on narrow blocks (C<128 is
    # VIEWED as (H, W/p, p*C) with block-structured packed weights — a
    # free reshape, not a padded copy), and the recompute backward
    # (kernel emits (yn, inv) residuals; backward is the analytic
    # two-reduce GN+ELU pair + standard conv gradients).  Covers every
    # stride-1 refine conv in the ladder, including the C=32/64 blocks
    # that hold most of the GN stat bytes.  Default off until
    # TPU-measured (CLAUDE.md gating policy).
    use_pallas_convgn_bt: bool = _exec_field(False)
    # Batch tile T for the bt kernel; pick_batch_tile caps it to VMEM.
    convgn_bt_tile: int = _exec_field(8)
    # Stride-2 sibling (kernels/conv_gn_elu.py fused_conv_gn_elu_s2):
    # covers the DownBlock stride-2 convs — the other half of the
    # encoder GN stat bytes (with the deconv decoder default the
    # encoder IS the GN budget).  Stride 2 rides the same packed view:
    # W via an even input pack P (output packed by P/2), H via a free
    # (2M, W') -> (M, 2W') row-pair-into-columns reshape, so all six
    # taps stay static ref slices.  Default off until TPU-measured
    # (CLAUDE.md gating policy).
    use_pallas_convgn_s2: bool = _exec_field(False)
    # Batch-tiled fused FusionBlock (kernels/fusion_bt.py): the decoder
    # half of the producer-fusion campaign.  concat(x, lateral) -> conv
    # -> GN -> ELU runs as ONE op with the concat never materialized
    # (split-weight tap accumulation) and the analytic (yn, inv)
    # backward.  With the deconv decoder default the FusionBlocks hold
    # ALL decoder GN stats.  Default off until TPU-measured (CLAUDE.md
    # gating policy).
    use_pallas_fusion_bt: bool = _exec_field(False)

    @property
    def num_scales(self) -> int:
        return len(self.enc_channels)

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Loss weights (SURVEY.md §2.4).

    total = w_recon * L1(pred, gt)
          + w_grad  * L1(∇pred, ∇gt)
          + w_ssim  * (1 - SSIM(pred, gt)) / 2
          + w_latent * feature-matching(G latent, D latent)   [stage 2]

    ASSUMPTION: λ values are unpinned by the empty reference; defaults
    chosen to put the terms on comparable scales for metric depth.
    """

    w_recon: float = 1.0
    w_grad: float = 1.0
    w_ssim: float = 0.5
    w_latent: float = 0.1
    # SSIM window (Gaussian, 11x11, sigma 1.5 — the standard protocol).
    ssim_window: int = 11
    ssim_sigma: float = 1.5
    # MXU precision of the SSIM Gaussian blurs: "default" (1 bf16-
    # mantissa pass), "high" (3), "highest" (6 ≈ full fp32).  Inputs are
    # [0,1]-normalized so all modes are clamped/stable; measured
    # (BASELINE.md): default errs 8.5e-5 abs vs fp64, +4.7% step
    # throughput, and a full-res 600-step two-stage TPU run at default
    # stayed NaN-free with decreasing loss — hence the default.
    ssim_precision: str = "default"
    # Gradient loss computed at this many pyramid scales (>=1).
    grad_scales: int = 4
    # Weight of the multi-scale depth supervision term (masked L1 per
    # coarse head, scale k weighted 1/2^k), active only when the model
    # emits scale predictions (ModelConfig.multiscale_heads).
    w_scales: float = 0.5
    # Use the fused Pallas loss-reduction kernel when on TPU.
    use_pallas: bool = True


@dataclasses.dataclass(frozen=True)
class DataConfig:
    dataset: str = "kitti"  # "kitti" | "nyu" | "synthetic"
    data_path: str = ""
    train_list: str = "train.txt"
    val_list: str = "val.txt"
    batch_size: int = 32  # global batch (split across the mesh)
    num_workers: int = 4
    # Host loader implementation for KITTI training: "native" (threaded
    # C++/PIL decode, data/kitti.py) or "grain" (index-sampled grain
    # pipeline with worker processes and checkpointable iterator state,
    # data/grain_loader.py — the SURVEY §2.1 grain host-decode plan).
    loader: str = "native"
    # Grain decode worker PROCESSES (--workers).  0 = in-process (the
    # right default on this 1-CPU container); >0 enables multiprocess
    # decode on real hosts.  Resume with workers>0 rides the exact
    # grain iterator state checkpointed in the orbax payload
    # (state_dict_at / checkpoint.load_loader_state) — seek() only
    # supports the single in-process index stream.
    grain_workers: int = 0
    # Training-input H2D wire format.  "auto" (default): the host
    # loaders ship the PNG payloads' own dtypes — uint8 RGB and uint16
    # depth counts — and the decode (/255, /scale, clip, validity mask)
    # runs inside the on-device pipeline: 4x fewer upload bytes at the
    # B=128 operating point (~0.85 MB/img -> 0.21 MB).  Lossless for
    # the PIL RGB path (PIL resizes in the uint8 domain) and for
    # 16-bit-PNG depth sources; the native-decoder's antialiased float
    # RGB quantizes by <=1/510 (below the default color-jitter
    # amplitude) and float .npy depth by <=0.5/scale m.  "f32" keeps
    # the round-2 host-side conversion.
    train_wire: str = "auto"  # "auto" | "f32"
    # KITTI calibration directory (calib_cam_to_cam.txt /
    # calib_velo_to_cam.txt) for eval lists whose GT entries are raw
    # velodyne .bin scans (data/velodyne.py projection).  Empty: only
    # PNG/npy GT is usable.
    calib_dir: str = ""
    # On-device augmentation (jitted; SURVEY.md §2.1 TPU-native plan).
    random_flip: bool = True
    random_crop: bool = True
    color_jitter: bool = True
    jitter_strength: float = 0.2
    # Scale-crop augmentation range (resize by s then crop back).
    scale_range: Tuple[float, float] = (1.0, 1.15)
    prefetch: int = 2
    # Decoded-sample cache directory (data/cache.py): epoch 1 decodes
    # and persists wire-dtype samples to flat memmaps; later epochs are
    # served at memcpy speed (the tf.data .cache() analogue, for
    # corpora that fit local disk).  Native-loader datasets only
    # (kitti/nyu); "" disables.  Measured on the 1-CPU container:
    # 168 -> >1000 host imgs/sec (BASELINE.md round 4).
    decode_cache: str = ""
    # Device-resident dataset cache (data/device_cache.py): decode the
    # whole corpus once, upload the wire-dtype tensors to HBM once, and
    # serve every batch as a device-side gather — per-step H2D shrinks
    # to the (B,) index array.  For corpora that fit the 2 GiB resident
    # gate (e.g. 1500 KITTI-shaped pairs = 400 MB); identical sample
    # order/seek semantics to the wrapped loader.  Measured: removes
    # the tunnel-H2D pipeline ceiling entirely (BASELINE.md round 4).
    device_cache: bool = False
    # Shard the device-resident corpus over the mesh's data axis
    # (data/device_cache.py::ShardedDeviceDataset): each device holds
    # 1/D of the corpus and gathers its batch shard locally via
    # shard_map, so the resident gate scales with the mesh (real KITTI
    # ~40k pairs = 10.6 GiB fits at D>=6 where the replicated cache
    # refuses).  Sample order becomes per-shard (multihost-pipeline
    # semantics); requires a 1-D data mesh.
    device_cache_sharded: bool = False


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    mode: str = "DtoD"  # "DtoD" (stage 1) | "RtoD" (stage 2)
    epochs: int = 50
    lr: float = 1e-4
    # Adam betas/eps mirror the reference's torch.optim.Adam defaults.
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    weight_decay: float = 0.0
    # LR schedule shape: "step" (the reference's lr * gamma every
    # decay_epochs), "cosine" (cosine decay to 0 over the full run —
    # the modern default for fixed-length production runs), or
    # "constant".  All compose with warmup_steps/grad_accum.
    schedule: str = "step"
    # Step-decay schedule: lr * gamma every `decay_epochs`.
    decay_epochs: int = 20
    decay_gamma: float = 0.5
    grad_clip: Optional[float] = None
    # Linear LR warmup over the first N optimizer steps (0 = off):
    # 0 -> lr, then the step-decay schedule takes over (shifted by N).
    # The reference had no warmup; standard production stabilizer for
    # large-batch runs (the B=128+ operating points this framework
    # targets need it more than the reference's GPU batches did).
    warmup_steps: int = 0
    # Accumulate gradients over N micro-batches before each optimizer
    # update (optax.MultiSteps, outermost so clipping/Adam see the
    # averaged gradient).  Lets a memory-constrained chip train at an
    # effective batch of N * batch_size; the LR schedule counts real
    # updates, TrainState.step counts micro-steps (data consumed).
    grad_accum: int = 1
    # Exponential moving average of the params (Polyak averaging),
    # updated after every optimizer step: ema = d*ema + (1-d)*params.
    # None = off.  EMA params ride the TrainState/checkpoint payload
    # and can be selected at eval/demo/export time (--use_ema).
    ema_decay: Optional[float] = None
    # Run the optimizer on a single flattened parameter vector
    # (optax.flatten): Adam over 65 small leaves costs ~65 latency-bound
    # fusions per step; one fused vector op replaces them.
    flatten_optimizer: bool = False
    # Rematerialize the trained net's forward in the backward pass
    # (jax.checkpoint): trades recompute FLOPs (MXU has headroom) for
    # activation HBM traffic (the measured bottleneck past B~128).
    remat: bool = False
    # jax.checkpoint_policies name used when remat is on.
    remat_policy: str = "nothing_saveable"
    # Stage 2: freeze the transferred decoder (optax.masked zero-updates).
    freeze_decoder: bool = True
    # Stage 2: run the (shared, frozen) decoder ONCE on the
    # batch-concatenated D+G encoder outputs instead of once per net —
    # halves the decoder's op count, which the round-2 profile showed
    # is latency-bound (~85 µs/op), with bit-identical math (GroupNorm
    # is per-sample; the transferred decoder params are frozen, so both
    # nets' decoders stay equal).  Requires freeze_decoder.  Default
    # off until TPU-measured (CLAUDE.md gating policy).
    # Measured (BASELINE.md): +9.1% at B=32 (latency regime), -21% at
    # B=128 (the g-half slice backward widens to 2B) — small-batch tool.
    fused_guidance: bool = False
    # Hand-written VJP for the fused_guidance shared-decoder pass
    # (train/guided_decoder.py): the backward recomputes only the g-half
    # forward (B-wide) instead of differentiating the 2B-wide decoder.
    # MEASURED NEGATIVE (BASELINE.md): no gain at B=128 (1554 vs 1542 —
    # the frozen decoder's weight grads were already DCE'd, so
    # input-bwd(2B) == recompute(B)+bwd(B) in FLOPs) and -18% at B=32
    # (the extra recompute ops land in the latency-bound regime).  Kept
    # as an equivalence-tested capability; it also halves the fused
    # decoder's saved-residual memory (a remat-flavored knob).
    fused_guidance_vjp: bool = False
    # Additionally run BOTH encoder ladders as one channel-grouped conv
    # ladder (train/fused_encoders.py): halves the encoder op count on
    # top of fused_guidance's decoder sharing.  Requires fused_guidance.
    fused_encoders: bool = False
    seed: int = 0
    # NaN/Inf guard on loss terms every step (utils/guards.GuardedStep);
    # adds a host sync per step — debug tool, off in production.
    check_numerics: bool = False
    log_every: int = 50
    ckpt_dir: str = "checkpoints"
    keep_ckpts: int = 3
    # Async (overlapped) orbax checkpointing: the per-epoch save returns
    # as soon as the payload is snapshotted and the serialization/write
    # runs in a background thread while the next epoch trains (SURVEY §5
    # checkpoint/resume row: "orbax async ckpt + resume").  The training
    # loops place a wait_for_checkpoints barrier on exit AND on the
    # preemption path, so every save is durable before the process ends.
    async_ckpt: bool = True
    # Steps per epoch when the dataset is synthetic/unbounded.
    steps_per_epoch: int = 1000
    # Optimizer steps fused into ONE jitted call (lax.scan over stacked
    # batches).  >1 amortizes per-dispatch host latency — the measured
    # ~50 ms batch-independent step cost (BASELINE.md) — at the price of
    # K batches resident on device.  Must divide steps_per_epoch.
    steps_per_call: int = 1


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    # Depth caps: KITTI evaluated at 50 m and 80 m, NYU at 10 m
    # (SURVEY.md §2.5).
    cap: float = 80.0
    # Crop applied to KITTI predictions/GT: "garg" | "eigen" | "none".
    crop: str = "garg"
    # Median scaling is OFF for the supervised protocol (SURVEY.md §2.7).
    median_scaling: bool = False
    batch_size: int = 1
    # Host->device wire format for the raw-resolution GT batch — the
    # harness's dominant transfer (~1.86 MB/image at KITTI raw res as
    # fp32, measured as the end-to-end bottleneck on remote-attached
    # chips, BASELINE.md).  "u16" ships round(gt*256) uint16 counts and
    # decodes on device: EXACT for KITTI GT (the 16-bit-PNG /256
    # encoding it was loaded from), <=1/512 m quantization otherwise,
    # range 256 m; 4x fewer bytes.  "f32" (default) keeps the
    # bit-exact-protocol contract for arbitrary float GT.
    gt_wire: str = "f32"  # "f32" | "u16"
    # Wire format for the eval RGB batch.  "auto" uploads bfloat16
    # whenever the model computes in bfloat16 — bit-identical results
    # (the conv stack's first op is the same cast) at half the bytes —
    # and fp32 otherwise; "f32" forces fp32.
    rgb_wire: str = "auto"  # "auto" | "f32"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh (SURVEY.md §2.10/§2.11): batch sharded on axis
    "data", params replicated, gradients psum'd over ICI by XLA.

    ``spatial_devices > 1`` adds a second mesh axis "spatial" that
    shards the image HEIGHT dim of every batch leaf — XLA's SPMD
    partitioner inserts the conv halo exchanges and the GN/loss
    statistic all-reduces (parallel/mesh.py).  Use it to train
    resolutions whose activations exceed one chip's HBM even at
    batch 1; it composes with data parallelism (device count =
    data x spatial).  The Pallas loss kernel has no SPMD rule, so
    spatial steps route through the jnp loss path automatically.

    ``model_devices > 1`` adds a "model" mesh axis carrying TENSOR
    PARALLELISM: every parameter's output-channel dim shards across it
    (Megatron-style column parallel for convs), activations stay
    channel-sharded between layers, and XLA SPMD inserts the
    all-gathers/psums (parallel/mesh.py tensor_parallel_spec).
    ``fsdp=True`` instead shards every parameter (+ its Adam/EMA
    mirrors) over the existing "data" axis — ZeRO-3 semantics: weights
    all-gather at use, gradients reduce-scatter.  Both are pure
    placement changes (same math, same checkpoints) that divide
    per-device parameter+optimizer memory by the axis extent; they are
    mutually exclusive."""

    data_axis: str = "data"
    num_devices: int = 0  # 0 = all available
    spatial_devices: int = 1  # 1 = pure data-parallel (no spatial axis)
    model_devices: int = 1  # >1 = tensor parallelism over a "model" axis
    fsdp: bool = False  # shard params/opt/EMA over "data" (ZeRO-3)


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)


def kitti_config(**overrides) -> Config:
    """KITTI 128x416, cap 80 m (BASELINE configs 1-3, 5)."""
    model = ModelConfig(image_size=(128, 416), max_depth=80.0)
    return _with(Config(model=model), **overrides)


def nyu_config(**overrides) -> Config:
    """NYU Depth v2 228x304, cap 10 m (BASELINE config 4)."""
    model = ModelConfig(image_size=(228, 304), max_depth=10.0)
    cfg = Config(
        model=model,
        data=DataConfig(dataset="nyu"),
        eval=EvalConfig(cap=10.0, crop="none"),
    )
    return _with(cfg, **overrides)


def _with(cfg: Config, **overrides) -> Config:
    """Apply dotted overrides, e.g. _with(cfg, **{"train.lr": 3e-4})."""
    for key, value in overrides.items():
        parts = key.split(".")
        if len(parts) == 1:
            cfg = dataclasses.replace(cfg, **{parts[0]: value})
        else:
            sub = getattr(cfg, parts[0])
            sub = dataclasses.replace(sub, **{parts[1]: value})
            cfg = dataclasses.replace(cfg, **{parts[0]: sub})
    return cfg
