"""Configuration dataclasses (TPU-native replacement for ref:config.py).

The reference keeps a flat module of constants (paths, LRs, crop size,
embedding dim, GPU ids — SURVEY.md C1). We use frozen dataclasses so configs
are hashable and can be closed over by `jax.jit` as static arguments.

Static-shape policy (TPU): object count, round count, and spatial dims are
*padded to fixed buckets* so that every jitted function compiles once.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Model dims (SURVEY.md §3.2)."""

    # Backbone: resnet stage depths. (3, 4, 23, 3) == ResNet-101 (reference
    # backbone, ref:networks/deeplab/backbone/resnet.py); (2, 2, 2, 2) is a
    # tiny variant used by the test-suite.
    backbone_depths: Tuple[int, ...] = (3, 4, 23, 3)
    backbone_width: int = 64
    output_stride: int = 16          # dilated stage-4, DeepLabV3+ standard
    aspp_channels: int = 256
    # 128 (not DeepLab's 256): the object-folded decoder heads replicate
    # these activations per object, and the heads are HBM-bandwidth-bound
    # on TPU — halving the width halves the whole propagation head's
    # wall-clock (measured on v5e; see models/heads.ConvStack).
    decoder_channels: int = 128
    low_level_channels: int = 48     # DeepLabV3+ low-level projection
    embedding_dim: int = 100         # pixel-embedding dim (ref uses ~100-d)
    # Kernel-facing embedding dim: embeddings are zero-padded to a lane
    # multiple so the Pallas matching kernel sees aligned tiles.
    embedding_dim_padded: int = 128
    feature_stride: int = 4          # final feature map stride (FEELVOS lineage)
    head_channels: int = 128
    ma_channels: int = 128           # interaction-feature / memory channels
    norm: str = "gn"                 # backbone/encoder norm: "gn" | "bn" | "syncbn" | "frozen"
    # decoder-head norm. "gn" default (measured fastest on v5e: per-pixel
    # LayerNorm's lane-wise reductions cost ~30% of round fps).
    head_norm: str = "gn"
    gn_groups: int = 32
    dtype: str = "bfloat16"          # activations; params stay float32

    # Matching (SURVEY.md C3/C4)
    local_window: int = 15           # max displacement at matching resolution
    local_downsample: int = 2        # downsample factor for local matching
    max_objects: int = 8             # padded object bucket, EXCLUDING background
    # Distances >= this are "wrong label" sentinels
    # (ref:networks/IntVOS.py WRONG_LABEL_PADDING_DISTANCE, expected).
    wrong_label_padding_distance: float = 1e8

    def __post_init__(self):
        # The DeepLabV3+ decoder output is architecturally stride-4
        # (SURVEY.md §3.2); every engine sizes its state grids at
        # H/4 x W/4 while scribble downsampling reads this field — a
        # different value would silently desynchronize them.
        if self.feature_stride != 4:
            raise ValueError(
                f"feature_stride={self.feature_stride}: the decoder is "
                "architecturally stride-4; this knob documents the "
                "constant, it cannot retune the architecture")


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparams (SURVEY.md C17/C18, ref:train_stage*.py)."""

    crop_size: Tuple[int, int] = (416, 416)
    batch_size: int = 8              # global batch across the data mesh axis
    total_steps: int = 100_000
    base_lr: float = 7e-3
    backbone_lr_scale: float = 0.1   # heads learn faster than the backbone
    momentum: float = 0.9
    weight_decay: float = 1e-4
    poly_power: float = 0.9          # (1 - step/total)^power LR decay
    bootstrap_ratio: float = 0.25    # top-k fraction for bootstrapped CE
    bootstrap_warmup_steps: int = 20_000  # anneal 1.0 -> bootstrap_ratio
    seed: int = 0
    # Rematerialize each sample's 3-frame forward in stage 1 (backward
    # recomputes activations instead of storing them across the whole
    # per-device batch): batch 4 @ 416^2 needs 23.6G of activations on a
    # 15.75G v5e without it. ~+1/3 FLOPs, measured cheaper than the HBM
    # it frees (docs/BENCHMARKS.md training table). Stage 2 remats per
    # simulated round instead (train_stage2.py).
    remat: bool = True
    # Frames per checkpointed encoder chunk in the batched encoder
    # (train_stage1.encode_batch): the whole device batch's B*3 frames
    # run as one conv batch, rematted in chunks of ~this many frames so
    # the backward recompute stays under HBM. 0 = no chunking.
    remat_chunk: int = 6
    # Stage-2 (interaction + memory aggregation) round simulation
    stage2_rounds: int = 3
    # Thread the per-frame global-map MIN-FUSION memory (SURVEY.md C8)
    # through the simulated rounds, exactly as the evaluator does across
    # real rounds. This was the round-3 hypothesis for why reference
    # semantics (gmap_refresh=0) lost to ablation on entering-object
    # tasks; round 4 MEASURED it and it is wrong twice over
    # (docs/QUALITY.md round-4 study): (a) churn-aligned stage-2 data
    # alone recovers the refresh=0 win (+0.048 AUC over ablation), and
    # (b) threading the memory through training collapses eval AUC
    # 0.413 -> 0.250 on the same task despite LOWER train loss — the
    # min-fused maps leak earlier simulated rounds' answers, so the
    # model under-trains the matching path it needs at eval. Default
    # False = the reference's stage-2 semantics; the knob stays for
    # ablation reproduction.
    stage2_gmap_memory: bool = False
    log_every: int = 50
    checkpoint_every: int = 2000


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """DAVIS interactive protocol parameters (SURVEY.md §1, C20)."""

    image_size: Tuple[int, int] = (480, 854)   # DAVIS 480p
    # Features are computed on the image padded to a stride-multiple.
    pad_to: int = 16
    max_interactions: int = 8
    scribble_sets: int = 3
    # Per-(sequence x scribble-set) wall-clock budget in seconds, scaled by
    # the sequence's object count (davisinteractive `max_time` semantics:
    # a session item stops when EITHER max_interactions or
    # max_time * n_objects is reached). None = no time limit.
    max_time: float | None = None
    metric_at_seconds: float = 60.0            # J&F @ 60 s report point
    max_frames: int = 104                      # largest frame bucket (longest DAVIS val seq ~100)
    # Padded frame-axis buckets: a sequence compiles/runs in the smallest
    # bucket that fits, so short sequences don't pay the max_frames-step
    # round scan. Each bucket must divide by the 8-frame extraction chunk
    # (or be < 8). One cached round compilation per (frame, object) bucket.
    frame_buckets: Tuple[int, ...] = (16, 32, 64, 104)
    # "min_fused": per-frame elementwise-min global-map memory (MANet
    # semantics, SURVEY.md C8). "stacked": literal matching against ALL
    # stored rounds' annotated pixels (BASELINE config 3/5).
    matching_memory: str = "min_fused"
    # Leaky min-fusion: before each round, stored global-map minima relax
    # toward 1.0 by this fraction (d -> 1 - (1-d)*(1-refresh)). 0.0 =
    # reference semantics (minima persist forever); 1.0 = fresh maps
    # every round (isolates C8 from the MA gate C7, which ablate_memory
    # removes together). Motivation (docs/QUALITY.md): on tasks where
    # objects ENTER mid-video, background minima recorded before an
    # object's entry persist at its future locations and can outweigh
    # the memory's benefit — a property of hard min-fusion itself.
    gmap_refresh: float = 0.0
    # Mask readback stride: probabilities are bilinearly upsampled to
    # image_resolution/mask_stride on device, argmaxed, and the label map
    # is nearest-expanded on the host. 1 = exact full-resolution argmax
    # (default; protocol fidelity). 2 quarters device->host mask traffic
    # (~10 ms/frame over this sandbox's TPU tunnel) and only moves labels
    # inside the model's own low-confidence boundary band (pinned by
    # tests) — opt-in for latency-sensitive serving.
    mask_stride: int = 1
    # Interactive-round pipelining: the propagation sweep is split into
    # this many dispatches (geometrically growing spans) so each segment's
    # packed-mask download overlaps the next segment's compute
    # (device->host rides a slow link). 1 = monolithic round (one
    # dispatch). Segmented and monolithic rounds compute identical masks
    # (pinned by tests). Measured on the sandbox tunnel @16 frames:
    # 1 -> 52 fps, 3 -> 70-77, 5 -> 85 (docs/BENCHMARKS.md).
    round_segments: int = 5


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout (SURVEY.md §3.3).

    The reference's only parallelism is single-node DataParallel + SyncBN
    (ref:networks/deeplab/sync_batchnorm/). TPU-native we use a 2-D
    jax.sharding.Mesh:
      - 'data'    : batch sharding for training (DP)
      - 'context' : memory-pixel sharding for global matching at scale
                    (CP; partial min maps combined with an all-reduce-min)
    """

    data_axis: str = "data"
    context_axis: str = "context"
    data_parallel: int = 1
    context_parallel: int = 1


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = ModelConfig()
    train: TrainConfig = TrainConfig()
    eval: EvalConfig = EvalConfig()
    mesh: MeshConfig = MeshConfig()
    davis_root: str = "/data/DAVIS"
    snapshot_dir: str = "snapshots"


def tiny_test_config() -> Config:
    """Small everything — CPU-runnable in tests (BASELINE config 1)."""
    return Config(
        model=ModelConfig(
            backbone_depths=(1, 1, 1, 1),
            backbone_width=16,
            aspp_channels=32,
            decoder_channels=32,
            low_level_channels=8,
            embedding_dim=16,
            embedding_dim_padded=16,
            head_channels=32,
            ma_channels=32,
            gn_groups=4,
            local_window=2,
            local_downsample=1,
            max_objects=2,
            dtype="float32",
        ),
        train=TrainConfig(crop_size=(32, 32), batch_size=2, total_steps=10),
        eval=EvalConfig(image_size=(32, 48), max_frames=4),
    )
