"""Typed configuration tree with named presets.

The reference scatters argparse flags across per-script entry points (SURVEY.md
§6 "Config / flag system"); here a single dataclass tree covers
data/preprocess/model/train/mesh, and every BASELINE.json config (1-5) is a
named preset. CLI scripts apply ``key=value`` dotted overrides.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, fields, is_dataclass
from typing import Any


@dataclass
class PreprocessConfig:
    """Video -> mouth-ROI preprocessing (ref: dlib/OpenCV stages, BASELINE.json:5)."""

    roi_size: int = 96            # output ROI is roi_size x roi_size grayscale
    roi_margin: float = 0.30      # mouth bbox expansion factor before square-crop
    normalize_mean: float = 0.421  # gray in [0,1] -> (x - mean) / std
    normalize_std: float = 0.165
    detector_input: int = 64      # face detector input resolution (square)
    ert_cascades: int = 10        # ERT landmark cascade stages
    ert_trees: int = 96           # boosted trees per cascade (parallel-friendly)
    ert_depth: int = 4            # split depth per tree (2^d leaves)
    ert_pool: int = 128           # candidate feature pixels per cascade
    # "ert" (default; oracle-paired, golden-dump anchor) or "conv" (the
    # distilled convnet, ops/landmarker.py — faster on the MXU; pass its
    # weights where the ERT model normally goes)
    landmarker: str = "ert"
    # ROI crop-box coordinates: "round" = integer rounding (bit-parity with
    # the reference's integer slicing — the ERT/golden contract), "subpixel"
    # = sample at the float mouth box (landmark noise moves the crop
    # smoothly instead of flipping round_box's integer knife edges),
    # "auto" = subpixel whenever landmarker != "ert" (the conv path has no
    # rounding contract and its sub-px error otherwise flips boxes on ~half
    # the frames — the source of its residual transcript errors).
    roi_sampling: str = "auto"


@dataclass
class DataConfig:
    fps: float = 25.0
    frame_height: int = 160
    frame_width: int = 160
    frames_per_char: int = 4      # synthetic fixture speech rate
    max_frames: int = 128         # T bucket ceiling (static-shape padding)
    max_chars: int = 40           # L bucket ceiling incl. sos/eos
    time_buckets: tuple[int, ...] = (32, 64, 96, 128)
    batch_size: int = 8


@dataclass
class ModelConfig:
    # 3D-CNN visual frontend (ref: LCANet-style Conv3d stack, SURVEY.md §3).
    # frontend="patchify" swaps in the MXU-shaped tubelet-embed stem
    # (models/frontend3d.patchify_init — round-3 MFU work); "conv3d" is the
    # reference-shaped stack and stays the importer/parity anchor.
    frontend: str = "conv3d"
    frontend_channels: tuple[int, ...] = (32, 64, 96)
    frontend_dim: int = 256       # feature dim fed to the encoder
    patch_size: int = 8           # patchify stem: space-to-depth patch edge
    patch_dim: int = 256          # patchify stem: embed/conv channel width
    # per-FRAME GroupNorm statistics in the frontend: pad-bucket- and
    # streaming-window-invariant features (models/nn.groupnorm docstring).
    # Default off — the reference-shaped (torch-parity) behavior pools
    # stats over time, padded frames included; weights trained one way must
    # be decoded the same way.
    framewise_norm: bool = False
    highway_layers: int = 2
    # bi-GRU encoder (ref: nn.GRU bidirectional)
    gru_hidden: int = 256
    gru_layers: int = 2
    # attention decoder (ref: AttnDecoder-style GRU + Bahdanau)
    attn_dim: int = 128
    decoder_hidden: int = 256
    # transformer encoder-decoder (ref: nn.Transformer-style path)
    tf_layers: int = 4
    tf_dec_layers: int = 4
    tf_dim: int = 256
    tf_heads: int = 4
    tf_mlp: int = 1024
    dropout: float = 0.1
    vocab_size: int = 31
    dtype: str = "bfloat16"       # activation dtype on TPU; params stay fp32
    # Pallas flash attention for the encoder's self-attention: O(T*Dh)
    # memory instead of materializing [B, H, T, T] scores (ops/flash_
    # attention.py). Same math (parity test-pinned); enable for long clips.
    flash_attention: bool = False
    # Backward policy for the flash kernel: "auto" (einsum remat below
    # T=2048, Pallas two-pass pair above), "xla", "pallas", or "fused"
    # (single-sweep dq+dk+dv — falls back to the pair above its VMEM cap).
    flash_bwd: str = "auto"


@dataclass
class TrainConfig:
    seed: int = 0
    learning_rate: float = 3e-4
    warmup_steps: int = 200
    total_steps: int = 5000
    weight_decay: float = 1e-4
    grad_clip: float = 5.0
    teacher_forcing: float = 1.0
    ctc_weight: float = 1.0       # hybrid CTC/attention loss mix
    att_weight: float = 0.0
    checkpoint_every: int = 500
    eval_every: int = 500
    log_every: int = 50
    beam_width: int = 8
    length_penalty: float = 0.6   # GNMT-style; 0 disables length norm
    max_decode_len: int = 48
    remat: bool = False           # jax.checkpoint the frontend to save HBM
    # train-time ROI appearance augmentation strength (0 disables): per-
    # sample gain/bias jitter + pixel noise on the normalized ROIs. Added
    # round 3 for the patchify stem, whose non-overlapping patch embed is
    # more appearance-sensitive than the conv stack's overlapping 5x5s.
    roi_augment: float = 0.0


@dataclass
class MeshConfig:
    """DP-over-ICI mesh (BASELINE config 5). Axes beyond 'data' are plumbed
    through so tensor-parallel sharding of the transformer can be enabled
    without code changes (SURVEY.md §3 parallelism table)."""

    data_axis: str = "data"
    model_axis: str = "model"
    data_parallel: int = -1       # -1: use all devices
    model_parallel: int = 1
    # When True, the ``model`` mesh axis shards the encoder TIME axis (ring
    # attention over ICI, parallel/ring.py) instead of transformer weights
    # (tensor parallelism). Mutually exclusive uses of the same axis:
    # sequence_parallel=True means params stay replicated over that axis.
    sequence_parallel: bool = False
    # When True, the ``model`` axis carries GPipe pipeline STAGES instead
    # (parallel/pipeline.py): encoder layers split into model_parallel
    # contiguous stages, activations ppermute stage-to-stage. Third
    # exclusive use of the axis; params also stay replicated over it.
    pipeline_parallel: bool = False
    pipeline_microbatches: int = 0  # 0: one microbatch per stage


@dataclass
class Config:
    name: str = "default"
    data: DataConfig = field(default_factory=DataConfig)
    preprocess: PreprocessConfig = field(default_factory=PreprocessConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    encoder: str = "bigru"        # "bigru" | "transformer"
    decoder: str = "ctc"          # "ctc" | "attention" | "hybrid"

    def override(self, **dotted: Any) -> "Config":
        """Apply dotted-path overrides, e.g. ``override(**{"train.seed": 3})``."""
        cfg = dataclasses.replace(self)
        for key, value in dotted.items():
            parts = key.split(".")
            obj = cfg
            for p in parts[:-1]:
                child = dataclasses.replace(getattr(obj, p))
                setattr(obj, p, child)
                obj = child
            leaf = parts[-1]
            if not hasattr(obj, leaf):
                raise KeyError(f"no config field {key!r}")
            cur = getattr(obj, leaf)
            if cur is not None and not isinstance(value, type(cur)):
                value = _coerce(value, cur)
            setattr(obj, leaf, value)
        return cfg

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


def from_dict(d: dict) -> Config:
    """Rebuild a Config from to_dict() output (workdir/config.json)."""
    def build(cls, sub):
        kwargs = {}
        for f in fields(cls):
            if f.name not in sub:
                continue
            v = sub[f.name]
            if is_dataclass(f.type) if isinstance(f.type, type) else False:
                kwargs[f.name] = build(f.type, v)
            elif isinstance(v, list):
                kwargs[f.name] = tuple(v)
            else:
                kwargs[f.name] = v
        return cls(**kwargs)

    cfg = Config(
        name=d.get("name", "default"),
        data=build(DataConfig, d.get("data", {})),
        preprocess=build(PreprocessConfig, d.get("preprocess", {})),
        model=build(ModelConfig, d.get("model", {})),
        train=build(TrainConfig, d.get("train", {})),
        mesh=build(MeshConfig, d.get("mesh", {})),
        encoder=d.get("encoder", "bigru"),
        decoder=d.get("decoder", "ctc"),
    )
    return cfg


def load_workdir_config(workdir: str) -> Config | None:
    """Load the config snapshot a Trainer wrote, if present."""
    import json
    import os

    path = os.path.join(workdir, "config.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return from_dict(json.load(f))


def _coerce(value: Any, like: Any) -> Any:
    t = type(like)
    if t is bool:
        return str(value).lower() in ("1", "true", "yes")
    if t is tuple:
        items = str(value).strip("()[] ").split(",")
        elem = type(like[0]) if like else int
        return tuple(elem(i) for i in items if i.strip())
    return t(value)


def parse_overrides(argv: list[str]) -> dict[str, str]:
    """['train.seed=3', ...] -> {'train.seed': '3', ...}"""
    out = {}
    for a in argv:
        if "=" not in a:
            raise ValueError(f"override must be key=value, got {a!r}")
        k, v = a.split("=", 1)
        out[k] = v
    return out


# --- Named presets: one per BASELINE.json config (the acceptance ladder) ---

def preset(name: str) -> Config:
    presets = {
        # config 1: single-clip CPU oracle preprocess, deterministic dump
        "oracle-single-clip": Config(name="oracle-single-clip"),
        # config 2: batched fused preprocessing kernels, parity vs oracle
        "preprocess-batched": Config(name="preprocess-batched"),
        # config 3: 3D-CNN + bi-GRU + greedy CTC
        "bigru-ctc": Config(name="bigru-ctc", encoder="bigru", decoder="ctc"),
        # config 4: transformer enc-dec + attention + beam search
        "transformer-attn": Config(
            name="transformer-attn",
            encoder="transformer",
            decoder="hybrid",
            train=TrainConfig(ctc_weight=0.3, att_weight=0.7),
        ),
        # config 4b (round 3): same model family behind the MXU-shaped
        # patchify frontend — the flagship TRAINING configuration
        # (43k -> 144k fps, MFU 16.2% -> 40.3% at B=64; docs/KERNELS.md)
        "transformer-patchify": Config(
            name="transformer-patchify",
            encoder="transformer",
            decoder="hybrid",
            model=ModelConfig(frontend="patchify"),
            train=TrainConfig(ctc_weight=0.3, att_weight=0.7),
        ),
        # config 5: end-to-end DP training over ICI on v5e-8
        "dp-v5e8": Config(
            name="dp-v5e8",
            encoder="transformer",
            decoder="hybrid",
            data=DataConfig(batch_size=64),
            train=TrainConfig(ctc_weight=0.3, att_weight=0.7),
            mesh=MeshConfig(data_parallel=8),
        ),
    }
    if name not in presets:
        raise KeyError(f"unknown preset {name!r}; have {sorted(presets)}")
    return presets[name]


def flatten(cfg: Any, prefix: str = "") -> dict[str, Any]:
    """Dataclass tree -> flat dotted dict (for logging)."""
    out: dict[str, Any] = {}
    for f in fields(cfg):
        v = getattr(cfg, f.name)
        key = f"{prefix}{f.name}"
        if is_dataclass(v):
            out.update(flatten(v, key + "."))
        else:
            out[key] = v
    return out
