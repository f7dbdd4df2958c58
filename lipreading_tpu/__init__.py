"""lipreading_tpu — a TPU-native end-to-end lip-reading framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
``joseph-zhong/LipReading`` pipeline (see SURVEY.md): video -> face detection ->
68-point landmarks -> 96x96 mouth-ROI -> 3D-CNN frontend -> bi-GRU / transformer
encoder-decoder -> CTC / attention decoding -> character transcripts.

Unlike the reference (a per-frame CPU Python loop over dlib/OpenCV feeding eager
PyTorch), every compute stage here is batched, jitted, and designed for the TPU
memory hierarchy: preprocessing runs as fused kernels over HBM-resident frame
stacks, models are pure-functional JAX, and training data-parallelizes over an
ICI mesh via ``jax.sharding``.

Layout:
    text        char vocabulary, normalization         (ref: src/utils/data charset)
    metrics     CER/WER edit distance                   (ref: eval Levenshtein util)
    vtt         WebVTT caption parsing + frame align    (ref: caption parser/aligner)
    fixtures    deterministic synthetic talking faces   (ref: YouTube data collection)
    oracle/     CPU reference path (test oracle)        (ref: dlib/OpenCV hot loop)
    ops/        device kernels: ROI, ERT, CTC, decode   (ref: dlib/ATen native code)
    models/     frontend3d, GRU, attention, transformer (ref: src/models/)
    data/       dataview builder, dataset, input pipe   (ref: generate_dataview, DataLoader)
    parallel/   mesh + sharding specs                   (new: DP over ICI, BASELINE config 5)
    train/      train/eval loops, checkpoint, importer  (ref: train_model.py)
"""

__version__ = "0.1.0"

from lipreading_tpu.text import Vocab, normalize_text  # noqa: F401

_LAZY = {
    "preset": ("lipreading_tpu.config", "preset"),
    "Config": ("lipreading_tpu.config", "Config"),
    "transcribe": ("lipreading_tpu.infer", "transcribe"),
    "Trainer": ("lipreading_tpu.train.loop", "Trainer"),
    "FusedTrainer": ("lipreading_tpu.train.loop", "FusedTrainer"),
    "make_clip": ("lipreading_tpu.fixtures", "make_clip"),
    "load_assets": ("lipreading_tpu.preproc_training", "load_assets"),
    "load_release_model": ("lipreading_tpu.preproc_training",
                           "load_release_model"),
}


def __getattr__(name):
    """Lazy top-level API (avoids importing jax at package import)."""
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
