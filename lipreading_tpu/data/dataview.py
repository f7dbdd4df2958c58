"""Dataview builder + reader (ref: src/scripts/generate_dataview.py —
SURVEY.md §3 "Dataview builder": pairs ROI frame-stacks with caption chars and
caches shards to disk).

A dataview directory holds one ``.npz`` per supervision sample plus an
``index.json``:

    sample.npz: roi_u8 [T, R, R] uint8   mouth-ROI grayscale, pre-normalization
                (normalization happens on device — 4x less disk/PCIe traffic)
    index.json: [{"file", "text", "num_frames"}, ...] + build metadata

Unlike the reference (per-frame dlib loop writing pickles), the builder runs
the batched device preprocessing over whole clips and aligns VTT cues to frame
ranges to cut supervision samples.
"""

from __future__ import annotations

import json
import os

import numpy as np

from lipreading_tpu.config import DataConfig, PreprocessConfig
from lipreading_tpu.vtt import align_cues_to_frames, parse_vtt


def roi_to_u8(roi_norm: np.ndarray, cfg: PreprocessConfig) -> np.ndarray:
    """Invert normalization to storable uint8 gray."""
    g = (roi_norm * cfg.normalize_std + cfg.normalize_mean) * 255.0
    return np.clip(np.floor(g + 0.5), 0, 255).astype(np.uint8)


def u8_to_roi(roi_u8: np.ndarray, cfg: PreprocessConfig) -> np.ndarray:
    return ((roi_u8.astype(np.float32) / 255.0) - cfg.normalize_mean) / cfg.normalize_std


class DataviewWriter:
    def __init__(self, out_dir: str, data_cfg: DataConfig, pre_cfg: PreprocessConfig):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.entries: list[dict] = []
        self.meta = {
            "roi_size": pre_cfg.roi_size,
            "normalize_mean": pre_cfg.normalize_mean,
            "normalize_std": pre_cfg.normalize_std,
            "fps": data_cfg.fps,
        }

    def add(self, sample_id: str, roi_u8: np.ndarray, text: str,
            frame_valid: np.ndarray | None = None) -> None:
        """``frame_valid`` (bool [T]) marks frames whose face detection was
        confident (tracked builds); omitted = all frames trusted."""
        fname = f"{sample_id}.npz"
        arrays = {"roi_u8": roi_u8.astype(np.uint8)}
        entry = {"file": fname, "text": text,
                 "num_frames": int(roi_u8.shape[0])}
        if frame_valid is not None:
            arrays["frame_valid"] = np.asarray(frame_valid, bool)
            entry["num_valid"] = int(arrays["frame_valid"].sum())
        np.savez_compressed(os.path.join(self.out_dir, fname), **arrays)
        self.entries.append(entry)

    def finalize(self) -> None:
        with open(os.path.join(self.out_dir, "index.json"), "w") as f:
            json.dump({"meta": self.meta, "samples": self.entries}, f, indent=1)


class Dataview:
    """Reader over a dataview directory."""

    def __init__(self, path: str):
        self.path = path
        with open(os.path.join(path, "index.json")) as f:
            idx = json.load(f)
        self.meta = idx["meta"]
        self.samples = idx["samples"]

    def __len__(self) -> int:
        return len(self.samples)

    def text(self, i: int) -> str:
        return self.samples[i]["text"]

    def num_frames(self, i: int) -> int:
        return self.samples[i]["num_frames"]

    def roi_u8(self, i: int) -> np.ndarray:
        z = np.load(os.path.join(self.path, self.samples[i]["file"]))
        return z["roi_u8"]

    def frame_valid(self, i: int) -> np.ndarray:
        """[T] bool detection-confidence mask (all-True for untracked builds)."""
        z = np.load(os.path.join(self.path, self.samples[i]["file"]))
        if "frame_valid" in z:
            return z["frame_valid"]
        return np.ones((self.samples[i]["num_frames"],), bool)

    def num_valid(self, i: int) -> int:
        """Confident-frame count (== num_frames for untracked builds).

        Index-only: no npz load (``num_valid`` is written to index.json by
        DataviewWriter.add when a mask is stored)."""
        s = self.samples[i]
        return int(s.get("num_valid", s["num_frames"]))

    def roi_u8_compact(self, i: int) -> np.ndarray:
        """ROI stack with unconfident frames removed — the reference's
        skip-frame semantics (SURVEY.md §4.1) applied at read time for
        ``keep_invalid=True`` builds; identity for untracked builds.
        One npz load (roi + mask live in the same file)."""
        z = np.load(os.path.join(self.path, self.samples[i]["file"]))
        roi = z["roi_u8"]
        if "frame_valid" in z:
            roi = roi[z["frame_valid"]]
        return roi


def build_fixture_dataview(
    out_dir: str,
    n_clips: int,
    seed: int = 0,
    data_cfg: DataConfig | None = None,
    pre_cfg: PreprocessConfig | None = None,
    use_ground_truth_landmarks: bool = False,
    batch_frames: int = 256,
    variation: float = 0.0,
    assets_variant: str = "default",
    tracked: bool = False,
    keep_invalid: bool = False,
    frame_transform=None,
) -> Dataview:
    """Render fixture clips, preprocess on device, cut cue-aligned samples.

    ``use_ground_truth_landmarks`` bypasses the detector/ERT with fixture GT
    (isolates model training from landmarker quality in tests).
    ``variation``/``assets_variant`` select styled clips + the matching
    robust preprocessing weights (appearance-robust training corpora).
    ``variation`` may be a float (every clip) or a (lo, hi) tuple — each
    clip then draws its own level uniformly from [lo, hi) (deterministic in
    the clip index), mixing canonical and styled appearances in ONE corpus
    so a single model covers both.

    ``tracked=True`` runs the robust preprocessing (top-k detection +
    presence gating + temporal tracking, ops/preprocess.py
    preprocess_clips_tracked) and applies the reference's skip-frame
    semantics: frames without a confident detection are DROPPED from each
    sample (SURVEY.md §4.1 "skips no-detection frames"). With
    ``keep_invalid=True`` they are kept in place and the per-frame
    ``frame_valid`` mask is stored in the npz instead (mask-aware training).
    ``frame_transform(clip_idx, frames) -> frames`` lets tests corrupt
    specific frames (faceless cutaways) before preprocessing.
    """
    import jax.numpy as jnp

    from lipreading_tpu.fixtures import make_clip
    from lipreading_tpu.ops import roi as roi_ops
    from lipreading_tpu.ops.preprocess import (
        mouth_boxes_from_landmarks,
        preprocess_padded,
        preprocess_padded_tracked,
    )

    data_cfg = data_cfg or DataConfig()
    pre_cfg = pre_cfg or PreprocessConfig()
    writer = DataviewWriter(out_dir, data_cfg, pre_cfg)

    det = ert = presence = None
    if not use_ground_truth_landmarks:
        from lipreading_tpu.ops.detector import params_to_jax
        from lipreading_tpu.ops.ert import model_to_jax
        from lipreading_tpu.preproc_training import load_assets

        det_np, ert_np = load_assets(variant=assets_variant)
        det, ert = params_to_jax(det_np), model_to_jax(ert_np)
        if pre_cfg.landmarker == "conv":
            # conv-landmarker corpora (e.g. preprocessing-path augmentation
            # for releases that must hold CER behind the fast path): the
            # distilled conv asset rides in the landmarker slot
            from lipreading_tpu.ops.landmarker import (
                params_to_jax as lmk_to_jax,
            )
            from lipreading_tpu.preproc_training import load_landmarker

            lm_np = load_landmarker(variant=assets_variant)
            if lm_np is None:
                raise FileNotFoundError(
                    f"pre_cfg.landmarker='conv' but no conv landmarker asset "
                    f"for variant {assets_variant!r}"
                )
            ert = lmk_to_jax(lm_np)
        if tracked:
            import jax

            from lipreading_tpu.preproc_training import load_presence

            presence_np = load_presence(variant=assets_variant)
            if presence_np is None:
                raise FileNotFoundError(
                    f"presence head missing for variant {assets_variant!r}"
                )
            presence = jax.tree.map(jnp.asarray, presence_np)
    if tracked and use_ground_truth_landmarks:
        raise ValueError("tracked builds need the real detector stack")

    for c in range(n_clips):
        if isinstance(variation, (tuple, list)):
            lo, hi = variation
            u = np.random.default_rng(
                np.random.SeedSequence([0x7A12, seed, c])
            ).random()
            var_c = float(lo + (hi - lo) * u)
        else:
            var_c = float(variation)
        clip = make_clip(seed * 1_000_000 + c, data_cfg, variation=var_c)
        if frame_transform is not None:
            clip_frames = frame_transform(c, clip.frames)
        else:
            clip_frames = clip.frames
        H, W = clip_frames.shape[1:3]
        valid = None
        if use_ground_truth_landmarks:
            rois = []
            for lo in range(0, clip.num_frames, batch_frames):
                chunk = clip_frames[lo:lo + batch_frames]
                gray = roi_ops.grayscale(jnp.asarray(chunk))
                mb = mouth_boxes_from_landmarks(
                    jnp.asarray(clip.landmarks[lo:lo + batch_frames]),
                    pre_cfg.roi_margin, H, W,
                )
                r = roi_ops.sample_rois_xla(
                    gray, mb, pre_cfg.roi_size,
                    mean=pre_cfg.normalize_mean, std=pre_cfg.normalize_std,
                )
                rois.append(np.asarray(r))
            roi_norm = np.concatenate(rois, axis=0)
        elif tracked:
            roi_norm, valid = preprocess_padded_tracked(
                det, presence, ert, clip_frames, pre_cfg
            )
        else:
            # padded path: bounds XLA compiles to one per length bucket
            roi_norm = preprocess_padded(det, ert, clip_frames, pre_cfg)
        roi_u8 = roi_to_u8(roi_norm, pre_cfg)

        def cut(arr, first, last):
            """Apply skip-frame semantics within one sample's span."""
            if valid is None:
                return arr[first:last], None
            v = valid[first:last]
            if keep_invalid:
                return arr[first:last], v
            return arr[first:last][v], None

        cues = parse_vtt(clip.vtt)
        for j, (first, last, text) in enumerate(
            align_cues_to_frames(cues, clip.fps, clip.num_frames)
        ):
            frames_j, valid_j = cut(roi_u8, first, last)
            if frames_j.shape[0] == 0:
                continue                      # every frame lost its face
            writer.add(f"clip{c:05d}_cue{j:02d}", frames_j, text,
                       frame_valid=valid_j)
        # whole-clip sample too (longer-context supervision)
        frames_full, valid_full = cut(roi_u8, 0, clip.num_frames)
        if frames_full.shape[0]:
            writer.add(f"clip{c:05d}_full", frames_full, clip.text,
                       frame_valid=valid_full)

    writer.finalize()
    return Dataview(out_dir)


def clip_id_of(sample: dict) -> str:
    """Sample index entry -> owning clip id (prefix of the sample id)."""
    return sample["file"].rsplit("_", 1)[0]


def merge_dataviews(out_dir: str, paths: list[str]) -> Dataview:
    """Compose several dataviews into one (corpus mixing: e.g. a canonical
    build + a styled build + a tracked build trained as a single corpus).

    Sample files are hard-linked when possible (same filesystem) and copied
    otherwise; ids are prefixed ``dNN_`` per source view so clip identities
    stay distinct across sources (split_by_clip keeps a source clip's cue
    and full samples together). Metas must agree on roi_size/normalization
    (fps may differ — it is informational after preprocessing).

    Stale destination files are replaced (re-merging into the same out_dir
    with different sources is safe). Hard-link caveat: REGENERATING a
    source view in place after merging mutates the shared inodes and
    therefore the merged corpus — rebuild the merge (or the source into a
    fresh directory) instead."""
    import shutil

    if not paths:
        raise ValueError("merge_dataviews needs at least one source view")
    os.makedirs(out_dir, exist_ok=True)
    views = [Dataview(p) for p in paths]
    meta = dict(views[0].meta)
    entries = []
    for vi, v in enumerate(views):
        for key in ("roi_size", "normalize_mean", "normalize_std"):
            if v.meta[key] != meta[key]:
                raise ValueError(
                    f"dataview {paths[vi]!r} meta {key}={v.meta[key]} "
                    f"!= {meta[key]} of {paths[0]!r}"
                )
        for s in v.samples:
            fname = f"d{vi:02d}_{s['file']}"
            src = os.path.join(v.path, s["file"])
            dst = os.path.join(out_dir, fname)
            # always replace: a leftover dst from a previous merge of
            # DIFFERENT sources would silently pair this index entry with
            # stale ROI bytes
            if os.path.exists(dst):
                os.unlink(dst)
            try:
                os.link(src, dst)
            except OSError:
                shutil.copyfile(src, dst)
            entries.append(dict(s, file=fname))
    with open(os.path.join(out_dir, "index.json"), "w") as f:
        json.dump({"meta": meta, "samples": entries}, f, indent=1)
    return Dataview(out_dir)


def split_by_clip(
    view: Dataview, fractions: dict[str, float], seed: int = 0
) -> dict[str, list[int]]:
    """Partition sample indices into named splits BY CLIP (the reference
    splits by video so cue samples from one video never straddle train/val —
    SURVEY.md §3 "Dataview builder").

    fractions: e.g. {"train": 0.9, "val": 0.1}; must sum to ~1.
    """
    import numpy as _np

    clips = sorted({clip_id_of(s) for s in view.samples})
    rng = _np.random.default_rng(_np.random.SeedSequence([0x5B117, seed]))
    order = [clips[i] for i in rng.permutation(len(clips))]
    out: dict[str, list[int]] = {}
    lo = 0.0
    bounds = []
    for name, frac in fractions.items():
        bounds.append((name, lo, lo + frac))
        lo += frac
    assignment = {}
    for j, c in enumerate(order):
        u = (j + 0.5) / len(order)
        for name, a, b in bounds:
            if a <= u < b or (name == bounds[-1][0] and u >= b):
                assignment[c] = name
                break
    for name, _, _ in bounds:
        out[name] = [
            i for i, s in enumerate(view.samples)
            if assignment.get(clip_id_of(s)) == name
        ]
    return out
