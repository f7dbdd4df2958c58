"""Ensemble-of-regression-trees (ERT) 68-point landmark cascade — CPU oracle.

The reference reaches dlib's Kazemi-Sullivan shape predictor through a Python
binding (`dlib.shape_predictor(...)`, SURVEY.md §3). dlib and its ~95MB .dat
model are unavailable here (SURVEY.md §8 environment inventory), so this is a
first-party ERT of the same family:

* a cascade of S stages; each stage gathers a pool of P feature pixels at
  positions anchored to the *current* shape estimate (anchor landmark +
  normalized offset, scaled by the face box);
* each stage applies K boosted shallow trees of depth D; a split node compares
  the intensity difference of two pool pixels against a threshold; leaves hold
  136-dim shape increments learned by gradient boosting (ert_train.py);
* all trees within a stage read the pool gathered at stage entry (dlib's
  structure), which is what makes the device version fully vectorizable over
  (batch x trees) — see lipreading_tpu/ops/ert.py for the TPU evaluation.

Shapes are stored normalized to the square face box: pixel = origin + s * size.
Pixel lookup is nearest-neighbor via floor(x + 0.5) (dlib convention; and
identical between numpy and jnp, unlike banker's rounding).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class ERTModel:
    mean_shape: np.ndarray   # [68, 2] f32, box-normalized
    anchors: np.ndarray      # [S, P] i32, landmark index per pool pixel
    offsets: np.ndarray      # [S, P, 2] f32, box-normalized offset
    feat1: np.ndarray        # [S, K, Nn] i32, pool index (left operand)
    feat2: np.ndarray        # [S, K, Nn] i32, pool index (right operand)
    thresh: np.ndarray       # [S, K, Nn] f32, split threshold on pixel diff
    leaves: np.ndarray       # [S, K, Nl, 136] f32, boosted shape increments

    @property
    def num_stages(self) -> int:
        return int(self.anchors.shape[0])

    @property
    def pool_size(self) -> int:
        return int(self.anchors.shape[1])

    @property
    def num_trees(self) -> int:
        return int(self.feat1.shape[1])

    @property
    def depth(self) -> int:
        return int(np.log2(self.feat1.shape[2] + 1))

    def save(self, path) -> None:
        np.savez_compressed(
            path,
            mean_shape=self.mean_shape,
            anchors=self.anchors,
            offsets=self.offsets,
            feat1=self.feat1,
            feat2=self.feat2,
            thresh=self.thresh,
            leaves=self.leaves,
        )

    @classmethod
    def load(cls, path) -> "ERTModel":
        z = np.load(path)
        return cls(**{k: z[k] for k in z.files})


def random_ert(
    seed: int,
    stages: int = 10,
    pool: int = 128,
    trees: int = 96,
    depth: int = 4,
    mean_shape: np.ndarray | None = None,
) -> ERTModel:
    """A structurally valid ERT with seeded random parameters.

    Used by parity tests (oracle vs device must agree for *any* weights) and
    as the initial structure the trainer fills in.
    """
    rng = np.random.default_rng(np.random.SeedSequence([0xE27, seed]))
    nn = 2**depth - 1
    nl = 2**depth
    if mean_shape is None:
        # a rough face-box-normalized 68-pt layout; trainer replaces with data mean
        mean_shape = np.stack(
            [
                0.5 + 0.4 * np.cos(np.linspace(0, 2 * np.pi, 68, endpoint=False)),
                0.5 + 0.4 * np.sin(np.linspace(0, 2 * np.pi, 68, endpoint=False)),
            ],
            axis=1,
        ).astype(np.float32)
    return ERTModel(
        mean_shape=mean_shape.astype(np.float32),
        anchors=rng.integers(0, 68, size=(stages, pool)).astype(np.int32),
        offsets=rng.normal(0, 0.12, size=(stages, pool, 2)).astype(np.float32),
        feat1=rng.integers(0, pool, size=(stages, trees, nn)).astype(np.int32),
        feat2=rng.integers(0, pool, size=(stages, trees, nn)).astype(np.int32),
        thresh=rng.normal(0, 25.0, size=(stages, trees, nn)).astype(np.float32),
        leaves=rng.normal(0, 1e-3, size=(stages, trees, nl, 136)).astype(np.float32),
    )


def gather_pool(
    gray: np.ndarray,
    shape_norm: np.ndarray,
    box: tuple[float, float, float],
    anchors: np.ndarray,
    offsets: np.ndarray,
) -> np.ndarray:
    """Gather P feature-pixel intensities for the current shape estimate."""
    H, W = gray.shape
    x0, y0, size = box
    pos = (shape_norm[anchors] + offsets) * size
    px = np.floor(pos[:, 0] + x0 + 0.5).astype(np.int64)
    py = np.floor(pos[:, 1] + y0 + 0.5).astype(np.int64)
    px = np.clip(px, 0, W - 1)
    py = np.clip(py, 0, H - 1)
    return gray[py, px].astype(np.float32)


def traverse_trees(
    vals: np.ndarray,
    feat1: np.ndarray,
    feat2: np.ndarray,
    thresh: np.ndarray,
) -> np.ndarray:
    """Descend all K trees at once; returns leaf indices [K].

    vals: [P] pool intensities; feat1/feat2/thresh: [K, Nn].
    Node numbering is heap order (children of i are 2i+1 / 2i+2); go right
    when (vals[f1] - vals[f2]) > thresh.
    """
    K, nn = feat1.shape
    depth = int(np.log2(nn + 1))
    ks = np.arange(K)
    node = np.zeros(K, dtype=np.int64)
    for _ in range(depth):
        f1 = feat1[ks, node]
        f2 = feat2[ks, node]
        th = thresh[ks, node]
        right = (vals[f1] - vals[f2]) > th
        node = 2 * node + 1 + right
    return node - nn


def predict(
    model: ERTModel,
    gray: np.ndarray,
    box: tuple[float, float, float],
) -> np.ndarray:
    """Full cascade: gray frame + square face box -> 68 landmarks (pixels)."""
    x0, y0, size = (float(v) for v in box)
    shape = model.mean_shape.astype(np.float32).copy()
    ks = np.arange(model.num_trees)
    for s in range(model.num_stages):
        vals = gather_pool(gray, shape, (x0, y0, size), model.anchors[s], model.offsets[s])
        leaf = traverse_trees(vals, model.feat1[s], model.feat2[s], model.thresh[s])
        delta = model.leaves[s][ks, leaf].sum(axis=0)
        shape = shape + delta.reshape(68, 2)
    return shape * np.float32(size) + np.asarray([x0, y0], dtype=np.float32)
