"""Training for the preprocessing models (face detector + ERT landmarker).

The reference downloads dlib's pretrained models; we must train our own
replacements (SURVEY.md §8: dlib unavailable, zero egress). Both train on the
synthetic fixture corpus whose boxes/landmarks are exact ground truth:

* detector: the tiny conv localizer (ops/detector.py) trained with a
  CenterNet-style objective — BCE on the center-cell heatmap + L2 on the
  offset/size regressors at the true cell. JAX + optax, runs on TPU or CPU.
* ERT: gradient boosting via oracle/ert_train.py (numpy, CPU).

`train_all` writes the shared-weight asset files consumed by both the oracle
and the device paths (assets/detector.npz, assets/ert.npz).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lipreading_tpu.config import DataConfig, PreprocessConfig
from lipreading_tpu.fixtures import make_clips
from lipreading_tpu.oracle import detector as odet
from lipreading_tpu.oracle.ert_train import train_ert
from lipreading_tpu.oracle.roi import grayscale
from lipreading_tpu.ops import detector as ddet
from lipreading_tpu.ops.roi import resize_frames

ASSETS_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "assets")


def _collect_frames(clips, stride=2):
    """Fixture clips -> (gray [N,H,W], square boxes [N,3], landmarks [N,68,2])."""
    imgs, boxes, lms = [], [], []
    for c in clips:
        for t in range(0, c.num_frames, stride):
            imgs.append(grayscale(c.frames[t]))
            x0, y0, w, h = c.boxes[t]
            s = max(w, h)
            boxes.append((x0 + w / 2 - s / 2, y0 + h / 2 - s / 2, s))
            lms.append(c.landmarks[t])
    return (
        np.stack(imgs).astype(np.float32),
        np.asarray(boxes, dtype=np.float32),
        np.stack(lms).astype(np.float32),
    )


def detector_targets(boxes: np.ndarray, frame_h: int, frame_w: int):
    """GT square boxes -> (cell_idx [N], offsets [N,2], log_size [N]).

    Inverse of ops.detector.decode_boxes on the 8x8 grid of the 64px input.
    """
    sx, sy = frame_w / odet.INPUT, frame_h / odet.INPUT
    cx64 = (boxes[:, 0] + boxes[:, 2] / 2) / sx
    cy64 = (boxes[:, 1] + boxes[:, 2] / 2) / sy
    size64 = boxes[:, 2] / (0.5 * (sx + sy))
    cell_x = np.clip((cx64 / odet.STRIDE).astype(np.int32), 0, 7)
    cell_y = np.clip((cy64 / odet.STRIDE).astype(np.int32), 0, 7)
    dx = np.clip(cx64 / odet.STRIDE - cell_x, 1e-3, 1 - 1e-3)
    dy = np.clip(cy64 / odet.STRIDE - cell_y, 1e-3, 1 - 1e-3)
    cell = cell_y * 8 + cell_x
    logit = lambda p: np.log(p / (1 - p))
    return (
        cell.astype(np.int32),
        np.stack([logit(dx), logit(dy)], 1).astype(np.float32),
        np.log(size64 / odet.SIZE_ANCHOR).astype(np.float32),
    )


def train_detector(
    gray: np.ndarray,
    boxes: np.ndarray,
    seed: int = 0,
    steps: int = 1500,
    batch: int = 64,
    lr: float = 3e-3,
) -> dict[str, np.ndarray]:
    """Train the conv localizer on (gray frames, GT boxes). Returns weights."""
    H, W = gray.shape[1:]
    gray64 = np.asarray(resize_frames(jnp.asarray(gray), odet.INPUT))
    cell, off_logits, log_size = detector_targets(boxes, H, W)
    params = jax.tree.map(jnp.asarray, odet.init_detector(seed))

    tx = optax.adam(lr)
    opt_state = tx.init(params)

    def loss_fn(p, g64, cell_b, off_b, ls_b):
        head = ddet.forward(p, g64)                       # [B, 8, 8, 4]
        B = head.shape[0]
        flat = head.reshape(B, 64, 4)
        score = flat[..., 0]
        target = jax.nn.one_hot(cell_b, 64)
        cls = optax.sigmoid_binary_cross_entropy(score, target).mean()
        sel = jnp.take_along_axis(flat, cell_b[:, None, None], axis=1)[:, 0]
        reg = ((sel[:, 1:3] - off_b) ** 2).mean() + ((sel[:, 3] - ls_b) ** 2).mean()
        return cls + 0.5 * reg

    @jax.jit
    def step(p, o, g64, cell_b, off_b, ls_b):
        l, grads = jax.value_and_grad(loss_fn)(p, g64, cell_b, off_b, ls_b)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, l

    rng = np.random.default_rng(seed)
    n = gray64.shape[0]
    for i in range(steps):
        idx = rng.integers(0, n, size=batch)
        params, opt_state, l = step(
            params, opt_state,
            jnp.asarray(gray64[idx]), jnp.asarray(cell[idx]),
            jnp.asarray(off_logits[idx]), jnp.asarray(log_size[idx]),
        )
    return {k: np.asarray(v) for k, v in params.items()}


def detector_box_error(params, gray, gt_boxes) -> float:
    """Mean |pred - gt| box coordinate error in pixels over a set."""
    pred = np.asarray(
        ddet.detect(ddet.params_to_jax(params), jnp.asarray(gray))
    )
    return float(np.abs(pred - gt_boxes).mean())


def train_all(
    seed: int = 0,
    n_clips: int = 40,
    data_cfg: DataConfig | None = None,
    pre_cfg: PreprocessConfig | None = None,
    det_steps: int = 1500,
    out_dir: str | None = None,
    verbose: bool = True,
):
    """Train detector + ERT on fixtures; write assets; report held-out quality."""
    data_cfg = data_cfg or DataConfig()
    pre_cfg = pre_cfg or PreprocessConfig()
    out_dir = out_dir or ASSETS_DIR
    os.makedirs(out_dir, exist_ok=True)

    clips = make_clips(seed + 1, n_clips, data_cfg)
    gray, boxes, lms = _collect_frames(clips)
    if verbose:
        print(f"training set: {gray.shape[0]} frames from {n_clips} clips")

    det_params = train_detector(gray, boxes, seed=seed, steps=det_steps)
    ert_model = train_ert(
        gray, boxes, lms, seed=seed,
        stages=pre_cfg.ert_cascades, pool=pre_cfg.ert_pool,
        trees=pre_cfg.ert_trees, depth=pre_cfg.ert_depth,
        verbose=verbose,
    )

    # held-out evaluation
    test = make_clips(seed + 777_001, 6, data_cfg)
    tg, tb, tl = _collect_frames(test, stride=4)
    det_err = detector_box_error(det_params, tg, tb)
    from lipreading_tpu.oracle.ert_train import landmark_error

    ert_err = landmark_error(ert_model, tg, tb, tl)
    if verbose:
        print(f"held-out detector box error: {det_err:.3f} px")
        print(f"held-out landmark error: {ert_err:.5f} box units")

    odet.save_params(det_params, os.path.join(out_dir, "detector.npz"))
    ert_model.save(os.path.join(out_dir, "ert.npz"))

    # face-presence head on the frozen trunk (faceless negatives), so a
    # fresh asset build is complete for the tracked pipeline
    from lipreading_tpu.fixtures import render_faceless_frames

    rng = np.random.default_rng(seed)
    H, W = gray.shape[1:]
    neg = np.concatenate(
        [grayscale(f) for i in range(6)
         for f in render_faceless_frames(seed + 900 + i, 5)]
    ).reshape(-1, H, W)
    extremes = np.stack([
        np.zeros((H, W), np.float32),
        np.full((H, W), 255.0, np.float32),
        np.full((H, W), 215.0, np.float32),
        rng.normal(128, 40, (H, W)).clip(0, 255).astype(np.float32),
    ])
    neg = np.concatenate([neg, np.repeat(extremes, 4, axis=0)])
    presence = train_presence_head(det_params, gray, neg, boxes, seed=seed)
    save_presence(presence, os.path.join(out_dir, "presence.npz"))
    return det_params, ert_model, {"det_err_px": det_err, "ert_err": ert_err}


def train_presence_head(
    det_params,
    pos_gray: np.ndarray,
    neg_gray: np.ndarray,
    pos_boxes: np.ndarray,
    seed: int = 0,
    steps: int = 600,
    lr: float = 5e-2,
) -> dict[str, np.ndarray]:
    """Train the per-cell face-presence head on the FROZEN detector trunk.

    The detector's own score channel is trained one-hot on frames that
    always contain a face, so it is uncalibrated on faceless input (a blank
    white frame scores 0.997 — measured). This logistic head sees negative
    (faceless) frames and gives the tracking layer (ops/tracking.py) a
    usable confidence without touching the shipped detector weights.

    pos_gray [N, H, W] face frames with pos_boxes [N, 3+]; neg_gray [M, H, W]
    faceless frames. Returns a two-layer head {"w1", "b1", "w2", "b2"}.
    """
    H, W = pos_gray.shape[1:]
    det = ddet.params_to_jax(det_params)
    feats_p = ddet.forward_features(
        det, resize_frames(jnp.asarray(pos_gray), odet.INPUT))[0]
    feats_n = ddet.forward_features(
        det, resize_frames(jnp.asarray(neg_gray), odet.INPUT))[0]
    # positive target: the cell containing the face center; everything else
    # (incl. every cell of faceless frames) is negative
    cell, _, _ = detector_targets(np.asarray(pos_boxes)[:, :3], H, W)
    y_p = jax.nn.one_hot(jnp.asarray(cell), 64).reshape(-1, 8, 8)
    y_n = jnp.zeros((feats_n.shape[0], 8, 8))
    feats = jnp.concatenate([feats_p, feats_n])
    y = jnp.concatenate([y_p, y_n])

    krng = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(krng)
    C, Hd = feats.shape[-1], 16
    params = {
        "w1": jax.random.normal(k1, (C, Hd)) * np.sqrt(2.0 / C),
        "b1": jnp.zeros((Hd,)),
        "w2": jax.random.normal(k2, (Hd,)) * np.sqrt(1.0 / Hd),
        "b2": jnp.zeros(()),
    }
    tx = optax.adam(lr)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        def loss_fn(p):
            logits = ddet.presence_logits(p, feats)
            # weight positives up: 1 positive cell vs 63 negatives per frame
            w = jnp.where(y > 0, 32.0, 1.0)
            return (optax.sigmoid_binary_cross_entropy(logits, y) * w).mean()

        l, g = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, l

    for _ in range(steps):
        params, opt, l = step(params, opt)
    return {k: np.asarray(v) for k, v in params.items()}


def train_conv_landmarker(
    det_params,
    ert_model,
    clips,
    seed: int = 0,
    steps: int = 4000,
    batch: int = 64,
    lr: float = 2e-3,
    verbose: bool = True,
    mouth_weight: float = 4.0,
    box_weight: float = 1.0,
    roi_loss_weight: float = 0.0,
    roi_size: int = 96,
    roi_margin: float = 0.30,
    width: float = 1.0,
):
    """Distill the ERT cascade into the conv landmarker (ops/landmarker.py).

    Targets are the ERT's OWN predictions on the DETECTOR's boxes — the
    exact deployment distribution of the "ert" preprocessing path — so the
    conv path mimics the shipped landmarker, biases included (SURVEY.md §7
    plan-B distillation; gate = landmark L2 / downstream ROI agreement).
    Returns the numpy weight dict.

    The only landmarks the downstream ROI crop reads are the mouth points
    48-67 (oracle/roi.py mouth_box_from_landmarks), and sub-pixel errors
    there flip round_box's integer rounding — the failure mode behind the
    conv path's residual transcript errors. The loss therefore (a) weights
    the mouth points ``mouth_weight``x in the landmark MSE and (b) adds a
    direct penalty on the derived mouth-box coordinates (center/size in
    box units, the exact quantities round_box consumes), ``box_weight``.

    ``roi_loss_weight > 0`` additionally distills on the DOWNSTREAM ROI
    PIXELS: student and teacher landmarks each map to a float mouth box and
    are sampled through the subpixel ROI path (ops/roi.sample_rois_xla,
    subpixel=True — two differentiable matmuls, gradients flow through the
    bilinear fracs into the box coordinates and the landmarks), and the
    normalized-pixel MSE joins the loss. This optimizes the exact quantity
    the recognizer consumes — possible only because the conv path samples
    subpixel boxes (integer round_box is not differentiable).
    """
    from lipreading_tpu.ops import landmarker as lmk
    from lipreading_tpu.ops.ert import model_to_jax, predict_batch
    from lipreading_tpu.ops.roi import sample_rois_xla

    gray_list = [grayscale(c.frames[t]) for c in clips
                 for t in range(c.num_frames)]
    gray = np.stack(gray_list).astype(np.float32)
    H, W = gray.shape[1:]
    det = ddet.params_to_jax(det_params)
    ert = model_to_jax(ert_model)

    # teacher pass (device, chunked): detector boxes -> ERT landmarks
    crops, targets, origins, sizes = [], [], [], []
    ibox_fn = jax.jit(lambda b: lmk.round_face_boxes(b, H, W))
    for lo in range(0, gray.shape[0], 512):
        g = jnp.asarray(gray[lo:lo + 512])
        b = ddet.detect(det, g)
        t_lm = predict_batch(ert, g, b)
        ib = ibox_fn(b)
        crops.append(np.asarray(
            sample_rois_xla(g, ib, lmk.CROP, normalize=False)
        ))
        origin = np.asarray(ib[:, :2], np.float32)[:, None, :]
        size = np.asarray(ib[:, 2], np.float32)[:, None, None]
        targets.append((np.asarray(t_lm) - origin) / size)   # box units
        origins.append(origin[:, 0, :])
        sizes.append(size[:, 0, 0])
    crops = np.concatenate(crops)
    targets = np.concatenate(targets).astype(np.float32)
    origins = np.concatenate(origins)
    sizes = np.concatenate(sizes)

    mean_shape = targets.mean(axis=0)
    params = jax.tree.map(
        jnp.asarray, lmk.init_landmarker(seed, mean_shape=mean_shape,
                                         width=width)
    )
    tx = optax.adam(optax.warmup_cosine_decay_schedule(
        0.0, lr, 100, max(steps, 101), lr * 0.05))
    opt_state = tx.init(params)

    # per-point weights: mouth (48:68) dominates, normalized to mean 1 so
    # the loss scale (and the tuned lr) is unchanged
    w_pts = np.ones((68,), np.float32)
    w_pts[48:68] = mouth_weight
    w_pts /= w_pts.mean()
    w_pts_j = jnp.asarray(w_pts)[None, :, None]

    def _mouth_box(lm, margin=0.30):
        # jnp mirror of oracle/roi.py mouth_box_from_landmarks, batched,
        # in box units: [B, 68, 2] -> [B, 3] (cx, cy, size)
        pts = lm[:, 48:68]
        mn, mx = pts.min(axis=1), pts.max(axis=1)
        size = (mx - mn).max(axis=-1) * (1.0 + margin)
        return jnp.concatenate(
            [(mn + mx) / 2.0, size[:, None]], axis=-1)

    @jax.jit
    def step(p, o, crop_b, t_b, gray_b, org_b, sz_b):
        def loss_fn(p):
            pred = lmk.forward(p, crop_b)
            mse = (((pred - t_b) ** 2) * w_pts_j).mean()
            box = ((_mouth_box(pred) - _mouth_box(t_b)) ** 2).mean()
            total = mse + box_weight * box
            if roi_loss_weight:
                from lipreading_tpu.ops.preprocess import mouth_boxes_float

                def frame_roi(lm):
                    fl = lm * sz_b[:, None, None] + org_b[:, None, :]
                    return sample_rois_xla(
                        gray_b, mouth_boxes_float(fl, roi_margin),
                        roi_size, subpixel=True)

                total = total + roi_loss_weight * (
                    (frame_roi(pred) - frame_roi(t_b)) ** 2).mean()
            return total

        l, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, l

    rng = np.random.default_rng(seed)
    n = crops.shape[0]
    for i in range(steps):
        idx = rng.integers(0, n, size=batch)
        params, opt_state, l = step(
            params, opt_state, jnp.asarray(crops[idx]),
            jnp.asarray(targets[idx]), jnp.asarray(gray[idx]),
            jnp.asarray(origins[idx]), jnp.asarray(sizes[idx]),
        )
        if verbose and (i + 1) % max(steps // 8, 1) == 0:
            print(f"  landmarker step {i+1}/{steps} loss {float(l):.6f}")
    return {k: np.asarray(v) for k, v in params.items()}


def conv_landmarker_error(lm_params, det_params, ert_model, clips) -> float:
    """Mean |conv - ERT| landmark distance in px over clips (the distillation
    gate metric)."""
    from lipreading_tpu.ops import landmarker as lmk
    from lipreading_tpu.ops.ert import model_to_jax, predict_batch

    det = ddet.params_to_jax(det_params)
    ert = model_to_jax(ert_model)
    lmj = lmk.params_to_jax(lm_params)
    errs = []
    for c in clips:
        g = jnp.asarray(np.stack(
            [grayscale(c.frames[t]) for t in range(c.num_frames)]
        ).astype(np.float32))
        b = ddet.detect(det, g)
        ref = predict_batch(ert, g, b)
        got = lmk.predict_batch_conv(lmj, g, b)
        errs.append(float(jnp.linalg.norm(got - ref, axis=-1).mean()))
    return float(np.mean(errs))


def conv_box_agreement(lm_params, det_params, ert_model, clips,
                       pre_cfg=None):
    """Fraction of frames whose ROUNDED mouth box (the integer crop the ROI
    kernel actually samples) is identical behind conv vs ERT landmarks —
    the box-flip rate is what turns sub-pixel landmark error into shifted
    ROI pixels (round_box knife edges)."""
    from lipreading_tpu.config import PreprocessConfig
    from lipreading_tpu.oracle.roi import mouth_box_from_landmarks, round_box
    from lipreading_tpu.ops import landmarker as lmk
    from lipreading_tpu.ops.ert import model_to_jax, predict_batch

    cfg = pre_cfg or PreprocessConfig()
    det = ddet.params_to_jax(det_params)
    ert = model_to_jax(ert_model)
    lmj = lmk.params_to_jax(lm_params)
    same = total = 0
    for c in clips:
        g_np = np.stack([grayscale(c.frames[t])
                         for t in range(c.num_frames)]).astype(np.float32)
        g = jnp.asarray(g_np)
        b = ddet.detect(det, g)
        ref = np.asarray(predict_batch(ert, g, b))
        got = np.asarray(lmk.predict_batch_conv(lmj, g, b))
        H, W = g_np.shape[1:]
        for t in range(ref.shape[0]):
            br = round_box(mouth_box_from_landmarks(ref[t], cfg.roi_margin),
                           H, W)
            bg = round_box(mouth_box_from_landmarks(got[t], cfg.roi_margin),
                           H, W)
            same += int(br == bg)
            total += 1
    return same / max(total, 1)


def save_landmarker(params: dict, path) -> None:
    np.savez_compressed(path, **params)


def load_landmarker(assets_dir: str | None = None, variant: str = "default"):
    """Load the conv landmarker weights for a variant (or None if untrained)."""
    d = assets_dir or ASSETS_DIR
    sfx = "" if variant == "default" else f"_{variant}"
    path = os.path.join(d, f"landmarker_conv{sfx}.npz")
    if not os.path.exists(path):
        return None
    z = np.load(path)
    return {k: z[k] for k in z.files}


def save_presence(params: dict, path) -> None:
    np.savez_compressed(path, **params)


def load_presence(assets_dir: str | None = None, variant: str = "default"):
    """Load the face-presence head for a detector variant (or None)."""
    d = assets_dir or ASSETS_DIR
    sfx = "" if variant == "default" else f"_{variant}"
    path = os.path.join(d, f"presence{sfx}.npz")
    if not os.path.exists(path):
        return None
    z = np.load(path)
    return {k: z[k] for k in z.files}


def load_assets(assets_dir: str | None = None, variant: str = "default"):
    """Load checked-in preprocessing weights (detector params, ERT model).

    ``variant``: "default" (trained on the canonical fixture style; the
    parity/golden anchor) or "robust" (trained with appearance variation=0.6
    — fixtures.make_clip(variation=...); ~3x better detection on styled
    clips, no regression on default ones).
    """
    from lipreading_tpu.oracle.ert import ERTModel

    d = assets_dir or ASSETS_DIR
    sfx = "" if variant == "default" else f"_{variant}"
    det = odet.load_params(os.path.join(d, f"detector{sfx}.npz"))
    ert = ERTModel.load(os.path.join(d, f"ert{sfx}.npz"))
    return det, ert


def load_release_model(name: str = "bigru_ctc", assets_dir: str | None = None):
    """Load a params-only release checkpoint from assets/ (+ its config).

    Returns (params, cfg) or None if the asset doesn't exist.
    """
    import json

    import jax
    from flax import serialization

    from lipreading_tpu.config import from_dict
    from lipreading_tpu.models.lipreader import init_model

    d = assets_dir or ASSETS_DIR
    path = os.path.join(d, f"{name}.msgpack")
    meta_path = os.path.join(d, f"{name}.json")
    if not (os.path.exists(path) and os.path.exists(meta_path)):
        return None
    with open(meta_path) as f:
        cfg = from_dict(json.load(f)["config"])
    template = init_model(jax.random.PRNGKey(0), cfg)
    with open(path, "rb") as f:
        state = serialization.msgpack_restore(f.read())
    params = serialization.from_state_dict(template, state)
    # device-resident once at load: from_state_dict leaves are NUMPY
    # arrays, and jitted callees that take params as an ARGUMENT
    # (infer._decode_jit, _greedy_conf_jit) would re-transfer the full
    # release (38-50 MB) on EVERY call — ~0.8 s/call over the axon
    # tunnel's ~50 MB/s H2D, which dominated the round-3 flagship bench
    # (753 fps). Closures that bake params as constants never noticed.
    params = jax.device_put(params)
    return params, cfg
