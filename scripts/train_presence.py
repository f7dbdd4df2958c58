#!/usr/bin/env python
"""Train the face-presence head(s) on the FROZEN shipped detector trunk and
write assets/presence[_robust].npz.

The shipped detector weights are untouched (their bit-parity with the golden
dump and the release models is pinned by tests); only the tiny logistic head
that calibrates face-vs-no-face confidence is trained here, with faceless
negative frames the detector never saw (VERDICT r1 missing #2).

Usage: python scripts/train_presence.py [seed=0] [n_clips=24] [variants=default,robust]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lipreading_tpu.config import parse_overrides


def main(argv):
    args = parse_overrides(argv)
    seed = int(args.pop("seed", 0))
    n_clips = int(args.pop("n_clips", 24))
    variants = args.pop("variants", "default,robust").split(",")
    assert not args, f"unknown args {args}"

    import numpy as np

    import jax

    from lipreading_tpu.fixtures import make_clips, render_faceless_frames
    from lipreading_tpu.ops import detector as ddet
    from lipreading_tpu.ops.roi import resize_frames  # noqa: F401 (warm import)
    from lipreading_tpu.preproc_training import (
        ASSETS_DIR,
        _collect_frames,
        load_assets,
        save_presence,
        train_presence_head,
    )

    for variant in variants:
        variation = 0.6 if variant == "robust" else 0.0
        det, _ = load_assets(variant=variant)
        clips = make_clips(seed + 31, n_clips, variation=variation)
        gray, boxes, _ = _collect_frames(clips, stride=3)
        # negatives: fixture backgrounds across styles + synthetic extremes
        rng = np.random.default_rng(seed)
        H, W = gray.shape[1:]
        negs = [render_faceless_frames(seed + i, 6,
                                       variation=variation if i % 2 else 0.0)
                for i in range(10)]
        neg = np.concatenate(negs).astype(np.float32).mean(-1)  # quick gray
        extremes = np.stack([
            np.zeros((H, W), np.float32),
            np.full((H, W), 255.0, np.float32),
            np.full((H, W), 230.0, np.float32),
            np.full((H, W), 200.0, np.float32),
            np.full((H, W), 160.0, np.float32),
            rng.normal(128, 40, (H, W)).clip(0, 255).astype(np.float32),
            rng.normal(200, 20, (H, W)).clip(0, 255).astype(np.float32),
            np.tile(np.linspace(0, 255, W, dtype=np.float32)[None, :], (H, 1)),
            np.tile(np.linspace(0, 255, H, dtype=np.float32)[:, None], (1, W)),
        ])
        neg = np.concatenate([neg, np.repeat(extremes, 4, axis=0)])
        head = train_presence_head(det, gray, neg, boxes, seed=seed)

        # report separation on held-out frames
        import jax.numpy as jnp

        from lipreading_tpu.ops.roi import resize_frames

        test = make_clips(seed + 777_101, 4, variation=variation)
        tg, tb, _ = _collect_frames(test, stride=4)
        tneg = np.concatenate(
            [render_faceless_frames(seed + 500 + i, 8, variation=variation)
             for i in range(3)]).astype(np.float32).mean(-1)
        tneg = np.concatenate(
            [tneg, np.full((1, H, W), 255.0, np.float32),
             np.zeros((1, H, W), np.float32),
             np.full((1, H, W), 215.0, np.float32)])
        detj = ddet.params_to_jax(det)
        headj = {k: jnp.asarray(v) for k, v in head.items()}

        def max_conf(frames):
            feats, _ = ddet.forward_features(
                detj, resize_frames(jnp.asarray(frames), ddet.INPUT))
            p = jax.nn.sigmoid(ddet.presence_logits(headj, feats))
            return np.asarray(p.reshape(p.shape[0], -1).max(1))

        pos_c, neg_c = max_conf(tg), max_conf(tneg)
        print(f"[{variant}] held-out face conf: min={pos_c.min():.3f} "
              f"mean={pos_c.mean():.3f} | faceless conf: "
              f"max={neg_c.max():.3f} mean={neg_c.mean():.3f}")
        sfx = "" if variant == "default" else f"_{variant}"
        path = os.path.join(ASSETS_DIR, f"presence{sfx}.npz")
        save_presence(head, path)
        print(f"wrote {path}")


if __name__ == "__main__":
    main(sys.argv[1:])
