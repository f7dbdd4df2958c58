"""Streaming (online) transcription — chunked sliding-window decoding.

The reference's design space includes an online application ("Deep Lip
Reading: ... and an online application", PAPERS.md 1806.06053). The bi-GRU /
transformer encoders are bidirectional, so exact streaming is impossible;
the standard practical scheme is windowed re-decoding with a stable-prefix
commit rule, which is what this implements:

* frames arrive in chunks (e.g. from a webcam);
* preprocessing runs on device per chunk (batched over the chunk);
* every ``decode_every`` frames the last ``window`` ROIs are re-decoded and
  the emitted transcript keeps the longest prefix shared with the previous
  hypothesis (so text only ever grows or refines at the tail).

Static shapes: the window is fixed, short chunks are padded — one compiled
program regardless of stream length.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from lipreading_tpu.config import Config
from lipreading_tpu.infer import transcribe
from lipreading_tpu.ops.preprocess import preprocess_frames
from lipreading_tpu.text import Vocab


def _common_prefix(a: str, b: str) -> str:
    n = 0
    for x, y in zip(a, b):
        if x != y:
            break
        n += 1
    return a[:n]


class StreamingTranscriber:
    def __init__(
        self,
        params,
        cfg: Config,
        det,
        ert,
        window: int = 128,
        decode_every: int = 16,
        beam: int = 1,
    ):
        self.params = params
        self.cfg = cfg
        self.det = det
        self.ert = ert
        self.window = window
        self.decode_every = decode_every
        self.beam = beam
        self.vocab = Vocab()
        self._rois: list[np.ndarray] = []
        self._since_decode = 0
        self.committed = ""
        self.hypothesis = ""

        @jax.jit
        def _pre(frames):
            return preprocess_frames(det, ert, frames, cfg.preprocess)

        self._pre = _pre

    def feed(self, frames: np.ndarray) -> str:
        """Append [N, H, W, 3] uint8 frames; returns the current transcript."""
        rois = np.asarray(self._pre(jnp.asarray(frames)))
        self._rois.extend(rois)
        self._since_decode += len(rois)
        if self._since_decode >= self.decode_every:
            self._since_decode = 0
            self._redecode()
        return self.hypothesis

    def _redecode(self) -> None:
        W = self.window
        roi_win = np.stack(self._rois[-W:])
        T = roi_win.shape[0]
        if T < W:
            roi_win = np.pad(roi_win, ((0, W - T), (0, 0), (0, 0)))
        new = transcribe(
            self.params, self.cfg, roi_win[None],
            np.asarray([T], np.int32), beam=self.beam, vocab=self.vocab,
        )[0]
        if len(self._rois) > W:
            # window no longer covers the stream start: keep committed text
            self.hypothesis = self.committed + new
        else:
            stable = _common_prefix(self.hypothesis, new) if self.hypothesis \
                else ""
            self.hypothesis = new
            self.committed = stable

    def finish(self) -> str:
        """Flush: final decode over the last window."""
        if self._rois:
            self._redecode()
        return self.hypothesis
