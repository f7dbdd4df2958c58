"""Streaming transcription: chunked feed produces a transcript consistent
with batch decoding of the same clip."""

import numpy as np
import pytest

from lipreading_tpu.config import preset


def test_streaming_matches_batch(assets, clip0):
    import jax

    from lipreading_tpu.infer import transcribe
    from lipreading_tpu.models.lipreader import init_model
    from lipreading_tpu.ops.detector import params_to_jax
    from lipreading_tpu.ops.ert import model_to_jax
    from lipreading_tpu.ops.preprocess import preprocess_frames
    from lipreading_tpu.streaming import StreamingTranscriber

    cfg = preset("bigru-ctc")
    cfg.model.frontend_channels = (4, 8, 12)
    cfg.model.frontend_dim = 32
    cfg.model.gru_hidden = 24
    cfg.model.gru_layers = 1
    cfg.model.dtype = "float32"
    det_np, ert_np = assets
    det, ert = params_to_jax(det_np), model_to_jax(ert_np)
    params = init_model(jax.random.PRNGKey(0), cfg)

    frames = clip0.frames[:32]
    st = StreamingTranscriber(params, cfg, det, ert, window=32,
                             decode_every=8)
    for lo in range(0, 32, 8):
        st.feed(frames[lo:lo + 8])
    got = st.finish()

    rois = preprocess_frames(det, ert, frames, cfg.preprocess)
    want = transcribe(params, cfg, np.asarray(rois)[None],
                      np.asarray([32], np.int32), beam=1)[0]
    # full clip fits in one window -> identical decode
    assert got == want
