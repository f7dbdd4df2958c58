"""scripts/serve.py — the sustained serving loop (shm decode ring ->
Prefetcher -> tracked preprocess -> cascade decode) end to end on the CPU
mesh: transcripts land, quality holds, the report carries the measured keys.
"""

import importlib.util
import os

import pytest

_SERVE = os.path.join(os.path.dirname(__file__), "..", "scripts", "serve.py")


def _load_serve():
    spec = importlib.util.spec_from_file_location("serve_mod", _SERVE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_serve_loop_end_to_end(tmp_path):
    from lipreading_tpu.preproc_training import (
        load_landmarker,
        load_presence,
        load_release_model,
    )

    if load_release_model("transformer_hybrid_universal4") is None:
        pytest.skip("universal4 release asset missing")
    if load_landmarker() is None or load_presence() is None:
        pytest.skip("landmarker/presence assets missing")

    serve = _load_serve()
    out = tmp_path / "transcripts.jsonl"
    rep = serve.serve(n_clips=4, B=2, bucket=64, beam=2, workers=1,
                      out_path=str(out))
    # 4 clips / B=2 -> 2 batches; batch 0 is the compile warmup, so exactly
    # one steady-state batch is measured
    assert rep["clips"] == 4 and rep["rescored_frac"] <= 1.0
    assert rep["serving_sustained_fps"] and rep["serving_sustained_fps"] > 0
    assert rep["latency_p50_ms"] and rep["latency_p50_ms"] > 0
    # quality gate rides along: fixture clips through the deployment stack
    # (tracked conv preprocess + cascade) decode essentially exactly
    assert rep["cer"] <= 0.05
    lines = out.read_text().strip().splitlines()
    assert len(lines) == 4
    import json

    recs = [json.loads(ln) for ln in lines]
    assert all(r["transcript"] for r in recs)
