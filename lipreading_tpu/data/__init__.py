"""Data subsystem (ref: src/utils/data + generate_dataview.py — SURVEY.md §3).

    video.py     host-side clip decode (OpenCV) — the only stage that stays
                 on CPU (no TPU video codec; SURVEY.md §3 ffmpeg row)
    dataview.py  cached preprocessed shards ("dataviews"): builder + reader
    dataset.py   bucketed, padded, deterministic-resumable batch iteration
    pipeline.py  async host->device feed with preprocessing fused on device
"""
