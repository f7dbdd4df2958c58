"""Device compute: batched TPU kernels for every stage the reference runs in
native code (SURVEY.md §3 "Native components" table).

    detector.py   conv face localizer          (ref: dlib HOG+SVM, C++)
    ert.py        batched ERT landmark cascade (ref: dlib shape_predictor, C++)
    roi.py        fused crop/resize/gray/norm  (ref: OpenCV resize/cvtColor, C++)
    preprocess.py full video->ROI pipeline     (ref: the per-frame Python loop)
    ctc.py        CTC loss forward-backward    (ref: torch.nn.CTCLoss, C++/CUDA)
    decode.py     greedy + beam-search decode  (ref: Python beam loop)

All ops take batched, statically-shaped arrays and are jit/vmap/pjit-safe.
Pallas kernels auto-fall back to interpret mode on CPU (tests run on a CPU
mesh; the driver benches on real TPU).
"""
