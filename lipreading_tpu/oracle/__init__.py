"""CPU reference path (test oracle).

Plays the role the dlib/OpenCV per-frame loop plays in the reference
(SURVEY.md §4.1): face detection -> 68-pt landmarks -> mouth-ROI
crop/resize/grayscale/normalize, one frame at a time on the host. The build
keeps it alive purely as the parity oracle for the batched TPU kernels
(BASELINE configs 1-2); it shares model weights with the device path so the
two can be diffed element-wise.
"""

from lipreading_tpu.oracle.roi import (  # noqa: F401
    grayscale,
    mouth_box_from_landmarks,
    sample_roi,
    normalize_roi,
)
