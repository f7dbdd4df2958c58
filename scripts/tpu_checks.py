"""On-chip validations that the CPU-mesh CI cannot exercise.

The test suite runs on a virtual CPU mesh (tests/conftest.py), where some
claims are trivially true; this script re-runs them on the REAL TPU, where
the interesting arithmetic actually happens. Run whenever the kernel code
or the XLA/libtpu stack changes:

    python scripts/tpu_checks.py

Checks:
- gather_bit_identity (ADVICE r4 low): the ERT pool-gather one-hot MXU
  contraction (ops/ert.py gather="matmul", the TPU default) must be
  bit-identical to take_along_axis under the TPU's bf16-decomposed
  precision=HIGHEST — the CPU test (tests/test_parity.py::
  test_ert_gather_modes_bit_identical) only proves the plain-fp32 case.
- roi_subpixel_parity: the Pallas two-matmul ROI sampler equals the XLA
  path on-chip for float boxes (the CPU suite runs the XLA interpreter
  path for Pallas).

Exit code 0 = all checks pass; prints one line per check.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp


def check_gather_bit_identity() -> bool:
    from lipreading_tpu.fixtures import make_clip
    from lipreading_tpu.oracle.ert import random_ert
    from lipreading_tpu.oracle.roi import grayscale as ogray
    from lipreading_tpu.ops import ert as dert

    frames = make_clip(11).frames[:6]
    gray_np = np.stack([ogray(f) for f in frames])
    model = random_ert(1)
    boxes = np.tile(np.asarray([[18.0, 22.0, 118.0]], np.float32),
                    (len(gray_np), 1))
    mj = dert.model_to_jax(model)
    a = np.asarray(dert.predict_batch(mj, jnp.asarray(gray_np),
                                      jnp.asarray(boxes), gather="take"))
    b = np.asarray(dert.predict_batch(mj, jnp.asarray(gray_np),
                                      jnp.asarray(boxes), gather="matmul"))
    ok = bool((a == b).all())
    nbad = int((a != b).sum())
    print(f"gather_bit_identity: {'PASS' if ok else f'FAIL ({nbad} elems)'}")
    return ok


def check_roi_subpixel_parity() -> bool:
    from lipreading_tpu.ops import roi as droi

    rng = np.random.default_rng(0)
    gray = rng.uniform(0, 255, size=(8, 160, 160)).astype(np.float32)
    boxes = np.stack([
        rng.uniform(10, 40, 8), rng.uniform(10, 40, 8),
        rng.uniform(60, 100, 8),
    ], axis=1).astype(np.float32)
    x = droi.sample_rois_pallas(jnp.asarray(gray), jnp.asarray(boxes), 40,
                                mean=0.4, std=0.1, subpixel=True)
    y = droi.sample_rois_xla(jnp.asarray(gray), jnp.asarray(boxes), 40,
                             mean=0.4, std=0.1, subpixel=True)
    diff = float(jnp.max(jnp.abs(x - y)))
    ok = diff < 1e-5
    print(f"roi_subpixel_parity: {'PASS' if ok else 'FAIL'} "
          f"(max_diff={diff:.3e})")
    return ok


def main() -> int:
    backend = jax.default_backend()
    print(f"backend: {backend}")
    if backend != "tpu":
        print("NOT on TPU — these checks only mean something on the chip",
              file=sys.stderr)
        return 2
    ok = True
    ok &= check_gather_bit_identity()
    ok &= check_roi_subpixel_parity()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
