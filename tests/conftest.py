"""Test environment: force an 8-device CPU mesh (SURVEY.md §5 item 4).

Tests never touch the real TPU; the driver benches on hardware separately.
Must run before the first jax import anywhere:
* clearing PALLAS_AXON_POOL_IPS stops the axon sitecustomize from registering
  the TPU backend (it ignores JAX_PLATFORMS);
* xla_force_host_platform_device_count=8 gives the virtual device mesh used
  by the sharding tests (BASELINE config 5 without a v5e-8 slice).
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize imports jax and pins jax_platforms=axon at
# interpreter startup — env vars are too late here. Re-pin to CPU before the
# first backend initialization (backends init lazily at first use).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets")


@pytest.fixture(scope="session")
def assets():
    """Checked-in preprocessing weights (detector, ERT)."""
    if not os.path.exists(os.path.join(ASSETS, "detector.npz")):
        pytest.skip("assets not built (run scripts/train_preprocessor.py)")
    from lipreading_tpu.preproc_training import load_assets

    return load_assets(ASSETS)


@pytest.fixture(scope="session")
def clip0():
    from lipreading_tpu.fixtures import make_clip

    return make_clip(0)


@pytest.fixture(scope="session")
def golden():
    path = os.path.join(os.path.dirname(__file__), "golden", "clip0.npz")
    if not os.path.exists(path):
        pytest.skip("golden dump not built (run scripts/make_golden.py)")
    z = np.load(path)
    return {k: z[k] for k in z.files}
