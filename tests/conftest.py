"""Test configuration: force JAX onto CPU with a virtual 8-device mesh so
multi-chip sharding paths are exercised without TPU hardware (the reference
has no equivalent — its GPU/multi-GPU tests are skip-gated in CI; see
/root/reference/tests/conftest.py:31-41)."""

import os

# must be set before the jax backend initializes; note this machine's
# sitecustomize pre-imports jax for the axon TPU plugin, so the env var alone
# is not enough — jax.config.update below is what actually switches platform
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


def make_blob_image(shape=(256, 256), n_blobs=8, seed=7, dtype=np.uint8):
    """Synthetic EM-like image: Gaussian blobs on noise (mirrors the
    reference's seeded blob fixtures, tests/test_button_widgets.py:25-50)."""
    rgen = np.random.default_rng(seed)
    h, w = shape
    img = rgen.normal(0.5, 0.08, size=shape)
    yy, xx = np.mgrid[0:h, 0:w]
    for _ in range(n_blobs):
        cy, cx = rgen.integers(0, h), rgen.integers(0, w)
        sig = rgen.uniform(min(h, w) * 0.03, min(h, w) * 0.08)
        img -= 0.4 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sig**2))
    img = np.clip(img, 0, 1)
    return (img * np.iinfo(dtype).max).astype(dtype)


@pytest.fixture
def blob_image_2d():
    return make_blob_image()


@pytest.fixture
def blob_volume_3d():
    vol = np.stack([make_blob_image((96, 96), n_blobs=5, seed=s) for s in range(32)])
    return vol
