"""Test harness: run everything on a virtual 8-device CPU mesh (SURVEY §4).

Must set env vars BEFORE jax import anywhere in the test process.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# keep CLI settings persistence (utils/settings.py) away from the real
# ~/.config — tests must not leak state between runs or into the user's env
import tempfile  # noqa: E402

os.environ["DCT_CARVER_STATE_DIR"] = tempfile.mkdtemp(prefix="dct_carver_test_")

# the environment pins JAX_PLATFORMS=axon (the attached TPU) and something in
# the plugin stack re-asserts it over the env var — force the config directly
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_u8_image(rng, h, w, c=None):
    shape = (h, w) if c is None else (h, w, c)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


@pytest.fixture
def make_image(rng):
    def _make(h, w, c=None, kind="random"):
        if kind == "random":
            return random_u8_image(rng, h, w, c)
        if kind == "gradient":
            col = np.linspace(0, 255, w, dtype=np.float64)
            img = np.tile(col, (h, 1)).astype(np.uint8)
            if c:
                img = np.repeat(img[..., None], c, axis=-1)
            return img
        if kind == "flat":
            img = np.full((h, w) if c is None else (h, w, c), 128, dtype=np.uint8)
            return img
        if kind == "edges":
            img = random_u8_image(rng, h, w, c).astype(np.float64) * 0.2
            img[:, w // 3] = 255
            img[h // 3, :] = 255
            return img.astype(np.uint8)
        raise ValueError(kind)

    return _make
