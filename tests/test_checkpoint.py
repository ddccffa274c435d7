"""Checkpoint/resume of the seam loop must not change results (SURVEY §5)."""

import numpy as np

import jax.numpy as jnp

from dct_carver_tpu.oracle import reference as oracle
from dct_carver_tpu.ops.carve import carve_n_seams
from dct_carver_tpu.utils.checkpoint import carve_resumable, save_state, load_state
from dct_carver_tpu.utils.config import CarverConfig
from dct_carver_tpu.utils.progress import Metrics, StderrProgress


def _luma(rng, h, w):
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    return np.asarray(oracle.luma_bt709(img), np.float32)


def test_chunked_equals_direct(rng):
    luma = _luma(rng, 32, 48)
    cfg = CarverConfig()
    direct = carve_n_seams(jnp.asarray(luma), 9, 8, 0.0, 1.0)
    chunked = carve_resumable(luma, 9, cfg, checkpoint_every=4)
    np.testing.assert_array_equal(np.asarray(direct.vmap), np.asarray(chunked.vmap))
    np.testing.assert_array_equal(
        np.asarray(direct.energy), np.asarray(chunked.energy)
    )


def test_save_resume_roundtrip(tmp_path, rng):
    luma = _luma(rng, 24, 40)
    cfg = CarverConfig(edges=0.2, textures=0.8, blocksize=4)
    ckpt = str(tmp_path / "state.npz")

    # run 3 of 7 seams, checkpointing
    carve_resumable(luma, 7, cfg, checkpoint_path=ckpt, checkpoint_every=3)
    state, cfg2, done, total = load_state(ckpt)
    assert done == total == 7
    assert cfg2 == cfg

    # simulate preemption: checkpoint only first chunk, then resume
    partial = carve_resumable(luma, 3, cfg, checkpoint_path=ckpt, checkpoint_every=3)
    save_state(ckpt, partial, cfg, 3, 7)
    resumed = carve_resumable(None, 7, cfg, resume_from=ckpt)
    direct = carve_resumable(luma, 7, cfg)
    np.testing.assert_array_equal(np.asarray(resumed.vmap), np.asarray(direct.vmap))
    assert int(resumed.width) == 40 - 7


def test_progress_and_metrics(rng, capsys):
    luma = _luma(rng, 16, 24)
    cfg = CarverConfig()
    m = Metrics(pixels=16 * 24, seams=4)
    m.start("carve")
    carve_resumable(luma, 4, cfg, checkpoint_every=2, progress=StderrProgress())
    m.stop("carve")
    s = m.summary()
    assert s["total_s"] > 0
    assert "mpix_per_s" in s
