"""Tests for the native C++ data-loading runtime (native/
nicediffusion_native.cc): idx.gz parsing, orientation fix, rescale,
epoch-exact shuffling, and agreement with the numpy pipeline."""

import gzip

import struct

import numpy as np
import pytest

from nicediffusion_tpu.training import native_loader
from nicediffusion_tpu.training.data import load_emnist_idx


def _write_idx(tmp_path, n=40, rows=6, cols=6, gz=True, split="letters"):
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, size=(n, rows, cols), dtype=np.uint8)
    labels = rng.integers(0, 5, size=(n,), dtype=np.uint8)

    opener = gzip.open if gz else open
    suffix = ".gz" if gz else ""
    img_path = tmp_path / f"emnist-{split}-train-images-idx3-ubyte{suffix}"
    lbl_path = tmp_path / f"emnist-{split}-train-labels-idx1-ubyte{suffix}"
    with opener(img_path, "wb") as f:
        f.write(struct.pack(">IIII", 0x803, n, rows, cols))
        f.write(images.tobytes())
    with opener(lbl_path, "wb") as f:
        f.write(struct.pack(">II", 0x801, n))
        f.write(labels.tobytes())
    return str(img_path), str(lbl_path), images, labels


needs_native = pytest.mark.skipif(
    not native_loader.is_available(), reason="no native toolchain"
)


@needs_native
def test_native_loader_batches(tmp_path):
    img_path, lbl_path, images, labels = _write_idx(tmp_path)
    loader = native_loader.NativeIdxLoader(img_path, lbl_path, batch_size=8,
                                           seed=3)
    assert (loader.num_examples, loader.rows, loader.cols) == (40, 6, 6)

    # one epoch = 5 batches; every example appears exactly once
    seen = []
    for _ in range(5):
        batch, lab = loader.next()
        assert batch.shape == (8, 6, 6, 1) and batch.dtype == np.float32
        assert lab.shape == (8,) and lab.dtype == np.int32
        assert batch.min() >= -1.0 and batch.max() <= 1.0
        for i in range(8):
            # undo rescale + transpose to recover the raw image
            raw = ((batch[i, :, :, 0].T + 1.0) * 127.5).round().astype(np.uint8)
            matches = np.where((images == raw).all(axis=(1, 2)))[0]
            assert len(matches) >= 1
            idx = matches[0]
            assert labels[idx] == lab[i]
            seen.append(idx)
    assert sorted(seen) == list(range(40))
    loader.close()


@needs_native
def test_native_matches_numpy_pipeline(tmp_path):
    """Orientation + rescale semantics agree with training.data
    (reference trainer.py:76 / utils.py:309-314)."""
    img_path, lbl_path, _, _ = _write_idx(tmp_path)
    np_images, np_labels = load_emnist_idx(str(tmp_path), split="letters")

    loader = native_loader.NativeIdxLoader(
        img_path, lbl_path, batch_size=40, seed=0
    )
    batch, lab = loader.next()
    # match by label + pixel content (order differs by shuffle)
    order_native = np.lexsort(batch.reshape(40, -1).T)
    order_numpy = np.lexsort(np_images.reshape(40, -1).T)
    np.testing.assert_allclose(
        batch.reshape(40, -1)[order_native],
        np_images.reshape(40, -1)[order_numpy],
        atol=1e-6,
    )
    np.testing.assert_array_equal(
        lab[order_native], np_labels[order_numpy]
    )
    loader.close()


@needs_native
def test_native_loader_uncompressed(tmp_path):
    img_path, lbl_path, _, _ = _write_idx(tmp_path, gz=False)
    loader = native_loader.NativeIdxLoader(img_path, lbl_path, batch_size=4)
    batch, lab = loader.next()
    assert batch.shape == (4, 6, 6, 1)
    loader.close()


@needs_native
def test_native_loader_bad_files(tmp_path):
    img_path, lbl_path, _, _ = _write_idx(tmp_path)
    with pytest.raises(FileNotFoundError):
        native_loader.NativeIdxLoader(
            str(tmp_path / "missing.gz"), lbl_path, batch_size=4
        )
    # mismatched labels file
    other_img, other_lbl, _, _ = _write_idx(
        tmp_path / "other", n=7
    ) if (tmp_path / "other").mkdir() or True else (None,) * 4
    with pytest.raises(FileNotFoundError):
        native_loader.NativeIdxLoader(img_path, other_lbl, batch_size=4)
