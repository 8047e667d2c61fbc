"""Coverage for the utility layers: checkpoint IO across all three formats,
image helpers, data pipeline utilities, and the step timer."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nicediffusion_tpu.training.data import cycle, rescale_to_unit, synthetic_batches
from nicediffusion_tpu.utils.checkpoint import load_params, save_params_npz
from nicediffusion_tpu.utils.image import (
    grayscale_to_rgb,
    load_start_image,
    save_image,
    to_uint8,
)
from nicediffusion_tpu.utils.profiling import StepTimer


def _params():
    return {
        "downsampling_0": {"layers_0": {"kernel": np.ones((3, 3, 1, 4), np.float32),
                                        "bias": np.zeros((4,), np.float32)}},
        "out": {"layers_0": {"scale": np.full((4,), 2.0, np.float32)}},
    }


def test_npz_round_trip(tmp_path):
    p = _params()
    path = str(tmp_path / "params.npz")
    save_params_npz(p, path)
    back = load_params(path)
    assert back.keys() == p.keys()
    np.testing.assert_array_equal(
        back["downsampling_0"]["layers_0"]["kernel"],
        p["downsampling_0"]["layers_0"]["kernel"],
    )
    np.testing.assert_array_equal(back["out"]["layers_0"]["scale"],
                                  p["out"]["layers_0"]["scale"])


def test_torch_pt_load(tmp_path):
    import torch

    sd = {
        "downsampling.0.0.weight": torch.ones(4, 1, 3, 3),
        "downsampling.0.0.bias": torch.zeros(4),
    }
    path = str(tmp_path / "model.pt")
    torch.save(sd, path)
    params = load_params(path)
    assert params["downsampling_0"]["layers_0"]["kernel"].shape == (3, 3, 1, 4)


def test_load_params_rejects_unknown_format(tmp_path):
    path = tmp_path / "weights.bin"
    path.write_bytes(b"xx")
    with pytest.raises(ValueError):
        load_params(str(path))


def test_image_round_trip(tmp_path):
    img = np.linspace(-1, 1, 16 * 16 * 3, dtype=np.float32).reshape(16, 16, 3)
    u8 = to_uint8(img)
    assert u8.dtype == np.uint8 and u8.min() >= 0 and u8.max() <= 255
    path = str(tmp_path / "img.png")
    save_image(u8, path)
    # load_start_image: resize + [-1, 1] (reference sample.py:55-58 semantics)
    back = load_start_image(path, 8)
    assert back.shape == (8, 8, 3)
    assert back.min() >= -1.0 and back.max() <= 1.0


def test_grayscale_inversion():
    x = np.zeros((2, 4, 4, 1), dtype=np.uint8)
    rgb = grayscale_to_rgb(x)
    assert rgb.shape == (2, 4, 4, 3)
    assert (rgb == 255).all()  # black inverts to white (reference sample.py:98-100)


def test_cycle_and_rescale():
    batches = cycle([1, 2])
    assert [next(batches) for _ in range(5)] == [1, 2, 1, 2, 1]
    np.testing.assert_allclose(rescale_to_unit(np.array([0.0, 0.5, 1.0])),
                               [-1.0, 0.0, 1.0])


def test_synthetic_batches_deterministic():
    a = next(synthetic_batches(4, 8, 1, 3, seed=5))
    b = next(synthetic_batches(4, 8, 1, 3, seed=5))
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    assert a[0].shape == (4, 8, 8, 1) and a[0].min() >= -1 and a[0].max() <= 1


def test_step_timer():
    t = StepTimer(window=3)
    assert t.tick() is None  # first tick has no interval
    for _ in range(4):
        assert t.tick() >= 0.0
    assert t.steps_per_sec > 0
