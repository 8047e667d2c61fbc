"""scripts/distill.py CLI: the .distill.json sidecar must record that
guidance was baked into the weights (round-3 advisor finding: without the
``guided`` flag, following the printed sampling hint with the preset's
default ``classifier_free`` guidance silently double-guides), and the
printed hint must disable guidance at sampling time."""

import json
import os
import subprocess
import sys


import jax
import jax.numpy as jnp

from nicediffusion_tpu.models.unet import DiffusionModel
from nicediffusion_tpu.utils.checkpoint import save_params_npz
from nicediffusion_tpu.utils.config import preset_for_path

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_distill_cli_sidecar_records_baked_guidance(tmp_path):
    """Two-stage run (guided stage 1 + one halving round) on a random-init
    EMNIST-preset checkpoint: the sidecar carries guided=true, the explicit
    strength, the halved step count, and a nested odd-index grid; the
    printed hint passes --guidance_method none and the exact grid."""
    model_args, _ = preset_for_path("EMNIST_rand.npz")
    model = DiffusionModel(**model_args, dtype=jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 28, 28, 1)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,), jnp.int32),
    )["params"]
    ckpt = tmp_path / "EMNIST_rand.npz"
    save_params_npz(params, str(ckpt))

    out = tmp_path / "EMNIST_distilled.npz"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, f"{REPO}/scripts/distill.py",
         "--model_path", str(ckpt), "--save_path", str(out),
         "--distill_guidance", "2.0", "--rounds", "1",
         "--steps", "4", "--iterations", "1", "--batch_size", "4",
         "--cpu"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert out.exists()

    side = json.loads((tmp_path / "EMNIST_distilled.npz.distill.json")
                      .read_text())
    assert side["guided"] is True
    assert side["guidance_strength"] == 2.0
    assert side["steps"] == 2
    indices = side["timestep_indices"]
    assert len(indices) == 2
    assert all(isinstance(i, int) for i in indices)
    assert indices == sorted(indices)

    # the printed recipe must disable guidance (CFG is in the weights now)
    # and pin the exact nested grid (an even re-respacing would not nest)
    hint = proc.stdout
    assert "--guidance_method none" in hint
    expect = "--timestep_indices " + "/".join(str(i) for i in indices)
    assert expect in hint
