"""Multi-host readiness unit tests (mock-based — no multi-process hardware;
SURVEY.md §5.8, VERDICT r1 #8). The real collective path is covered by the
virtual-mesh distributed tests; here we pin the process-level plumbing:
initialize-from-env, the per-host batch split, and _shard_batch routing
through jax.make_array_from_process_local_data when process_count > 1.
"""

import numpy as np
import pytest

import jax

from nicediffusion_tpu.parallel import multihost
from nicediffusion_tpu.parallel.mesh import make_mesh


def test_initialize_noop_without_env(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR", raising=False)
    multihost._initialized = False
    assert multihost.maybe_initialize_distributed() is False


def test_initialize_passes_env(monkeypatch):
    calls = {}

    def fake_initialize(**kwargs):
        calls.update(kwargs)

    monkeypatch.setenv("JAX_COORDINATOR", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    monkeypatch.setattr(jax.distributed, "initialize", fake_initialize)
    multihost._initialized = False
    try:
        assert multihost.maybe_initialize_distributed() is True
        assert calls == dict(
            coordinator_address="10.0.0.1:1234", num_processes=4, process_id=2
        )
        # idempotent
        calls.clear()
        assert multihost.maybe_initialize_distributed() is False
        assert calls == {}
    finally:
        multihost._initialized = False


def test_process_local_batch_size(monkeypatch):
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    assert multihost.process_local_batch_size(32) == 8
    with pytest.raises(AssertionError):
        multihost.process_local_batch_size(30)


def test_shard_batch_uses_process_local_assembly(monkeypatch, tmp_path):
    """When process_count > 1, Trainer._shard_batch must assemble the global
    array from process-local data instead of device_put (which requires the
    full global batch on every host)."""
    from nicediffusion_tpu.models.unet import DiffusionModel
    from nicediffusion_tpu.training import trainer as trainer_mod
    from nicediffusion_tpu.training.data import synthetic_batches

    model = DiffusionModel(
        resolution=8, in_channels=1, model_channels=32, out_channels=2,
        num_res_blocks=1, attention_resolutions=(4,), channel_mult=(1, 2),
        num_heads=2, num_classes=4,
    )
    mesh = make_mesh(num_data=8)
    t = trainer_mod.Trainer(
        model=model,
        diffusion_args=dict(
            original_num_steps=10, rescaled_num_steps=10,
            sampling_var_type="learned_interpolation", loss_type="hybrid",
            beta_schedule="cosine",
        ),
        dataloader=synthetic_batches(
            batch_size=16, resolution=8, channels=1, num_classes=4
        ),
        iterations=0, batch_size=16, lr=1e-3, weight_decay=1e-4,
        checkpoint_dir=str(tmp_path), mesh=mesh,
    )

    recorded = []
    real = jax.make_array_from_process_local_data

    def recording(sharding, local_data, *a, **k):
        recorded.append(np.shape(local_data))
        return real(sharding, local_data, *a, **k)

    monkeypatch.setattr(
        trainer_mod.jax, "process_count", lambda: 2, raising=False
    )
    monkeypatch.setattr(
        trainer_mod.jax, "make_array_from_process_local_data", recording,
        raising=False,
    )
    # single real process: the "local" share is the full batch here, but the
    # assembly API is what multi-host requires; we pin that it is used
    batch = np.zeros((16, 8, 8, 1), np.float32)
    labels = np.arange(16, dtype=np.int32) % 4
    b, l = t._shard_batch(batch, labels)
    assert recorded == [(16, 8, 8, 1), (16,)]
    assert b.shape == (16, 8, 8, 1) and l.shape == (16,)
