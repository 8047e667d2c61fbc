"""Multi-process (multi-controller) checkpoint correctness.

Spawns TWO real OS processes, each a separate JAX controller with 2 virtual
CPU devices (``jax.distributed.initialize`` over a localhost coordinator —
the standard pod-slice topology scaled down: 2 hosts x 2 chips), runs DP
training steps on a 4-device global mesh, saves via ``Trainer.save``, and
restores via ``Trainer(resume_step=...)`` in the same processes. Verifies

  * the orbax write does not race/collide across processes (round-2 finding:
    every process used to materialise with np.asarray and write the same
    files — VERDICT.md round-2 "What's missing" #4),
  * the restored state is bitwise-identical to the saved state on every
    process (globally consistent replicated arrays).

Scope anchor: SURVEY.md §5.8 (the rebuild owns multi-host infrastructure;
the reference has none — reference trainer.py:9 TODO).
"""

import os
import socket
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
proc_id = int(sys.argv[1])
port = sys.argv[2]
ckpt_dir = sys.argv[3]
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2,
    process_id=proc_id,
)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()  # 2 local x 2 processes

import jax.numpy as jnp
from nicediffusion_tpu.models.unet import DiffusionModel
from nicediffusion_tpu.parallel.mesh import make_mesh
from nicediffusion_tpu.parallel.multihost import process_local_batch_size
from nicediffusion_tpu.training.data import synthetic_batches
from nicediffusion_tpu.training.trainer import Trainer

mesh = make_mesh(num_data=4)
GLOBAL_BATCH = 8
# data contract (parallel/multihost.py): the loader yields this process's
# local share of the global batch
local = process_local_batch_size(GLOBAL_BATCH)
assert local == 4
loader = synthetic_batches(
    batch_size=local, resolution=8, channels=1, num_classes=4, seed=proc_id
)

model = DiffusionModel(
    resolution=8, in_channels=1, model_channels=32, out_channels=2,
    num_res_blocks=1, attention_resolutions=(4,), channel_mult=(1, 2),
    num_heads=2, num_classes=4, dropout=0.0, use_adaptive_gn=True,
)
diffusion_args = dict(
    original_num_steps=10, rescaled_num_steps=10,
    sampling_var_type="learned_interpolation", loss_type="hybrid",
    beta_schedule="cosine",
)


def make_trainer(resume=None):
    return Trainer(
        model=model, diffusion_args=diffusion_args, dataloader=loader,
        iterations=2, batch_size=GLOBAL_BATCH, lr=1e-3, weight_decay=1e-4,
        checkpoint_dir=ckpt_dir, mesh=mesh, seed=0, resume_step=resume,
    )


trainer = make_trainer()
for _ in range(2):
    batch, labels = next(loader)
    batch, labels = trainer._shard_batch(batch, labels)
    trainer.rng, step_rng = jax.random.split(trainer.rng)
    trainer.state, metrics = trainer._train_step(
        trainer.state, batch, labels, step_rng
    )
assert np.isfinite(float(metrics["loss"])), metrics
saved_params = jax.device_get(trainer.state.params)
saved_ema = jax.device_get(trainer.state.ema_params)
trainer.save(2)

# fresh Trainer in the same process resumes from the multiprocess checkpoint
resumed = make_trainer(resume=2)
assert int(resumed.state.step) == 2
for a, b in zip(
    jax.tree.leaves(saved_params), jax.tree.leaves(jax.device_get(resumed.state.params))
):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
for a, b in zip(
    jax.tree.leaves(saved_ema), jax.tree.leaves(jax.device_get(resumed.state.ema_params))
):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

# and the resumed state is usable: one more step
batch, labels = next(loader)
batch, labels = resumed._shard_batch(batch, labels)
resumed.rng, step_rng = jax.random.split(resumed.rng)
resumed.state, metrics = resumed._train_step(
    resumed.state, batch, labels, step_rng
)
assert np.isfinite(float(metrics["loss"])), metrics
print(f"WORKER_{proc_id}_OK")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_checkpoint_roundtrip(tmp_path):
    port = _free_port()
    ckpt_dir = str(tmp_path / "ckpts")
    workers = []
    for pid in (0, 1):
        env = dict(os.environ)
        # each process gets 2 virtual CPU devices (conftest's 8 would give
        # 16 global and an unnecessarily wide mesh)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env.pop("JAX_PLATFORMS", None)
        env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
        workers.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER, str(pid), str(port), ckpt_dir],
                env=env, cwd=_REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = []
    for pid, proc in enumerate(workers):
        try:
            out, _ = proc.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for p in workers:
                p.kill()
            raise
        outs.append(out)
        assert proc.returncode == 0, (
            f"worker {pid} failed rc={proc.returncode}:\n{out}"
        )
    assert "WORKER_0_OK" in outs[0]
    assert "WORKER_1_OK" in outs[1]


def test_maybe_initialize_distributed_env_plumbing(monkeypatch):
    """Unit coverage of the launcher env contract (parallel/multihost.py):
    no-op without JAX_COORDINATOR, correct kwarg mapping from the env
    triple, and idempotence — scripts/train.py and scripts/sample.py call
    this on every launch, so a regression breaks real multi-host runs."""
    from nicediffusion_tpu.parallel import multihost

    calls = []
    monkeypatch.setattr(
        multihost.jax.distributed, "initialize",
        lambda **kw: calls.append(kw),
    )
    monkeypatch.setattr(multihost, "_initialized", False)

    # no-op without the coordinator env
    monkeypatch.delenv("JAX_COORDINATOR", raising=False)
    assert multihost.maybe_initialize_distributed() is False
    assert calls == []

    # full env triple maps onto initialize kwargs
    monkeypatch.setenv("JAX_COORDINATOR", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "3")
    assert multihost.maybe_initialize_distributed() is True
    assert calls == [dict(
        coordinator_address="10.0.0.1:1234", num_processes=4, process_id=3,
    )]

    # idempotent: a second call never re-initializes
    assert multihost.maybe_initialize_distributed() is False
    assert len(calls) == 1

    # coordinator alone is enough (num_processes/process_id auto-detected)
    monkeypatch.setattr(multihost, "_initialized", False)
    monkeypatch.delenv("JAX_NUM_PROCESSES")
    monkeypatch.delenv("JAX_PROCESS_ID")
    assert multihost.maybe_initialize_distributed() is True
    assert calls[-1] == dict(coordinator_address="10.0.0.1:1234")
