"""Batched sampling service: the production serving core.

The reference has no serving story at all — its only entry point is a
one-shot CLI (/root/reference/scripts/sample.py) that builds the model,
samples, and exits. This module is the TPU-native serving counterpart for
"run the sampler as a long-lived service": compile the full reverse chain
ONCE for a fixed serving batch shape, then micro-batch concurrent requests
into that shape so the chip always runs at its benchmarked batch operating
point (BASELINE.md: per-chip batch 32 is the measured plateau; serving odd
batch sizes would recompile per shape and run below it).

Design:

  * One compiled sampler, one shape. `ServingConfig.serve_batch` fixes the
    batch dimension; requests are packed into it and short batches are
    padded (padding rows are computed and discarded — on TPU the fixed
    shape is what keeps the one compiled executable; a ragged batch would
    recompile).
  * Micro-batching with a linger window. A worker thread collects queued
    requests until the batch is full or `linger_ms` has passed since the
    first queued request, then runs one chain. Latency cost is bounded by
    the linger; occupancy is reported in `stats()`.
  * Per-request determinism. Each request draws its own x_T from its own
    seed (`jax.random.PRNGKey(seed)`), so with a deterministic sampler
    (DDIM eta=0, dpm++) the output for (seed, label) is independent of
    which batch the request landed in or its position there. Stochastic
    per-step noise (DDPM) is drawn from the service RNG per batch.
  * Serving modes are frozen at construction: dtype (incl. calibrated int8
    via a pre-frozen variables dict), encoder_cache, guidance_interval —
    the same levers bench.py composes into the max serving stack.

Threading model: `submit()` is thread-safe and returns a
`concurrent.futures.Future`; all device work happens on the single worker
thread (one executable, no cross-thread dispatch races).
"""

from __future__ import annotations

import dataclasses
import threading
import time
from concurrent.futures import Future

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ServingConfig", "SamplerService"]


@dataclasses.dataclass(frozen=True)
class ServingConfig:
    """Frozen serving-time configuration for one `SamplerService`."""

    serve_batch: int = 32
    linger_ms: float = 5.0
    encoder_cache: int | None = None
    guidance_interval: tuple[float, float] | None = None
    rng_seed: int = 0


@dataclasses.dataclass
class _Request:
    labels: np.ndarray | None  # [n] int32, or None (unconditional model)
    n: int
    seed: int
    future: Future
    enqueued_at: float


class SamplerService:
    """Micro-batching sampler over one warm-compiled reverse chain.

    Parameters
    ----------
    diffusion:
        A configured `Diffusion` (sampler choice, steps, guidance — the
        chain the service serves).
    params:
        Params pytree, or the ``{"params", "quant"}`` variables dict from
        `ops.quant.build_int8_variables` for calibrated int8 serving.
    config:
        `ServingConfig`. ``serve_batch`` is the compiled batch shape.
    mesh:
        Optional `jax.sharding.Mesh` (from `parallel.mesh.make_mesh`).
        When given, the service compiles its chain data-parallel: the
        serve batch is sharded over the mesh's 'data' axis and params are
        replicated, so a multi-chip host serves with every chip busy
        instead of leaving all but the default device idle. serve_batch
        must divide evenly over the data axis (the fixed compiled shape).
    """

    def __init__(self, diffusion, params, config: ServingConfig | None = None,
                 mesh=None):
        self.diffusion = diffusion
        self.config = config or ServingConfig()
        if self.config.serve_batch < 1:
            raise ValueError("serve_batch must be >= 1")
        self.mesh = mesh
        if mesh is not None:
            from ..parallel.mesh import replicated

            n_data = mesh.shape["data"]
            if self.config.serve_batch % n_data:
                raise ValueError(
                    f"serve_batch={self.config.serve_batch} must be a "
                    f"multiple of the mesh 'data' axis size {n_data}"
                )
            params = jax.device_put(params, replicated(mesh))
        self.params = params

        model = diffusion.model
        self._sample_shape = (
            model.resolution, model.resolution, model.in_channels
        )
        self._conditional = bool(model.conditional)
        self._num_classes = getattr(model, "num_classes", None)

        self._rng = jax.random.PRNGKey(self.config.rng_seed)
        self._batch_counter = 0
        self._queue: list[_Request] = []
        self._cond = threading.Condition()
        self._closed = False
        self._warm = False
        self._stats = {
            "requests": 0, "samples": 0, "batches": 0, "padded_rows": 0,
            "sample_seconds": 0.0,
        }

        self._worker = threading.Thread(
            target=self._run, name="sampler-service", daemon=True
        )
        self._worker.start()

    # ------------------------------------------------------------------
    # Public API
    # ------------------------------------------------------------------

    def warmup(self):
        """Compile and run the chain once on a dummy batch (blocking).

        Serving the first real request through a cold sampler would pay
        the full XLA compile (~tens of seconds for the big presets) inside
        that request's latency; call this at startup instead.
        """
        x = self._draw_x(0, self.config.serve_batch)
        y = None
        if self._conditional:
            y = jnp.zeros((self.config.serve_batch,), jnp.int32)
        out = self._denoise(x, y, jax.random.PRNGKey(0))
        jax.block_until_ready(out)
        self._warm = True
        return self

    def submit(self, labels=None, n: int | None = None,
               seed: int | None = None) -> Future:
        """Enqueue a sampling request; returns a Future of [n, H, W, C]
        float32 images in [-1, 1].

        ``labels``: per-sample class labels (conditional models only).
        ``n``: sample count (defaults to len(labels) or 1).
        ``seed``: per-request x_T seed — same (seed, labels) reproduces
        the same start noise regardless of batching.
        """
        if self._conditional:
            if labels is None:
                raise ValueError("model is class-conditional: pass labels")
            labels = np.asarray(labels, dtype=np.int32).reshape(-1)
            if self._num_classes is not None and (
                (labels < 0).any() or (labels >= self._num_classes).any()
            ):
                raise ValueError(
                    f"labels must be in [0, {self._num_classes})"
                )
            n = len(labels) if n is None else int(n)
            if n != len(labels):
                raise ValueError("n != len(labels)")
        else:
            if labels is not None:
                raise ValueError("model is unconditional: labels not allowed")
            n = 1 if n is None else int(n)
        if not 1 <= n <= self.config.serve_batch:
            raise ValueError(
                f"request size {n} not in [1, serve_batch="
                f"{self.config.serve_batch}]"
            )

        fut: Future = Future()
        req = _Request(
            labels=labels, n=n,
            seed=int(seed) if seed is not None else
            np.random.SeedSequence().entropy % (2 ** 31),
            future=fut, enqueued_at=time.monotonic(),
        )
        with self._cond:
            if self._closed:
                raise RuntimeError("service is closed")
            self._queue.append(req)
            self._stats["requests"] += 1
            self._cond.notify_all()
        return fut

    def sample(self, labels=None, n: int | None = None,
               seed: int | None = None, timeout: float | None = None):
        """Blocking convenience wrapper around `submit()`."""
        return self.submit(labels, n, seed).result(timeout=timeout)

    def stats(self) -> dict:
        with self._cond:
            s = dict(self._stats)
            s["warm"] = self._warm
            s["queue_depth"] = len(self._queue)
        s["serve_batch"] = self.config.serve_batch
        if s["batches"]:
            served = s["samples"] + s["padded_rows"]
            s["occupancy"] = s["samples"] / served if served else 0.0
            if s["sample_seconds"] > 0:
                s["samples_per_sec"] = s["samples"] / s["sample_seconds"]
        return s

    def close(self):
        """Stop the worker; outstanding requests are failed."""
        with self._cond:
            self._closed = True
            pending, self._queue = self._queue, []
            self._cond.notify_all()
        for req in pending:
            req.future.set_exception(RuntimeError("service closed"))
        self._worker.join(timeout=30)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ------------------------------------------------------------------
    # Worker
    # ------------------------------------------------------------------

    def _draw_x(self, seed: int, n: int):
        return jax.random.normal(
            jax.random.PRNGKey(seed), (n, *self._sample_shape),
            dtype=jnp.float32,
        )

    def _denoise(self, x, y, rng):
        cfg = self.config
        if self.mesh is not None:
            from ..parallel.mesh import data_sharding

            x = jax.device_put(x, data_sharding(self.mesh, x.ndim))
            if y is not None:
                y = jax.device_put(y, data_sharding(self.mesh, 1))
        return self.diffusion.denoise(
            self.params, rng, x=x, y=y, batch_size=x.shape[0],
            encoder_cache=cfg.encoder_cache,
            guidance_interval=cfg.guidance_interval,
        )

    def _collect(self) -> list[_Request] | None:
        """Block until there is work, apply the linger window, and pack
        head-of-queue requests into <= serve_batch rows (FIFO — a request
        that doesn't fit the remaining space waits for the next batch)."""
        cap = self.config.serve_batch
        with self._cond:
            while not self._queue and not self._closed:
                self._cond.wait()
            if not self._queue:
                return None  # closed and drained
            deadline = self._queue[0].enqueued_at + self.config.linger_ms / 1e3
            while not self._closed:
                rows = 0
                for r in self._queue:
                    if rows + r.n > cap:
                        rows = cap
                        break
                    rows += r.n
                remaining = deadline - time.monotonic()
                if rows >= cap or remaining <= 0:
                    break
                self._cond.wait(timeout=remaining)
            batch, rows = [], 0
            while self._queue and rows + self._queue[0].n <= cap:
                req = self._queue.pop(0)
                batch.append(req)
                rows += req.n
            return batch

    def _run(self):
        while True:
            batch = self._collect()
            if not batch:
                # None: closed and drained. Empty list: close() raced the
                # linger wait and drained/failed the queued requests — do
                # NOT run a full chain on pure padding; just exit.
                return
            try:
                self._serve_batch(batch)
            except Exception as e:  # propagate to every waiting caller
                for req in batch:
                    if not req.future.done():
                        req.future.set_exception(e)

    def _serve_batch(self, batch: list[_Request]):
        cap = self.config.serve_batch
        rows = sum(r.n for r in batch)
        pad = cap - rows

        xs = [self._draw_x(r.seed, r.n) for r in batch]
        if pad:
            xs.append(jnp.zeros((pad, *self._sample_shape), jnp.float32))
        x = jnp.concatenate(xs, axis=0) if len(xs) > 1 else xs[0]

        y = None
        if self._conditional:
            ys = np.zeros((cap,), np.int32)
            off = 0
            for r in batch:
                ys[off:off + r.n] = r.labels
                off += r.n
            y = jnp.asarray(ys)

        rng = jax.random.fold_in(self._rng, self._batch_counter)
        self._batch_counter += 1

        t0 = time.monotonic()
        out = np.asarray(self._denoise(x, y, rng), dtype=np.float32)
        elapsed = time.monotonic() - t0

        with self._cond:
            self._stats["batches"] += 1
            self._stats["samples"] += rows
            self._stats["padded_rows"] += pad
            self._stats["sample_seconds"] += elapsed
        self._warm = True

        off = 0
        for r in batch:
            r.future.set_result(out[off:off + r.n])
            off += r.n
