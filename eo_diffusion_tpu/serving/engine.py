"""Fixed-shape jitted sampling + request-coalescing batcher.

Design (TPU-first):

* **One compiled program.** The sampler configuration (kind, steps, eta,
  spacing, guidance) and the device batch size ``B`` are fixed at engine
  construction; every request is served by the same jitted full-trajectory
  ``lax.scan``. Variable request sizes are handled by *packing*, never by
  recompiling: requests coalesce into ``B`` rows, short batches are padded
  (pad rows are computed and discarded — static shapes are what keep XLA's
  tiling and the compile cache stable).
* **Params are threaded as jit arguments**, not closed over: closed-over
  trees become literal constants in the compile payload (the HTTP-413
  remote-compile failure mode documented in CLAUDE.md) and would re-trace
  on every hot-swap.
* **Coalescing window.** The worker waits up to ``batch_window_ms`` after
  the first request to fill the batch — the standard serving
  latency/throughput knob. Seeded requests bypass coalescing (they run as
  their own padded batch) so ``seed`` means *reproducible bytes*, which
  packing with strangers would break.

The reference has no analog (SURVEY.md: its inference loop is an offline
eval script); this is beyond-reference serving infrastructure.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ServingConfig", "SamplerEngine", "BatchingEngine"]


@dataclasses.dataclass
class ServingConfig:
    batch_size: int = 8
    sampler: str = "ddim"  # "ddpm" | "ddim" | "dpm" | "unipc" | "flow" | "bridge"
    steps: int = 50
    eta: float = 0.0
    ddim_spacing: str = "uniform"
    flow_method: str = "euler"
    guidance_scale: float = 1.0
    # CFG-rescale phi (arXiv:2305.08891 §3.4) and limited guidance interval
    # (arXiv:2404.07724, normalized noise level) — compiled into the one
    # sampler program like guidance_scale (per-request values would retrace)
    guidance_rescale: float = 0.0
    guidance_interval: Optional[tuple] = None
    # Imagen dynamic thresholding percentile (arXiv:2205.11487): per-sample
    # pred-x0 rescale instead of the static clamp — the high-guidance_scale
    # saturation fix; DDPM-family samplers (ddpm/ddim/dpm/unipc) only
    dynamic_threshold: Optional[float] = None
    # perturbed-attention guidance (arXiv:2403.17377): extrapolate away from
    # the same model with self-attention -> identity (diffusion/pag.py).
    # Compiled into the sampler program; needs no condition, so it works on
    # the unconditional presets where guidance_scale cannot.
    pag_scale: float = 0.0
    num_classes: int = 0  # label vocabulary (0 = unconditional)
    has_null_class: bool = False  # label-CFG against the learned null row
    cond_channels: int = 0  # concat-conditioning width (0 = none)
    bf16: bool = True
    batch_window_ms: float = 20.0
    request_timeout_s: float = 300.0
    max_queue: int = 256
    # per-request image cap: n > batch_size streams through ceil(n/B) device
    # batches (one compiled program, no reshapes); this bounds how much work
    # one API call can pin the worker with
    max_request: int = 1024
    # weight-only int8 (utils/quantize.py): kernels stored int8 + per-
    # channel scales, dequantized inside the jitted program — halves param
    # HBM storage/read bandwidth at serving batch sizes (W8A16)
    int8: bool = False
    # int8 COMPUTE (W8A8, nn/primitives.int8_dense_compute): large Dense
    # matmuls run on the MXU's int8 path with in-graph per-channel weight +
    # dynamic per-tensor activation quantization. Measured win is matmul-
    # shaped (DiT proj 2.0x, MLP ~1.1x, convs ~1.0x — gallery/
    # int8_mxu_probe.json), so this is a DiT-preset lever. Composes with
    # int8 (storage) but they are independent knobs.
    int8_compute: bool = False
    # shard each device batch over all visible chips ('data' mesh axis):
    # the samplers are pure jitted scans, so multi-chip serving is one
    # out_sharding — GSPMD partitions the whole trajectory with zero
    # collectives in the loop (contract pinned by tests/test_sample_dp.py).
    # The device count must divide batch_size.
    dp: bool = False


class SamplerEngine:
    """Owns the model/params/diffusion and the one jitted sampler program.

    ``generate(params, rng, y, cond)`` always computes a full ``B``-row
    batch; callers slice out their rows. Thread-safe for concurrent calls
    (JAX dispatch is), but the BatchingEngine serializes through one worker
    anyway so device batches never interleave.
    """

    def __init__(self, model, params, diffusion, image_size: int,
                 channels: int, cfg: ServingConfig):
        self.model, self.diffusion = model, diffusion
        self.image_size, self.channels, self.cfg = image_size, channels, cfg
        self.params = self._pack_params(params)
        B = cfg.batch_size
        dtype = jnp.bfloat16 if cfg.bf16 else jnp.float32

        gkw = {}
        if cfg.dynamic_threshold is not None:
            assert cfg.sampler in ("ddpm", "ddim", "dpm", "unipc"), (
                "dynamic_threshold rescales the DDPM-family pred-x0 clamp "
                f"(ddpm/ddim/dpm/unipc); sampler={cfg.sampler} has no such "
                "site")
            gkw["dynamic_threshold"] = cfg.dynamic_threshold
        if cfg.pag_scale > 0.0:
            assert cfg.sampler in ("ddpm", "ddim", "dpm", "unipc", "flow"), (
                "pag_scale wraps the denoiser under the generative chain "
                f"(ddpm/ddim/dpm/unipc/flow); sampler={cfg.sampler} is a "
                "translation/distilled map PAG does not apply to")
        if cfg.guidance_scale != 1.0:
            # validate an actual CFG branch EXISTS at build time: without
            # one the samplers accept guidance_scale but never activate the
            # doubled batch, silently serving unguided samples — and
            # ddpm_sample has no image-uncond parameter at all
            assert cfg.sampler != "bridge", (
                "guidance_scale has no CFG branch on the bridge sampler: "
                "the translation chain starts AT the source image and "
                "bridge.sample takes no uncond/y_uncond (bridge.py)")
            can_label_cfg = bool(cfg.num_classes) and cfg.has_null_class
            can_image_cfg = cfg.cond_channels > 0 and cfg.sampler != "ddpm"
            assert can_label_cfg or can_image_cfg, (
                "guidance_scale needs a CFG branch: class conditioning with "
                "a learned null row (has_null_class, cli.train "
                "--class_dropout), or concat cond on a sampler with an "
                "image-CFG path (ddim/dpm/unipc/flow — ddpm has none)")
            gkw["guidance_scale"] = cfg.guidance_scale
            if cfg.guidance_rescale:
                gkw["guidance_rescale"] = cfg.guidance_rescale
            if cfg.guidance_interval is not None:
                gkw["guidance_interval"] = tuple(cfg.guidance_interval)

        def run(params, rng, y, cond):
            if cfg.int8:
                from eo_diffusion_tpu.utils.quantize import dequantize_tree

                params = dequantize_tree(*params)
            fn = lambda x, t, c, yy: model.apply(params, x, t, cond=c, y=yy)
            if cfg.pag_scale > 0.0:
                from eo_diffusion_tpu.diffusion.pag import pag_model_fn

                fn = pag_model_fn(fn, cfg.pag_scale)
            kw = dict(gkw)
            if cfg.guidance_scale != 1.0:
                if cfg.num_classes and cfg.has_null_class:
                    kw["y_uncond"] = jnp.full((B,), cfg.num_classes, jnp.int32)
                elif cond is not None and cfg.sampler != "ddpm":
                    kw["uncond"] = jnp.zeros_like(cond)
            if cfg.sampler == "flow":
                out = diffusion.sample(fn, rng, B, num_steps=cfg.steps,
                                       method=cfg.flow_method, cond=cond,
                                       y=y, dtype=dtype, **kw)
            elif cfg.sampler == "bridge":
                # Brownian-bridge translation: cond is the source image the
                # chain starts AT (bridge.py); eta reuses the ddim knob.
                # No CFG path (the constructor asserts guidance off here).
                out = diffusion.sample(fn, rng, B, num_steps=cfg.steps,
                                       cond=cond, y=y, dtype=dtype,
                                       eta=cfg.eta)
            elif cfg.sampler == "dpm":
                out = diffusion.dpm_sample(fn, rng, B, num_steps=cfg.steps,
                                           cond=cond, y=y, dtype=dtype, **kw)
            elif cfg.sampler == "unipc":
                out = diffusion.unipc_sample(fn, rng, B, num_steps=cfg.steps,
                                             cond=cond, y=y, dtype=dtype,
                                             **kw)
            elif cfg.sampler == "ddpm":
                out = diffusion.ddpm_sample(fn, rng, B, cond=cond, y=y,
                                            dtype=dtype, **kw)
            else:
                out = diffusion.ddim_sample(fn, rng, B, num_steps=cfg.steps,
                                            eta=cfg.eta,
                                            method=cfg.ddim_spacing,
                                            cond=cond, y=y, dtype=dtype, **kw)
            return out.x.astype(jnp.float32)

        if cfg.int8_compute:
            # trace-time routing: entering the context while jit traces
            # bakes the int8 Dense path into the program
            from eo_diffusion_tpu.nn.primitives import int8_dense_compute

            base_run = run

            def run(params, rng, y, cond):  # noqa: F811
                with int8_dense_compute():
                    return base_run(params, rng, y, cond)

        if cfg.dp and len(jax.devices()) > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from eo_diffusion_tpu.parallel.mesh import make_mesh

            n_dev = len(jax.devices())
            assert B % n_dev == 0, (
                f"dp serving shards the batch over {n_dev} devices; "
                f"batch_size {B} must divide evenly")
            self.mesh = make_mesh(jax.devices())
            # only the OUTPUT sharding is pinned; GSPMD back-propagates the
            # 'data' partition through the sampling scan (params replicate)
            self._jitted = jax.jit(
                run, out_shardings=NamedSharding(self.mesh, P("data")))
        else:
            self.mesh = None
            self._jitted = jax.jit(run)
        self._lock = threading.Lock()

    # -- shapes the batcher needs --------------------------------------------
    @property
    def batch_size(self) -> int:
        return self.cfg.batch_size

    def _blank_y(self):
        return (np.zeros((self.cfg.batch_size,), np.int32)
                if self.cfg.num_classes else None)

    def _blank_cond(self):
        if not self.cfg.cond_channels:
            return None
        return np.zeros((self.cfg.batch_size, self.image_size,
                         self.image_size, self.cfg.cond_channels), np.float32)

    def generate(self, rng: jax.Array, y: Optional[np.ndarray],
                 cond: Optional[np.ndarray]) -> np.ndarray:
        """One full device batch -> [B, H, W, C] float32 (model data range)."""
        with self._lock:
            y_j = jnp.asarray(y) if y is not None else None
            c_j = jnp.asarray(cond) if cond is not None else None
            return np.asarray(self._jitted(self.params, rng, y_j, c_j))

    def warmup(self) -> float:
        """Compile + execute once; returns the wall seconds it took."""
        t0 = time.time()
        self.generate(jax.random.PRNGKey(0), self._blank_y(),
                      self._blank_cond())
        return time.time() - t0

    def _pack_params(self, params):
        """int8 mode stores (int8_tree, scales); float mode passes through.
        The structure change is invisible downstream — params ride as one
        jit-argument pytree either way."""
        if not self.cfg.int8:
            return params
        from eo_diffusion_tpu.utils.quantize import (quantize_tree,
                                                     quantized_bytes)

        qt, st = quantize_tree(params)
        print(f"serving int8: params packed to "
              f"{quantized_bytes(qt) / 1e6:.1f} MB (weight-only W8A16)")
        return (qt, st)

    def swap_params(self, params) -> None:
        """Hot-swap checkpoint weights (no recompile: params are jit args)."""
        with self._lock:
            self.params = self._pack_params(params)


@dataclasses.dataclass
class _Request:
    n: int
    y: Optional[np.ndarray]  # [n] int32 or None
    cond: Optional[np.ndarray]  # [n, H, W, Cc] or None
    seed: Optional[int]
    # chunk index of a streamed (n > B) seeded request: the device key is
    # fold_in(PRNGKey(seed), fold). None = plain PRNGKey(seed), so chunk 0
    # of a streamed request is byte-identical to a solo n<=B request
    fold: Optional[int] = None
    done: threading.Event = dataclasses.field(default_factory=threading.Event)
    result: Optional[np.ndarray] = None
    error: Optional[BaseException] = None


class BatchingEngine:
    """Request coalescing in front of a :class:`SamplerEngine`.

    ``submit(n, ...)`` blocks until the request's rows come back. A single
    worker thread packs queued requests into ``B``-row device batches:
    the first request opens a ``batch_window_ms`` window; requests arriving
    inside it join until the rows are full. Seeded requests are never
    packed with others (reproducibility contract) — they run as their own
    batch keyed by ``PRNGKey(seed)``. Requests larger than ``B`` stream
    through multiple device batches (see :meth:`submit`); ``stats()``
    counts each streamed chunk as one request at the device layer.
    """

    _STOP = object()

    def __init__(self, engine: SamplerEngine, base_seed: int = 0):
        self.engine = engine
        self.cfg = engine.cfg
        self._q: queue.Queue = queue.Queue(maxsize=self.cfg.max_queue)
        self._base_key = jax.random.PRNGKey(base_seed)
        self._batches = 0
        self._images = 0
        self._requests = 0
        self._batch_ms_sum = 0.0
        self._carry = None  # request popped but not fitting the open batch
        self._lat_ms: list = []  # request submit->done latencies (window)
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    # -- public --------------------------------------------------------------
    def _split_and_enqueue(self, n: int, y, cond, seed):
        """Validate + split a request into <=B-row chunks and enqueue them.

        ``n > batch_size`` streams: ceil(n/B) chunk requests enqueued
        together, so the worker runs them back-to-back through the one
        compiled program (full-B chunks fill a device batch outright; an
        unseeded remainder coalesces with other callers as usual). Seeded
        streams stay reproducible — chunk i runs solo under
        ``fold_in(PRNGKey(seed), i)`` (chunk 0 under the plain key, so its
        bytes match an n<=B request with the same seed)."""
        B = self.engine.batch_size
        assert 1 <= n <= self.cfg.max_request, (
            f"n must be in [1, max_request={self.cfg.max_request}], got {n}")
        if y is not None:
            y = np.asarray(y, np.int32).reshape(n)
            assert self.cfg.num_classes, "engine is not class-conditional"
            # both bounds: a negative label would be silently clamped by
            # JAX's gather semantics into a wrong class (review finding)
            assert 0 <= int(y.min()) and int(y.max()) < self.cfg.num_classes, (
                f"label out of vocabulary [0, {self.cfg.num_classes}): "
                f"{y.tolist()}")
        if cond is not None:
            cond = np.asarray(cond, np.float32)
            assert self.cfg.cond_channels, "engine is not concat-conditioned"
            want = (n, self.engine.image_size, self.engine.image_size,
                    self.cfg.cond_channels)
            assert cond.shape == want, (cond.shape, want)
        reqs = []
        off = 0
        while off < n:
            k = min(B, n - off)
            reqs.append(_Request(
                n=k,
                y=None if y is None else y[off:off + k],
                cond=None if cond is None else cond[off:off + k],
                seed=seed,
                fold=(off // B if seed is not None and off else None)))
            off += k
        for req in reqs:
            self._q.put(req, timeout=self.cfg.request_timeout_s)
        return reqs

    def _record_latency(self, t0: float) -> None:
        self._lat_ms.append((time.time() - t0) * 1e3)
        if len(self._lat_ms) > 1024:  # bounded window for the percentiles
            del self._lat_ms[:512]

    def submit(self, n: int, y=None, cond=None,
               seed: Optional[int] = None) -> np.ndarray:
        """Sample ``n`` images; blocks until ALL rows come back (see
        :meth:`_split_and_enqueue` for the n > batch_size streaming split;
        :meth:`submit_iter` yields the chunks as they finish instead)."""
        t0 = time.time()
        reqs = self._split_and_enqueue(n, y, cond, seed)
        # one shared deadline for the whole request, not per chunk
        deadline = t0 + self.cfg.request_timeout_s
        error = timed_out = None
        for req in reqs:
            if not req.done.wait(max(deadline - time.time(), 0.0)):
                timed_out = True
                break  # later chunks can't have finished in order anyway
            if req.error is not None and error is None:
                error = req.error
        if timed_out:
            raise TimeoutError(f"sampling did not finish within "
                               f"{self.cfg.request_timeout_s}s")
        if error is not None:
            raise error
        self._record_latency(t0)
        if len(reqs) == 1:
            return reqs[0].result
        return np.concatenate([r.result for r in reqs], axis=0)

    def submit_iter(self, n: int, y=None, cond=None,
                    seed: Optional[int] = None):
        """Streaming variant of :meth:`submit`: returns an iterator that
        yields each chunk's rows ([<=B, H, W, C] float32, in request order)
        AS SOON AS its device batch completes, instead of blocking for the
        whole request. The chunks are enqueued eagerly (before the first
        ``next()``), so the device starts working immediately; concatenating
        every yielded array reproduces ``submit``'s result bytes (same
        chunking, same per-chunk keys). Raises TimeoutError / the engine
        error from the failing chunk onward."""
        t0 = time.time()
        reqs = self._split_and_enqueue(n, y, cond, seed)
        deadline = t0 + self.cfg.request_timeout_s

        def _gen():
            for req in reqs:
                if not req.done.wait(max(deadline - time.time(), 0.0)):
                    raise TimeoutError(
                        f"sampling did not finish within "
                        f"{self.cfg.request_timeout_s}s")
                if req.error is not None:
                    raise req.error
                yield req.result
            self._record_latency(t0)

        return _gen()

    def stats(self) -> dict:
        lat = sorted(self._lat_ms)
        pct = (lambda q: lat[min(int(q * len(lat)), len(lat) - 1)]
               if lat else 0.0)
        return {
            "requests": self._requests,
            "images": self._images,
            "batches": self._batches,
            "avg_batch_ms": (self._batch_ms_sum / self._batches
                             if self._batches else 0.0),
            "latency_ms_p50": pct(0.50),
            "latency_ms_p95": pct(0.95),
            "queue_depth": self._q.qsize(),
            "batch_size": self.engine.batch_size,
            "sampler": self.cfg.sampler,
            "steps": self.cfg.steps,
        }

    def shutdown(self) -> None:
        self._q.put(self._STOP)
        self._worker.join(timeout=10)

    # -- worker --------------------------------------------------------------
    def _gather(self, first: _Request):
        """Coalesce: [first] + whatever arrives inside the window & fits."""
        B = self.engine.batch_size
        group, rows = [first], first.n
        if first.seed is not None:
            return group  # seeded: solo batch
        deadline = time.time() + self.cfg.batch_window_ms / 1e3
        while rows < B:
            left = deadline - time.time()
            if left <= 0:
                break
            try:
                nxt = self._q.get(timeout=left)
            except queue.Empty:
                break
            if nxt is self._STOP:
                self._q.put(self._STOP)  # re-post for the outer loop
                break
            if nxt.seed is not None or rows + nxt.n > B:
                # can't join this batch: carry it to the FRONT of the next
                # group (a queue re-post would put it behind later arrivals)
                self._carry = nxt
                break
            group.append(nxt)
            rows += nxt.n
        return group

    def _run_group(self, group):
        B = self.engine.batch_size
        rows = sum(r.n for r in group)
        y = cond = None
        if self.cfg.num_classes:
            y = np.zeros((B,), np.int32)
        if self.cfg.cond_channels:
            cond = self.engine._blank_cond()
        off = 0
        for r in group:
            if r.y is not None:
                y[off:off + r.n] = r.y
            if r.cond is not None:
                cond[off:off + r.n] = r.cond
            off += r.n
        if group[0].seed is not None:
            key = jax.random.PRNGKey(group[0].seed)
            if group[0].fold is not None:  # streamed chunk i>0 of a seeded
                key = jax.random.fold_in(key, group[0].fold)  # request
        else:
            key = jax.random.fold_in(self._base_key, self._batches)
        t0 = time.time()
        out = self.engine.generate(key, y, cond)
        ms = (time.time() - t0) * 1e3
        self._batches += 1
        self._images += rows
        self._requests += len(group)
        self._batch_ms_sum += ms
        off = 0
        for r in group:
            r.result = out[off:off + r.n]
            off += r.n
            r.done.set()

    def _loop(self):
        while True:
            if self._carry is not None:
                first, self._carry = self._carry, None
            else:
                first = self._q.get()
            if first is self._STOP:
                # fail anything still waiting instead of hanging its caller
                leftovers = [self._carry] if self._carry is not None else []
                while True:
                    try:
                        r = self._q.get_nowait()
                    except queue.Empty:
                        break
                    if r is not self._STOP:
                        leftovers.append(r)
                for r in leftovers:
                    r.error = RuntimeError("serving engine shut down")
                    r.done.set()
                return
            group = self._gather(first)
            try:
                self._run_group(group)
            except BaseException as e:  # propagate to every waiting caller
                for r in group:
                    r.error = e
                    r.done.set()
