"""Serving subsystem: batched, always-warm sampling behind an HTTP API.

The reference has no serving story at all (its inference.py is a batch
eval script with a hard-coded ``breakpoint()``, reference inference.py:130);
this package is the production-deployment surface the framework adds:

* :mod:`~eo_diffusion_tpu.serving.engine` — a fixed-shape jitted sampler
  (compiled once, params threaded as arguments) plus a request-coalescing
  batcher: concurrent requests are packed into one device batch within a
  latency window, so serving throughput rides the same
  compiled-``lax.scan`` samplers the benchmarks measure.
* :mod:`~eo_diffusion_tpu.serving.http` — a dependency-free
  ``ThreadingHTTPServer`` JSON API (/v1/generate, /healthz, /stats).
* ``cli/serve.py`` — the entry point (``python -m
  eo_diffusion_tpu.cli.serve --preset ... --ckpt ...``).
"""

from eo_diffusion_tpu.serving.engine import (  # noqa: F401
    BatchingEngine,
    SamplerEngine,
    ServingConfig,
)
