"""Serving-path overhead benchmark: batcher + HTTP vs the raw jitted sampler.

Stands the full serving stack (SamplerEngine -> BatchingEngine -> HTTP) up
on the clouds-config UNet at the headline protocol (DDIM-50, 256px, B=8)
and drives it with concurrent clients, reporting end-to-end images/sec and
request latency percentiles next to the raw sampler number (bench.py's
2.37 img/s/chip). The point is to measure what the serving machinery costs
on top of the compiled sampler: target is <5% (the batcher adds one host
gather + PNG encode per request; the device program is identical).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_serving.py \
           [--requests 24] [--clients 8] [--steps 50] [--size 256] [--smoke]
"""

from __future__ import annotations

import argparse
import concurrent.futures
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=24)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU config to exercise the harness")
    args = ap.parse_args()

    from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
    from eo_diffusion_tpu.models.unet import UNet, UNetConfig, unet_clouds
    from eo_diffusion_tpu.serving.engine import (BatchingEngine, SamplerEngine,
                                                 ServingConfig)
    from eo_diffusion_tpu.serving.http import make_server, serve_forever

    if args.smoke:
        args.size, args.steps, args.requests, args.clients = 8, 3, 6, 3
        ucfg = UNetConfig(image_size=8, in_channels=3, model_channels=32,
                          out_channels=3, num_res_blocks=1,
                          attention_resolutions=(), channel_mult=(1, 2),
                          num_heads=1, dtype=jnp.float32)
    else:
        ucfg = unet_clouds(args.size, dtype=jnp.bfloat16)
    model = UNet(ucfg)
    diffusion = GaussianDiffusion.create(timesteps=1000,
                                         image_size=args.size, in_channels=3)
    x0 = jnp.zeros((1, args.size, args.size, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0,
                                 jnp.zeros((1,), jnp.int32))
    B = 8
    cfg = ServingConfig(batch_size=B, sampler="ddim", steps=args.steps,
                        bf16=not args.smoke, batch_window_ms=30.0,
                        request_timeout_s=1200.0)
    engine = SamplerEngine(model, params, diffusion, args.size, 3, cfg)
    batcher = BatchingEngine(engine)

    t0 = time.time()
    warm = engine.warmup()
    print(f"warmup {warm:.1f}s", flush=True)

    # raw sampler baseline: chained device batches, scalar-fetch timed
    n_base = 3
    t0 = time.time()
    for i in range(n_base):
        engine.generate(jax.random.PRNGKey(i), None, None)
    raw_s = (time.time() - t0) / n_base
    raw_img_s = B / raw_s
    print(f"raw engine: {raw_img_s:.3f} img/s ({raw_s*1e3:.0f} ms/batch)",
          flush=True)

    srv, port = make_server(batcher, {"data_range": (-1.0, 1.0)}, port=0)
    serve_forever(srv, background=True)
    base = f"http://127.0.0.1:{port}"

    import urllib.request

    def one_request(i):
        t0 = time.time()
        req = urllib.request.Request(
            base + "/v1/generate",
            data=json.dumps({"n": 2, "format": "npy"}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=1200) as r:
            json.loads(r.read())
        return time.time() - t0

    t0 = time.time()
    with concurrent.futures.ThreadPoolExecutor(args.clients) as ex:
        lats = list(ex.map(one_request, range(args.requests)))
    wall = time.time() - t0
    imgs = args.requests * 2
    served_img_s = imgs / wall
    lats_ms = np.sort(np.asarray(lats)) * 1e3
    stats = batcher.stats()
    out = {
        "metric": "serving_img_s", "value": round(served_img_s, 3),
        "unit": "img/s/chip",
        "raw_engine_img_s": round(raw_img_s, 3),
        "serving_overhead_pct": round(100 * (1 - served_img_s / raw_img_s), 1),
        "latency_ms_p50": round(float(lats_ms[len(lats_ms) // 2]), 1),
        "latency_ms_p95": round(float(lats_ms[int(0.95 * len(lats_ms)) - 1]), 1),
        "batches": stats["batches"], "requests": stats["requests"],
        "clients": args.clients, "steps": args.steps, "size": args.size,
    }
    print(json.dumps(out), flush=True)
    srv.shutdown()
    batcher.shutdown()
    if not args.smoke:
        with open(os.path.join(ROOT, "gallery", "serving_bench.json"),
                  "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
