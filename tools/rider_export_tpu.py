"""Rider: AOT export round-trip ON THE CHIP.

Exports a real-geometry sampler (clouds64 UNet, DDIM-8) through
serving/export.py on the TPU backend, reloads the artifact from disk,
and checks byte parity between the live engine and the deserialized
program. This is the deployment claim the CPU tests can't make: the
serialized StableHLO carries whatever TPU custom calls the program uses
(Mosaic attention at larger T), and `Exported.call` must reproduce the
live bytes through the axon tunnel.

Run (chip): PYTHONPATH=/root/repo:$PYTHONPATH python tools/rider_export_tpu.py
"""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    import jax

    from eo_diffusion_tpu.cli import serve as serve_cli
    from eo_diffusion_tpu.serving.export import export_engine, load_model

    print(f"devices: {jax.devices()}")
    args = serve_cli.parse_args([
        "--preset", "clouds64-attn", "--batch_size", "4",
        "--sampler", "ddim", "--sampler_steps", "8",
        "--cond_type", "concat",  # the cloud-removal serving shape
    ])
    engine, batcher, meta = serve_cli.build_engine(args)
    batcher.shutdown()
    out_dir = os.path.join(ROOT, "logs", "export_tpu_artifact")

    t0 = time.time()
    manifest = export_engine(engine, out_dir)
    t_export = time.time() - t0
    size_mb = os.path.getsize(os.path.join(out_dir, "sampler.stablehlo")) / 1e6
    print(f"export: {t_export:.1f}s  stablehlo {size_mb:.2f} MB  "
          f"params {manifest['param_bytes'] / 1e6:.1f} MB  "
          f"platforms {manifest['platforms']}")

    key = jax.random.PRNGKey(7)
    # packaged generate() falls back to the blank cond — feed the live
    # engine the same bytes so parity is byte-exact
    live = engine.generate(key, None, engine._blank_cond())
    generate, man = load_model(out_dir)
    t0 = time.time()
    packaged = generate(np.asarray(key))
    # scalar fetch happened inside np.asarray; time includes compile of the
    # deserialized module (no retrace — StableHLO straight to the compiler)
    t_first = time.time() - t0
    t0 = time.time()
    packaged2 = generate(np.asarray(key))
    t_warm = time.time() - t0
    exact = bool(np.array_equal(live, packaged))
    print(f"parity: exact={exact} first-call {t_first:.1f}s "
          f"warm {t_warm:.2f}s  max|diff|="
          f"{float(np.max(np.abs(live - packaged))):.3e}")
    assert np.array_equal(packaged, packaged2), "artifact must be deterministic"
    result = {"export_s": round(t_export, 1), "stablehlo_mb": round(size_mb, 2),
              "param_mb": round(manifest["param_bytes"] / 1e6, 1),
              "first_call_s": round(t_first, 1), "warm_call_s": round(t_warm, 2),
              "exact_parity": exact,
              "max_abs_diff": float(np.max(np.abs(live - packaged)))}
    with open(os.path.join(ROOT, "logs", "export_tpu_result.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    assert exact or result["max_abs_diff"] < 1e-5, result


if __name__ == "__main__":
    main()
