"""Minimal client for the serving API (stdlib only).

Examples::

    python tools/serve_client.py --url http://127.0.0.1:8000 health
    python tools/serve_client.py generate -n 4 --seed 1 --out samples/
    python tools/serve_client.py generate -n 2 --y 3 --cond cloudy.npy
    python tools/serve_client.py generate -n 32 --stream --out samples/
    python tools/serve_client.py reload --ckpt logs/run/steps_00001000
    python tools/serve_client.py stats
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import os
import sys
import urllib.request


def _call(url, path, payload=None, timeout=1200):
    if payload is None:
        req = urllib.request.Request(url + path)
    else:
        req = urllib.request.Request(
            url + path, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return json.loads(r.read())
    except urllib.error.HTTPError as e:
        err = json.loads(e.read())
        print(f"HTTP {e.code}: {err.get('error')}", file=sys.stderr)
        sys.exit(1)


def _generate_stream(args, payload):
    """Consume /v1/generate_stream NDJSON lines (urllib de-chunks for us),
    writing outputs incrementally as each device batch lands."""
    import time

    req = urllib.request.Request(
        args.url + "/v1/generate_stream", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    os.makedirs(args.out, exist_ok=True)
    t0, wrote = time.time(), 0
    with urllib.request.urlopen(req, timeout=1200) as r:
        for raw in r:
            line = json.loads(raw)
            if "error" in line:
                print(f"stream error: {line['error']}", file=sys.stderr)
                sys.exit(1)
            if line.get("done"):
                print(f"done: {line['images_total']} image(s) in "
                      f"{time.time() - t0:.1f}s -> {args.out}/")
                break
            if args.npy:
                import numpy as np

                arr = np.load(io.BytesIO(base64.b64decode(line["npy_b64"])),
                              allow_pickle=False)
                p = os.path.join(args.out, f"chunk_{line['chunk']:04d}.npy")
                np.save(p, arr)
                wrote += arr.shape[0]
            else:
                for b64 in line["images"]:
                    p = os.path.join(args.out, f"sample_{wrote}.png")
                    with open(p, "wb") as f:
                        f.write(base64.b64decode(b64))
                    wrote += 1
            print(f"chunk {line['chunk']}: {wrote} image(s) at "
                  f"+{time.time() - t0:.1f}s")


def main():
    ap = argparse.ArgumentParser(description="eo_diffusion_tpu serve client")
    ap.add_argument("cmd", choices=["health", "stats", "generate", "reload"])
    ap.add_argument("--url", default="http://127.0.0.1:8000")
    ap.add_argument("-n", type=int, default=1)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--y", type=int, nargs="+", default=None,
                    help="class label(s): one per sample or one for all")
    ap.add_argument("--cond", type=str, default=None,
                    help=".npy conditioning view [n,H,W,C] float32")
    ap.add_argument("--out", type=str, default="serve_out",
                    help="directory for the returned PNGs")
    ap.add_argument("--npy", action="store_true",
                    help="fetch the raw float array instead of PNGs")
    ap.add_argument("--stream", action="store_true",
                    help="use /v1/generate_stream: write each device batch "
                         "as it arrives instead of waiting for all of n")
    ap.add_argument("--ckpt", type=str, default=None, help="for reload")
    args = ap.parse_args()

    if args.cmd == "health":
        print(json.dumps(_call(args.url, "/healthz"), indent=2))
    elif args.cmd == "stats":
        print(json.dumps(_call(args.url, "/stats"), indent=2))
    elif args.cmd == "reload":
        assert args.ckpt, "--ckpt required"
        print(json.dumps(_call(args.url, "/v1/reload", {"ckpt": args.ckpt})))
    else:
        payload = {"n": args.n}
        if args.seed is not None:
            payload["seed"] = args.seed
        if args.y is not None:
            payload["y"] = args.y if len(args.y) > 1 else args.y[0]
        if args.cond:
            import numpy as np

            arr = np.load(args.cond).astype(np.float32)
            buf = io.BytesIO()
            np.save(buf, arr)
            payload["cond_b64"] = base64.b64encode(buf.getvalue()).decode()
        if args.npy:
            payload["format"] = "npy"
        if args.stream:
            _generate_stream(args, payload)
            return
        resp = _call(args.url, "/v1/generate", payload)
        if args.npy:
            import numpy as np

            arr = np.load(io.BytesIO(base64.b64decode(resp["npy_b64"])),
                          allow_pickle=False)
            out = os.path.join(args.out, "samples.npy")
            os.makedirs(args.out, exist_ok=True)
            np.save(out, arr)
            print(f"{arr.shape} -> {out}")
        else:
            os.makedirs(args.out, exist_ok=True)
            for i, b64 in enumerate(resp["images"]):
                p = os.path.join(args.out, f"sample_{i}.png")
                with open(p, "wb") as f:
                    f.write(base64.b64decode(b64))
            print(f"{len(resp['images'])} png(s) -> {args.out}/")


if __name__ == "__main__":
    main()
