"""CPU-feature keying for persistent XLA compile caches (ROADMAP r5 #4).

The test suite's ``.jax_cache_tests`` holds CPU AOT executables. After a VM
recycle the new host can have different CPU features; stale entries then
SIGSEGV/SIGILL the suite mid-run (cpu_aot_loader logs "Machine type used
for XLA:CPU compilation doesn't match", then a faulthandler dump with no
pytest summary — CLAUDE.md machine gotchas). JAX keys cache entries by
compile options, not by the host's microarchitecture, so the guard lives
here: a ``CPU_FEATURES.json`` marker stamped into the cache dir, checked
before JAX initializes; any mismatch wipes the dir so the run goes cold
instead of crashing.

Import-light on purpose (no jax/numpy): ``tests/conftest.py`` calls
:func:`ensure_cache_matches_cpu` before the re-exec that starts JAX.
"""

from __future__ import annotations

import hashlib
import json
import os
import platform
import shutil

_MARKER = "CPU_FEATURES.json"


def cpu_feature_fingerprint() -> str:
    """Stable hash of the host CPU's identity + feature flags.

    Reads /proc/cpuinfo (Linux): "model name" plus the sorted ISA "flags"
    of cpu 0 — exactly the properties XLA:CPU AOT code specializes on
    (AVX-512 vs AVX2 etc.). Falls back to platform identifiers elsewhere.
    """
    model, flags = "", ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not model and line.startswith("model name"):
                    model = line.split(":", 1)[1].strip()
                elif not flags and line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                if model and flags:
                    break
    except OSError:
        pass
    if not model:
        model = platform.processor() or platform.machine()
    blob = f"{model}\n{flags}".encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def ensure_cache_matches_cpu(cache_dir: str) -> str:
    """Stamp-or-validate ``cache_dir`` against the host CPU.

    Returns one of:
      * ``"fresh"``  — dir was missing/empty; created and stamped.
      * ``"match"``  — marker present and matching; cache kept.
      * ``"wiped"``  — marker missing-with-entries or mismatched; the dir
        was deleted and re-created with a fresh stamp (cold run beats a
        mid-suite SIGILL).
    """
    fp = cpu_feature_fingerprint()
    marker = os.path.join(cache_dir, _MARKER)
    entries = []
    if os.path.isdir(cache_dir):
        entries = [e for e in os.listdir(cache_dir) if e != _MARKER]
    state = "fresh"
    if entries:
        stamped = None
        try:
            with open(marker) as f:
                stamped = json.load(f).get("fingerprint")
        except (OSError, ValueError):
            stamped = None
        if stamped == fp:
            return "match"
        # unknown or different CPU: the entries are suspect — drop them
        shutil.rmtree(cache_dir, ignore_errors=True)
        state = "wiped"
    os.makedirs(cache_dir, exist_ok=True)
    with open(marker, "w") as f:
        json.dump({"fingerprint": fp,
                   "note": "XLA:CPU AOT cache keyed to host CPU features; "
                           "mismatch wipes the cache (utils/cache_guard.py)"},
                  f)
    return state
