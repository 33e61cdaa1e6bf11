"""CPU-feature cache keying (utils/cache_guard.py, ROADMAP r5 #4): a
recycled VM must invalidate the persistent XLA:CPU AOT cache cleanly
instead of SIGILLing the suite mid-run (CLAUDE.md machine gotchas)."""

import json
import os

import pytest

from eo_diffusion_tpu.utils.cache_guard import (cpu_feature_fingerprint,
                                                ensure_cache_matches_cpu)


@pytest.mark.smoke
class TestCacheGuard:
    def test_fingerprint_stable_and_nonempty(self):
        a, b = cpu_feature_fingerprint(), cpu_feature_fingerprint()
        assert a == b and len(a) == 16

    def test_fresh_dir_is_stamped(self, tmp_path):
        d = str(tmp_path / "cache")
        assert ensure_cache_matches_cpu(d) == "fresh"
        with open(os.path.join(d, "CPU_FEATURES.json")) as f:
            assert json.load(f)["fingerprint"] == cpu_feature_fingerprint()

    def test_matching_cache_is_kept(self, tmp_path):
        d = str(tmp_path / "cache")
        ensure_cache_matches_cpu(d)
        entry = os.path.join(d, "jit_something_aot")
        open(entry, "w").write("x")
        assert ensure_cache_matches_cpu(d) == "match"
        assert os.path.exists(entry)

    def test_mismatched_cache_is_wiped(self, tmp_path):
        """The recycled-VM scenario: entries stamped under a different CPU."""
        d = str(tmp_path / "cache")
        ensure_cache_matches_cpu(d)
        open(os.path.join(d, "jit_stale_aot"), "w").write("x")
        with open(os.path.join(d, "CPU_FEATURES.json"), "w") as f:
            json.dump({"fingerprint": "0000deadbeef0000"}, f)
        assert ensure_cache_matches_cpu(d) == "wiped"
        assert not os.path.exists(os.path.join(d, "jit_stale_aot"))
        # dir re-created and re-stamped for the current host
        with open(os.path.join(d, "CPU_FEATURES.json")) as f:
            assert json.load(f)["fingerprint"] == cpu_feature_fingerprint()

    def test_unstamped_entries_are_wiped(self, tmp_path):
        """Pre-guard caches carry no marker: treat as suspect (this is the
        exact state a pre-r5 .jax_cache_tests is in after a recycle)."""
        d = str(tmp_path / "cache")
        os.makedirs(d)
        open(os.path.join(d, "jit_old_aot"), "w").write("x")
        assert ensure_cache_matches_cpu(d) == "wiped"
        assert not os.path.exists(os.path.join(d, "jit_old_aot"))
