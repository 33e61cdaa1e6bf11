"""Aux subsystem tests: SEN12MS-CR loader, GIF assembly, profiling hooks."""

import os

import numpy as np
import pytest

from eo_diffusion_tpu.data.sen12ms_cr import (
    S1Bands,
    S2Bands,
    Seasons,
    SEN12MSCR,
    SEN12MSCRCloudRemoval,
    Sensor,
    _band_list,
)
from eo_diffusion_tpu.utils.gif import make_gif
from eo_diffusion_tpu.utils.profiling import StepTimer, flops_of, sync


@pytest.fixture
def sen12_dir(tmp_path):
    """Synthetic SEN12MS-CR layout: 1 season, 2 scenes, 2 patches each.

    Files are placeholders -- the tests inject ``_np_reader`` (the real
    rasterio/tifffile readers aren't in this image)."""
    season = Seasons.SUMMER.value
    for scene in (10, 42):
        for sensor in ("s1", "s2", "s2_cloudy"):
            d = tmp_path / season / f"{sensor}_{scene}"
            os.makedirs(d)
            for pid in (3, 7):
                (d / f"{season}_{sensor}_{scene}_p{pid}.tif").write_bytes(b"")
    return str(tmp_path)


def _np_reader(path, bands):
    """Test reader: derive deterministic content from the path."""
    rng = np.random.default_rng(abs(hash(os.path.basename(path))) % 2**32)
    return rng.uniform(0, 4000, (16, 16, 13)).astype(np.float32)[:, :, [b - 1 for b in bands]]


class TestSEN12MSCR:
    def test_band_enums(self):
        assert _band_list(S2Bands.RGB) == [4, 3, 2]
        assert _band_list(S1Bands.ALL) == [1, 2]
        assert _band_list([S2Bands.B08, S2Bands.B04]) == [8, 4]

    def test_scene_and_patch_ids(self, sen12_dir):
        api = SEN12MSCR(sen12_dir, reader=_np_reader)
        assert api.get_scene_ids(Seasons.SUMMER) == {10, 42}
        assert api.get_patch_ids(Seasons.SUMMER, 10) == [3, 7]

    def test_triplet_shapes(self, sen12_dir):
        api = SEN12MSCR(sen12_dir, reader=_np_reader)
        s1, s2, s2c = api.get_s1_s2_s2cloudy_triplet(
            Seasons.SUMMER, 10, 3, s2_bands=S2Bands.RGB, s2cloudy_bands=S2Bands.RGB
        )
        assert s1.shape == (16, 16, 2)
        assert s2.shape == (16, 16, 3)
        assert s2c.shape == (16, 16, 3)

    def test_cloud_removal_dataset(self, sen12_dir):
        ds = SEN12MSCRCloudRemoval(sen12_dir, reader=_np_reader)
        assert len(ds) == 4
        item = ds[0]
        assert item["image"].shape == (16, 16, 3)
        assert item["cond_image"].shape == (16, 16, 3)
        assert 0.0 <= item["image"].min() and item["image"].max() <= 1.0

    def test_missing_dir_raises(self):
        with pytest.raises(FileNotFoundError):
            SEN12MSCR("/nonexistent/path")


class TestGif:
    def test_from_arrays(self, tmp_path):
        frames = [np.full((8, 8, 3), v, np.float32) for v in (0.1, 0.5, 0.9)]
        out = make_gif(frames, str(tmp_path / "anim.gif"))
        assert os.path.exists(out)
        from PIL import Image

        with Image.open(out) as im:
            assert im.n_frames == 3

    def test_from_directory(self, tmp_path):
        from PIL import Image

        for i in range(3):
            Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(tmp_path / f"f{i}.png")
        out = make_gif(str(tmp_path), str(tmp_path / "o.gif"))
        assert os.path.exists(out)

    def test_empty_raises(self, tmp_path):
        with pytest.raises(ValueError):
            make_gif([], str(tmp_path / "x.gif"))


class TestProfiling:
    def test_step_timer(self):
        import jax.numpy as jnp

        timer = StepTimer(flops_per_step=1e9)
        for _ in range(3):
            with timer.step(sync_on=jnp.ones((4,))):
                pass
        s = timer.summary()
        assert s["steps_per_sec"] > 0
        assert "mfu" in s

    def test_flops_of_matmul(self):
        import jax.numpy as jnp

        a = jnp.ones((64, 64))
        f = lambda x: x @ x
        fl = flops_of(f, a)
        assert fl >= 2 * 64**3 * 0.9  # ~2*n^3

    def test_sync_noop_on_empty(self):
        sync({})
        sync(None)


class TestExportPatches:
    def test_export_synthetic(self, tmp_path):
        from eo_diffusion_tpu.data.datasets import SyntheticEO
        from eo_diffusion_tpu.tools.export_patches import export

        ds = SyntheticEO(size=8, length=5)
        n = export(ds, str(tmp_path), limit=3)
        assert n == 3
        files = os.listdir(tmp_path)
        assert "images.txt" in files
        assert sum(f.endswith(".png") and "mask" not in f for f in files) == 3
        assert sum("mask" in f for f in files) == 3
        lines = open(tmp_path / "images.txt").read().strip().splitlines()
        assert len(lines) == 3 and lines[0].split()[1].isdigit()


class TestTrace:
    def test_profiler_trace_writes(self, tmp_path):
        import jax.numpy as jnp

        from eo_diffusion_tpu.utils.profiling import trace

        with trace(str(tmp_path)):
            float(jnp.sum(jnp.ones((8, 8))))
        # a trace directory with at least one event file appears
        found = list(tmp_path.rglob("*"))
        assert found, "profiler trace produced no files"


class TestViz:
    """Headless ports of the reference's interactive helpers
    (script_utils/utils.py:6-15 show, 39-52 plot_params)."""

    def test_plot_schedule_params(self, tmp_path):
        from eo_diffusion_tpu.core.schedules import make_schedule
        from eo_diffusion_tpu.utils.viz import plot_schedule_params

        sched = make_schedule(100)
        out = plot_schedule_params(sched, 10, str(tmp_path / "sched.png"))
        assert os.path.getsize(out) > 1000

    def test_show_single_and_batch(self, tmp_path):
        from eo_diffusion_tpu.utils.viz import show

        rng = np.random.default_rng(0)
        one = rng.uniform(-1, 1, (16, 16, 3)).astype(np.float32)
        batch = rng.uniform(0, 1, (3, 16, 16, 1)).astype(np.float32)
        p1 = show(one, str(tmp_path / "one.png"), data_range=(-1, 1))
        p2 = show(batch, str(tmp_path / "row.png"))
        assert os.path.getsize(p1) > 500 and os.path.getsize(p2) > 500
