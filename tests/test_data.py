"""Data layer tests: patch math, transforms, loader sharding/determinism,
synthetic dataset, and real-dataset classes over tiny temp fixtures."""

import os

import numpy as np
import pytest

from eo_diffusion_tpu.data import transforms as T
from eo_diffusion_tpu.data.datasets import (
    CloudMaskDataset,
    EuroSATDataset,
    InriaDataset,
    MNISTDataset,
    OSCDDataset,
    SyntheticEO,
    get_metadata,
    train_val_split,
)
from eo_diffusion_tpu.data.loader import DataLoader
from eo_diffusion_tpu.data.patches import (
    grid_patches,
    num_windows,
    subsample_patches,
    window_index,
)


class TestPatches:
    def test_grid_shape_and_content(self):
        img = np.arange(10 * 10 * 1, dtype=np.float32).reshape(10, 10, 1)
        g = grid_patches(img, size=4, step=2)
        assert g.shape == (4, 4, 4, 4, 1)
        np.testing.assert_array_equal(g[0, 0], img[:4, :4])
        np.testing.assert_array_equal(g[1, 2], img[2:6, 4:8])

    def test_subsample_uniform_jump(self):
        img = np.random.default_rng(0).normal(size=(64, 64, 3)).astype(np.float32)
        g = grid_patches(img, 16, 8)  # 7x7=49 patches
        sel = subsample_patches(g, 10)  # jump = 4
        assert sel.shape == (10, 16, 16, 3)
        flat = g.reshape(-1, 16, 16, 3)
        np.testing.assert_array_equal(sel[1], flat[4])

    def test_subsample_fewer_than_requested(self):
        img = np.zeros((20, 20, 1), np.float32)
        g = grid_patches(img, 16, 8)  # 1x1
        sel = subsample_patches(g, 10)
        assert sel.shape[0] == 1

    def test_window_math_cloudmask_config(self):
        # reference: orig 1022, size 64, ratio 0 -> step 64 -> 15x15 windows
        n_i, n_j = num_windows((1022, 1022), 64, 64)
        assert (n_i, n_j) == (15, 15)
        assert window_index(0, (1022, 1022), 64, 64, n_j) == (0, 0)
        assert window_index(16, (1022, 1022), 64, 64, n_j) == (64, 64)

    def test_window_clamped(self):
        i, j = window_index(99, (100, 100), 64, 32, 2, clamp=True)
        assert 0 <= i <= 100 - 64 - 1 + 1 and 0 <= j <= 100 - 64


class TestTransforms:
    def test_flips_deterministic_given_rng(self):
        x = np.random.default_rng(0).normal(size=(8, 8, 3)).astype(np.float32)
        t = T.Compose([T.RandomHorizontalFlip(p=1.0), T.RandomVerticalFlip(p=0.0)])
        out = t(x, np.random.default_rng(0))
        np.testing.assert_array_equal(out, x[:, ::-1])

    def test_solarize_only_image_channels(self):
        x = np.concatenate([np.full((4, 4, 3), 0.9, np.float32), np.ones((4, 4, 1), np.float32)], -1)
        t = T.RandomSolarize(threshold=0.5, p=1.0, img_channels=3)
        out = t(x, np.random.default_rng(0))
        np.testing.assert_allclose(out[..., :3], 0.1, atol=1e-6)
        np.testing.assert_allclose(out[..., 3], 1.0)  # mask untouched

    def test_normalize_range(self):
        x = np.array([[[0.0], [1.0]]], np.float32)
        out = T.Normalize(0.5, 0.5)(x, None)
        np.testing.assert_allclose(out.ravel(), [-1.0, 1.0])

    def test_sharpness_identity_at_1(self):
        x = np.random.default_rng(0).uniform(0.2, 0.8, (8, 8, 3)).astype(np.float32)
        out = T.RandomAdjustSharpness(1.0, p=1.0)(x, np.random.default_rng(0))
        np.testing.assert_allclose(out, x, atol=1e-6)

    def test_center_crop(self):
        x = np.arange(36, dtype=np.float32).reshape(6, 6, 1)
        out = T.CenterCrop(2)(x, None)
        np.testing.assert_array_equal(out[..., 0], x[2:4, 2:4, 0])

    def test_resize_preserves_constant(self):
        x = np.full((10, 10, 3), 0.7, np.float32)
        out = T.Resize(28)(x, None)
        assert out.shape == (28, 28, 3)
        np.testing.assert_allclose(out, 0.7, atol=1e-6)

    def test_random_rect_mask_bounds(self):
        m = T.random_rect_mask((64, 64), 10, 10, 40, 40, np.random.default_rng(0))
        assert m.shape == (64, 64, 1)
        assert set(np.unique(m)) <= {0.0, 1.0}
        assert 0 < m.mean() < 0.5


class TestSynthetic:
    def test_deterministic_per_index(self):
        ds = SyntheticEO(size=16, length=8)
        a, b = ds[3], ds[3]
        np.testing.assert_array_equal(a["image"], b["image"])
        assert a["image"].shape == (16, 16, 3)
        assert a["segmentation"].shape == (16, 16, 1)

    def test_range_modes(self):
        ds = SyntheticEO(size=16, length=4, data_range=(-1, 1))
        img = ds[0]["image"]
        assert img.min() >= -1.0 and img.max() <= 1.0 and img.min() < 0

    def test_texture_adds_high_frequency_content(self):
        """--texture contour lines: the fair SR fixture (the edges raise
        gradient energy ~an order of magnitude but stay deterministic and
        in-range; texture=0 is bit-identical to the pre-knob fixture)."""
        from eo_diffusion_tpu.utils.metrics import gradient_energy

        smooth = SyntheticEO(size=32, length=8, data_range=(-1, 1))
        tex = SyntheticEO(size=32, length=8, data_range=(-1, 1), texture=0.8)
        s = np.stack([smooth[i]["image"] for i in range(8)])
        t = np.stack([tex[i]["image"] for i in range(8)])
        assert gradient_energy(t) > 5 * gradient_energy(s)
        assert t.min() >= -1.0 and t.max() <= 1.0
        np.testing.assert_array_equal(
            t, np.stack([SyntheticEO(size=32, length=8, data_range=(-1, 1),
                                     texture=0.8)[i]["image"]
                         for i in range(8)]))
        # default-off contract: existing capstone statistics stay stable
        np.testing.assert_array_equal(
            s, np.stack([SyntheticEO(size=32, length=8,
                                     data_range=(-1, 1))[i]["image"]
                         for i in range(8)]))


class TestSyntheticHard:
    """The discriminative-evaluation fixture (VERDICT r4 item 1a): five
    visually distinct class generators with real high-frequency content."""

    def _ds(self, **kw):
        from eo_diffusion_tpu.data.datasets import SyntheticEOHard

        return SyntheticEOHard(**kw)

    def test_deterministic_and_in_range(self):
        ds = self._ds(size=32, length=10, data_range=(-1, 1),
                      with_cond_image=True)
        for i in range(6):
            it = ds[i]
            assert it["image"].shape == (32, 32, 3)
            assert it["image"].min() >= -1 and it["image"].max() <= 1
            assert it["segmentation"].shape == (32, 32, 1)
            assert it["cond_image"].shape == (32, 32, 3)
        np.testing.assert_array_equal(ds[3]["image"], ds[3]["image"])

    def test_classes_are_distinct_modes(self):
        """Per-class mean images must be far apart — the multi-modality
        that gives coverage metrics room to fail."""
        ds = self._ds(size=32, length=50)
        means = [np.mean([ds[i]["image"] for i in range(50) if i % 5 == c],
                         axis=0) for c in range(5)]
        import itertools

        for a, b in itertools.combinations(range(5), 2):
            assert np.abs(means[a] - means[b]).mean() > 0.05, (a, b)

    def test_harder_than_plain_fixture(self):
        """More high-frequency content than SyntheticEO — the property that
        keeps 7M models off the KID noise floor (PERF.md saturation)."""
        from eo_diffusion_tpu.utils.metrics import gradient_energy

        plain = SyntheticEO(size=32, length=10)
        hard = self._ds(size=32, length=10)
        p = np.stack([plain[i]["image"] for i in range(10)])
        h = np.stack([hard[i]["image"] for i in range(10)])
        assert gradient_energy(h) > 1.5 * gradient_energy(p)

    def test_small_and_single_channel(self):
        for kw in (dict(size=8, length=5), dict(size=16, length=5, channels=1)):
            ds = self._ds(**kw)
            for i in range(5):
                img = ds[i]["image"]
                assert img.shape[-1] == kw.get("channels", 3)
                assert np.isfinite(img).all()

    def test_factory_and_metadata(self):
        from eo_diffusion_tpu.data.datasets import get_metadata
        from eo_diffusion_tpu.data.factories import DATASET_FACTORIES

        md = get_metadata("synthetic_hard")
        assert md["num_classes"] == 5
        train_dl, test_dl = DATASET_FACTORIES["synthetic_hard"](
            batch_size=4, image_size=16, length=20)
        batch = next(iter(train_dl))
        assert batch["image"].shape == (4, 16, 16, 3)
        assert "class" in batch


class TestLoader:
    def test_batching_and_shapes(self):
        ds = SyntheticEO(size=16, length=32)
        dl = DataLoader(ds, batch_size=8, seed=1)
        batches = list(dl)
        assert len(batches) == 4
        assert batches[0]["image"].shape == (8, 16, 16, 3)
        assert batches[0]["class"].shape == (8,)

    def test_sharding_partitions(self):
        ds = SyntheticEO(size=8, length=32)
        b0 = next(iter(DataLoader(ds, 16, shuffle=False, shard=(0, 2), prefetch=0)))
        b1 = next(iter(DataLoader(ds, 16, shuffle=False, shard=(1, 2), prefetch=0)))
        # disjoint index streams -> different content
        assert not np.allclose(b0["image"], b1["image"])

    def test_sharding_is_balanced_on_ragged_length(self):
        """n % n_shards != 0 must NOT hand low shards an extra item: hosts
        iterating different batch counts deadlock multi-host collectives
        (every process must contribute to every global batch)."""
        ds = SyntheticEO(size=8, length=15)
        dls = [DataLoader(ds, 4, shuffle=False, shard=(s, 2), prefetch=0,
                          drop_last=False) for s in (0, 1)]
        counts = [len(list(dl)) for dl in dls]
        assert counts[0] == counts[1] == len(dls[0]), counts

    def test_epoch_reshuffle(self):
        ds = SyntheticEO(size=8, length=32)
        dl = DataLoader(ds, 32, shuffle=True, seed=0)
        e1 = next(iter(dl))["class"]
        e2 = next(iter(dl))["class"]
        assert not np.array_equal(e1, e2)

    def test_joint_transform_applies_to_mask(self):
        ds = SyntheticEO(size=8, length=8)
        t = T.Compose([T.RandomHorizontalFlip(p=1.0)])
        dl = DataLoader(ds, 4, shuffle=False, transforms=t, prefetch=0)
        b = next(iter(dl))
        raw = np.stack([ds[i]["segmentation"] for i in range(4)])
        np.testing.assert_array_equal(b["segmentation"], raw[:, :, ::-1])

    def test_loader_error_propagates(self):
        class Bad(SyntheticEO):
            def __getitem__(self, i):
                raise RuntimeError("boom")

        dl = DataLoader(Bad(size=8, length=8), 4)
        with pytest.raises(RuntimeError, match="boom"):
            next(iter(dl))


class TestSplit:
    def test_split_sizes_and_disjoint(self):
        ds = SyntheticEO(size=8, length=100)
        tr, va = train_val_split(ds, 0.15, seed=4097)
        assert len(tr) == 85 and len(va) == 15
        assert set(tr.indices).isdisjoint(va.indices)

    def test_split_deterministic(self):
        ds = SyntheticEO(size=8, length=100)
        a = train_val_split(ds, 0.15, seed=4097)[1].indices
        b = train_val_split(ds, 0.15, seed=4097)[1].indices
        assert a == b


@pytest.fixture
def tiny_inria(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    for sub in ("train/images", "train/gt"):
        os.makedirs(tmp_path / sub)
    for city in ("austin1", "vienna3"):
        img = (rng.uniform(0, 255, (128, 128, 3))).astype(np.uint8)
        msk = (rng.uniform(0, 255, (128, 128)) > 128).astype(np.uint8) * 255
        Image.fromarray(img).save(tmp_path / "train/images" / f"{city}.tif")
        Image.fromarray(msk).save(tmp_path / "train/gt" / f"{city}.tif")
    return str(tmp_path)


class TestInria:
    def test_patches_and_labels(self, tiny_inria):
        ds = InriaDataset(tiny_inria, size=64, patch_overlap=0.5, num_patches=4)
        assert len(ds) == 8  # 2 tiles x 4 patches
        item = ds[0]
        assert item["image"].shape == (64, 64, 3)
        assert item["segmentation"].shape == (64, 64, 1)
        assert set(np.unique(item["segmentation"])) <= {0.0, 1.0}
        assert int(ds[0]["class"]) == 0  # austin
        assert int(ds[4]["class"]) == 4  # vienna

    def test_range(self, tiny_inria):
        ds = InriaDataset(tiny_inria, size=64, num_patches=2)
        img = ds[0]["image"]
        assert 0.0 <= img.min() and img.max() <= 1.0


@pytest.fixture
def tiny_cmc(tmp_path):
    import pandas as pd

    rng = np.random.default_rng(0)
    os.makedirs(tmp_path / "subscenes")
    os.makedirs(tmp_path / "masks")
    rows = []
    for i, name in enumerate(["sceneA", "sceneB", "sceneC"]):
        np.save(tmp_path / "subscenes" / f"{name}.npy",
                rng.uniform(0, 1.2, (1022, 1022, 13)).astype(np.float32))
        np.save(tmp_path / "masks" / f"{name}.npy",
                (rng.uniform(0, 1, (1022, 1022, 3)) > 0.5).astype(np.float32))
        rows.append(dict(index=i, scene=name, **{"snow/ice": 0 if i < 2 else 1},
                         clear_percent=60, cloud_percent=30,
                         agricultural=1, **{"urban/developed": 0, "hills/mountains": 0}))
    pd.DataFrame(rows).to_csv(tmp_path / "classification_tags.csv", index=False)
    return str(tmp_path)


class TestCloudMask:
    def test_filtering_and_windows(self, tiny_cmc):
        ds = CloudMaskDataset(tiny_cmc, size=64, num_patches=10, length=0)
        # sceneC filtered out by snow/ice
        assert len(ds) == 2 * 10
        item = ds[0]
        assert item["image"].shape == (64, 64, 3)
        assert item["image"].max() <= 1.0  # clipped
        assert item["segmentation"].shape == (64, 64, 1)

    def test_band_select(self, tiny_cmc):
        ds = CloudMaskDataset(tiny_cmc, size=64, num_patches=1, length=1)
        raw = np.load(os.path.join(tiny_cmc, "subscenes", "sceneA.npy"))
        np.testing.assert_allclose(
            ds[0]["image"], np.clip(raw[:64, :64, [3, 2, 1]], 0, 1), rtol=1e-6
        )


class TestEuroSATAndOSCD:
    def test_eurosat_folder_classes(self, tmp_path):
        from PIL import Image

        for ci, cls in enumerate(["Forest", "River"]):
            os.makedirs(tmp_path / cls)
            for j in range(3):
                Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(
                    tmp_path / cls / f"{cls}_{j}.jpg"
                )
        ds = EuroSATDataset(str(tmp_path))
        assert len(ds) == 6
        assert int(ds[0]["class"]) == 0 and int(ds[5]["class"]) == 1

    def test_oscd_pairs(self, tmp_path):
        from PIL import Image

        for i in range(2):
            for pat in ("imgs_1_rect-rgb", "imgs_2_rect-rgb", "lbl"):
                arr = np.zeros((64, 64, 3), np.uint8) + i * 100
                Image.fromarray(arr).save(tmp_path / f"p{i}_{pat}.png")
        ds = OSCDDataset(str(tmp_path), return_pair=True)
        assert len(ds) == 2
        item = ds[1]
        assert item["image"].shape == (64, 64, 3)
        assert item["segmentation"].shape == (64, 64, 1)
        assert "image2" in item

    def test_fake_dirname(self):
        assert OSCDDataset.fake_dirname("/d", mult=2).endswith("_0.3_2")


class TestMNIST:
    def test_idx_roundtrip(self, tmp_path):
        # write a minimal IDX pair
        imgs = np.random.default_rng(0).integers(0, 255, (4, 28, 28), np.uint8)
        lbls = np.array([1, 2, 3, 4], np.uint8)
        with open(tmp_path / "train-images-idx3-ubyte", "wb") as f:
            f.write(b"\x00\x00\x08\x03" + np.array(imgs.shape, ">i4").tobytes() + imgs.tobytes())
        with open(tmp_path / "train-labels-idx1-ubyte", "wb") as f:
            f.write(b"\x00\x00\x08\x01" + np.array([4], ">i4").tobytes() + lbls.tobytes())
        ds = MNISTDataset(str(tmp_path), train=True)
        assert len(ds) == 4
        item = ds[2]
        assert item["image"].shape == (28, 28, 1)
        assert -1.0 <= item["image"].min() and item["image"].max() <= 1.0
        assert int(item["class"]) == 3


def test_metadata_registry():
    md = get_metadata("mnist")
    assert md["image_size"] == 28 and md["num_classes"] == 10
    assert get_metadata("eurosat")["num_classes"] == 10
    with pytest.raises(ValueError):
        get_metadata("nope")


class TestSEN12MSCRFactory:
    def test_factory_registered(self):
        from eo_diffusion_tpu.data.factories import DATASET_FACTORIES

        assert "sen12mscr" in DATASET_FACTORIES

    def test_cond_image_batching(self, tmp_path):
        import os

        from eo_diffusion_tpu.data.factories import create_sen12mscr_dataloaders
        from eo_diffusion_tpu.data.sen12ms_cr import Seasons

        season = Seasons.SUMMER.value
        for scene in (1, 2):
            for sensor in ("s1", "s2", "s2_cloudy"):
                d = tmp_path / season / f"{sensor}_{scene}"
                os.makedirs(d)
                for pid in range(4):
                    (d / f"{season}_{sensor}_{scene}_p{pid}.tif").write_bytes(b"")

        def reader(path, bands):
            rng = np.random.default_rng(abs(hash(os.path.basename(path))) % 2**32)
            return rng.uniform(0, 4000, (16, 16, 13)).astype(np.float32)[:, :, [b - 1 for b in bands]]

        train, test = create_sen12mscr_dataloaders(4, root=str(tmp_path), reader=reader)
        batch = next(iter(train))
        assert batch["image"].shape == (4, 16, 16, 3)
        assert batch["cond_image"].shape == (4, 16, 16, 3)

    def test_num_workers_reaches_the_loaders(self, tmp_path):
        """The num_workers knob must not be silently dropped — SEN12MS-CR
        is the TIFF-decode-heavy dataset the threaded loader path exists
        for (loader.py: PIL/native extraction release the GIL)."""
        import os

        from eo_diffusion_tpu.data.factories import create_sen12mscr_dataloaders
        from eo_diffusion_tpu.data.sen12ms_cr import Seasons

        season = Seasons.SUMMER.value
        for sensor in ("s1", "s2", "s2_cloudy"):
            d = tmp_path / season / f"{sensor}_1"
            os.makedirs(d)
            for pid in range(4):
                (d / f"{season}_{sensor}_1_p{pid}.tif").write_bytes(b"")

        def reader(path, bands):
            return np.zeros((16, 16, len(bands)), np.float32)

        train, test = create_sen12mscr_dataloaders(
            2, root=str(tmp_path), reader=reader, num_workers=3)
        assert train.num_workers == 3 and test.num_workers == 3


class TestThreadedLoader:
    def test_worker_batches_deterministic_content(self):
        ds = SyntheticEO(size=8, length=32)
        a = next(iter(DataLoader(ds, 8, shuffle=False, num_workers=4, prefetch=0)))
        b = next(iter(DataLoader(ds, 8, shuffle=False, num_workers=4, prefetch=0)))
        np.testing.assert_array_equal(a["image"], b["image"])

    def test_worker_batches_match_items(self):
        ds = SyntheticEO(size=8, length=16)
        batch = next(iter(DataLoader(ds, 4, shuffle=False, num_workers=3, prefetch=0)))
        for k in range(4):
            np.testing.assert_array_equal(batch["image"][k], ds[k]["image"])

    def test_workers_with_transforms(self):
        ds = SyntheticEO(size=8, length=16)
        t = T.Compose([T.RandomHorizontalFlip(p=1.0)])
        batch = next(iter(DataLoader(ds, 4, shuffle=False, num_workers=3,
                                     transforms=t, prefetch=0)))
        raw = np.stack([ds[i]["image"] for i in range(4)])
        np.testing.assert_array_equal(batch["image"], raw[:, :, ::-1])


class TestDevicePrefetch:
    def test_prefetch_on_mesh(self):
        import jax

        from eo_diffusion_tpu.data.loader import device_prefetch
        from eo_diffusion_tpu.parallel.mesh import make_mesh

        ds = SyntheticEO(size=8, length=32)
        dl = DataLoader(ds, 16, shuffle=False, prefetch=0)
        mesh = make_mesh()
        batches = list(device_prefetch(iter(dl), mesh=mesh, size=2))
        assert len(batches) == 2
        assert isinstance(batches[0]["image"], jax.Array)
        assert "data" in str(batches[0]["image"].sharding.spec)

    def test_prefetch_no_mesh(self):
        from eo_diffusion_tpu.data.loader import device_prefetch

        ds = SyntheticEO(size=8, length=16)
        dl = DataLoader(ds, 8, shuffle=False, prefetch=0)
        batches = list(device_prefetch(iter(dl), size=3))
        assert len(batches) == 2


class TestShardBatch:
    def test_shard_batch_places_on_data_axis(self):
        from eo_diffusion_tpu.parallel.mesh import make_mesh, shard_batch

        mesh = make_mesh()
        out = shard_batch({"image": np.ones((16, 4, 4, 3), np.float32)}, mesh)
        assert "data" in str(out["image"].sharding.spec)


class TestClassCorrelatedSynthetic:
    def test_signatures_separate_classes(self):
        """class_correlated=True: per-class channel-mean prototypes must be
        nearest-neighbor separable (the CFG-capstone fixture contract)."""
        from eo_diffusion_tpu.data.datasets import SyntheticEO

        ds = SyntheticEO(size=16, length=30, num_classes=3,
                         class_correlated=True, data_range=(-1.0, 1.0))
        sigs, labels = [], []
        for i in range(30):
            d = ds[i]
            sigs.append(d["image"].mean(axis=(0, 1)))
            labels.append(int(d["class"]))
        sigs, labels = np.stack(sigs), np.asarray(labels)
        protos = np.stack([sigs[labels == k].mean(axis=0) for k in range(3)])
        pred = np.argmin(
            np.linalg.norm(sigs[:, None] - protos[None], axis=-1), axis=1)
        assert (pred == labels).all()

    def test_default_unchanged(self):
        from eo_diffusion_tpu.data.datasets import SyntheticEO

        a = SyntheticEO(size=8, length=2)[0]["image"]
        b = SyntheticEO(size=8, length=2, class_correlated=False)[0]["image"]
        np.testing.assert_array_equal(a, b)


class TestSen12DressRehearsal:
    """VERDICT r4 item 7a: full-fidelity SEN12MS-CR rehearsal — REAL
    multi-band uint16/float32 GeoTIFF bytes on disk, the sen12mscr factory
    composed with the NATIVE default reader (no injected stubs), one real
    cli.train step end to end."""

    def _write_tree(self, root, size=8, scenes=(10, 42), patches=(3, 7)):
        from tests.test_tiff_native import write_tiff

        from eo_diffusion_tpu.data.sen12ms_cr import Seasons

        season = Seasons.SUMMER.value
        rng = np.random.default_rng(0)
        for scene in scenes:
            for sensor, bands, dtype in (("s1", 2, np.float32),
                                         ("s2", 13, np.uint16),
                                         ("s2_cloudy", 13, np.uint16)):
                d = os.path.join(root, season, f"{sensor}_{scene}")
                os.makedirs(d, exist_ok=True)
                for pid in patches:
                    if dtype is np.uint16:
                        arr = rng.integers(0, 10000,
                                           (size, size, bands)).astype(dtype)
                    else:
                        arr = rng.normal(-10, 3,
                                         (size, size, bands)).astype(dtype)
                    write_tiff(os.path.join(
                        d, f"{season}_{sensor}_{scene}_p{pid}.tif"), arr,
                        rows_per_strip=4)
        return season

    def test_factory_native_reader_composition(self, tmp_path):
        """Factory -> SEN12MSCRCloudRemoval -> native TIFF decode of real
        13-band uint16 bytes; correct band slice + reflectance scaling."""
        from eo_diffusion_tpu.data.factories import create_sen12mscr_dataloaders

        self._write_tree(str(tmp_path))
        train_ds, test_ds = create_sen12mscr_dataloaders(
            batch_size=2, root=str(tmp_path), return_dataset=True)
        assert len(train_ds) + len(test_ds) == 4
        it = train_ds[0]
        assert it["image"].shape == (8, 8, 3)
        assert it["cond_image"].shape == (8, 8, 3)
        assert it["sar"].shape == (8, 8, 2)
        assert 0.0 <= it["image"].min() and it["image"].max() <= 1.0
        assert it["image"].max() > 0.1  # real decoded DNs, not zeros

    def test_cli_train_step_on_real_tiffs(self, tmp_path):
        """One cli.train step (tiny-cr concat-conditioned preset) fed
        entirely from the on-disk GeoTIFF tree via the native reader."""
        from eo_diffusion_tpu.cli import train as train_cli

        # batch 8: the test mesh is 8 virtual devices and the DP sharding
        # needs batch % devices == 0
        self._write_tree(str(tmp_path / "SEN12MS_CR"),
                         patches=tuple(range(8)))
        sample_dir = str(tmp_path / "results")
        cwd = os.getcwd()
        os.chdir(str(tmp_path))
        try:
            train_cli.main(train_cli.parse_args([
                "--preset", "tiny-cr", "--dataset", "sen12mscr",
                "--data_root", str(tmp_path / "SEN12MS_CR"),
                "--epochs", "1", "--steps_per_epoch", "2",
                "--batch_size", "8", "--dir", sample_dir,
                "--sample_every", "100", "--save_every", "2",
                "--log_freq", "1", "--n_samples", "2",
            ]))
        finally:
            os.chdir(cwd)
        ckpt_root = os.path.join(str(tmp_path), "logs",
                                 os.path.basename(sample_dir))
        assert any(e.startswith("steps_") for e in os.listdir(ckpt_root))
