"""InceptionV3 extractor tests: architecture shapes (eval_shape, no compile),
torch-functional numerical parity of the building blocks, state-dict
conversion roundtrip, and (skip-marked) real-weight loading.

Reference parity target: torch-fidelity's InceptionV3 FID/IS harness
(script_utils/evaluate_metrics.py:3-17)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eo_diffusion_tpu.models.inception import (
    BasicConv2d,
    InceptionV3,
    _avg_pool_3x3,
    convert_torch_state_dict,
    preprocess,
)

WEIGHTS = os.environ.get(
    "EO_INCEPTION_WEIGHTS",
    os.path.expanduser("~/.cache/torch/hub/checkpoints/inception_v3_google-0cc3c7bd.pth"),
)


class TestArchitecture:
    def test_output_shapes_and_param_count(self):
        model = InceptionV3()
        x = jnp.zeros((2, 299, 299, 3))
        shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
        n_params = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
        # torchvision inception_v3 is 27.2M incl. the 3.3M AuxLogits head,
        # which the FID extractor omits: expect ~23.9M
        assert 23.5e6 < n_params < 24.5e6, n_params
        out = jax.eval_shape(
            lambda p: model.apply(p, x), shapes
        )
        assert out["pool3"].shape == (2, 2048)
        assert out["logits"].shape == (2, 1000)

    def test_feature_grid_is_8x8_at_299(self):
        # the canonical FID input: 299x299 -> Mixed_7c on an 8x8 grid
        model = InceptionV3()
        x = jnp.zeros((1, 299, 299, 3))
        shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
        mixed7c = shapes["params"]["Mixed_7c"]
        assert "branch_pool" in mixed7c  # structure sanity

    def test_preprocess(self):
        x = jnp.ones((2, 64, 64, 3)) * 0.5
        y = preprocess(x)
        assert y.shape == (2, 299, 299, 3)
        # torchvision pipeline = ImageNet mean/std normalize followed by the
        # in-model transform_input (forced True for the google weights);
        # the composition reduces to (x - 0.5) / 0.5 per channel
        mean = np.array([0.485, 0.456, 0.406])
        std = np.array([0.229, 0.224, 0.225])
        normed = (0.5 - mean) / std
        expected = normed * (std / 0.5) + (mean - 0.5) / 0.5
        np.testing.assert_allclose(np.asarray(y[0, 0, 0]), expected, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(y[0, 0, 0]), 0.0, atol=1e-6)
        # grayscale is tiled to RGB
        g = preprocess(jnp.ones((1, 32, 32, 1)))
        assert g.shape == (1, 299, 299, 3)


class TestTorchParity:
    """Golden tests of the building blocks against torch functional ops --
    the exact semantics torchvision's InceptionV3 is built from."""

    def test_basic_conv2d_matches_torch(self):
        import torch
        import torch.nn.functional as F

        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
        w = rng.normal(0, 0.1, size=(8, 3, 3, 3)).astype(np.float32)
        gamma = rng.normal(1, 0.1, 8).astype(np.float32)
        beta = rng.normal(0, 0.1, 8).astype(np.float32)
        mean = rng.normal(0, 0.1, 8).astype(np.float32)
        var = rng.uniform(0.5, 1.5, 8).astype(np.float32)

        yt = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), padding=1)
        yt = F.batch_norm(yt, torch.from_numpy(mean), torch.from_numpy(var),
                          torch.from_numpy(gamma), torch.from_numpy(beta),
                          training=False, eps=1e-3)
        yt = F.relu(yt).numpy().transpose(0, 2, 3, 1)  # NCHW -> NHWC

        params = {"params": {
            "conv": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))},
            "bn_scale": jnp.asarray(gamma), "bn_bias": jnp.asarray(beta),
            "bn_mean": jnp.asarray(mean), "bn_var": jnp.asarray(var),
        }}
        yj = BasicConv2d(8, (3, 3), padding=1).apply(
            params, jnp.asarray(x.transpose(0, 2, 3, 1))
        )
        np.testing.assert_allclose(np.asarray(yj), yt, rtol=1e-4, atol=1e-5)

    def test_avg_pool_counts_pads_like_torch(self):
        import torch
        import torch.nn.functional as F

        x = np.random.default_rng(1).normal(size=(1, 4, 9, 9)).astype(np.float32)
        yt = F.avg_pool2d(torch.from_numpy(x), 3, stride=1, padding=1).numpy()
        yj = _avg_pool_3x3(jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(yj), yt.transpose(0, 2, 3, 1),
                                   rtol=1e-5, atol=1e-6)


def _torch_key_and_value(path, arr):
    """Inverse of convert_torch_state_dict for roundtrip testing."""
    parts = list(path)
    if parts[0] == "fc":
        if parts[1] == "kernel":
            return "fc.weight", arr.T
        return "fc.bias", arr
    leaf = parts[-1]
    if leaf == "kernel":
        return ".".join(parts[:-1]) + ".weight", arr.transpose(3, 2, 0, 1)
    bn = {"bn_scale": "bn.weight", "bn_bias": "bn.bias",
          "bn_mean": "bn.running_mean", "bn_var": "bn.running_var"}[leaf]
    return ".".join(parts[:-1]) + "." + bn, arr


class TestConversion:
    def test_state_dict_roundtrip(self):
        model = InceptionV3()
        shapes = jax.eval_shape(
            model.init, jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3))
        )
        rng = np.random.default_rng(3)
        flat = jax.tree_util.tree_flatten_with_path(shapes["params"])[0]
        sd = {}
        for path, s in flat:
            keys = tuple(p.key for p in path)
            val = rng.normal(size=s.shape).astype(np.float32)
            k, v = _torch_key_and_value(keys, val)
            sd[k] = v
        # decoys that torchvision ships but the FID extractor must skip
        sd["AuxLogits.fc.weight"] = rng.normal(size=(1000, 768)).astype(np.float32)
        sd["Conv2d_1a_3x3.bn.num_batches_tracked"] = np.int64(1)

        converted = convert_torch_state_dict(sd)
        # identical structure and values (modulo the transposes)
        ref_paths = {tuple(p.key for p in path) for path, _ in flat}
        got_flat = jax.tree_util.tree_flatten_with_path(converted["params"])[0]
        got_paths = {tuple(p.key for p in path) for path, _ in got_flat}
        assert got_paths == ref_paths
        for path, v in got_flat:
            keys = tuple(p.key for p in path)
            k, tv = _torch_key_and_value(keys, np.asarray(v))
            np.testing.assert_array_equal(tv, sd[k])

    def test_unknown_key_rejected(self):
        with pytest.raises(ValueError):
            convert_torch_state_dict({"Mixed_5b.branch1x1.conv.banana": np.zeros(3)})


class TestSmallForward:
    def test_random_params_forward(self):
        # real forward on a small input (fully-convolutional until the head)
        model = InceptionV3()
        x = jnp.zeros((1, 96, 96, 3))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        out = jax.jit(model.apply)(params, x)
        assert out["pool3"].shape == (1, 2048)
        assert np.isfinite(np.asarray(out["pool3"])).all()


@pytest.mark.skipif(not os.path.exists(WEIGHTS),
                    reason="no torchvision inception_v3 weights mounted")
class TestRealWeights:
    def test_load_and_extract(self):
        from eo_diffusion_tpu.models.inception import (
            inception_feature_extractor,
            load_torch_inception,
        )

        params = load_torch_inception(WEIGHTS)
        extract = inception_feature_extractor(params, with_logits=True)
        imgs = np.random.default_rng(0).uniform(size=(2, 128, 128, 3)).astype(np.float32)
        feats, probs = extract(imgs)
        assert feats.shape == (2, 2048)
        assert probs.shape == (2, 1000)
        np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-4)


class TestEvaluateCLIWiring:
    def test_inception_without_weights_errors(self, tmp_path):
        from eo_diffusion_tpu.cli import evaluate as eval_cli

        with pytest.raises(SystemExit):
            eval_cli.main(["--real", str(tmp_path), "--fake", str(tmp_path),
                           "--extractor", "inception",
                           "--inception_weights", "/nonexistent.pth"])

    def test_is_reported_with_logits_extractor(self):
        from eo_diffusion_tpu.cli.evaluate import compute_metrics

        rng = np.random.default_rng(0)
        real = rng.uniform(size=(12, 8, 8, 3)).astype(np.float32)
        fake = rng.uniform(size=(12, 8, 8, 3)).astype(np.float32)

        def fake_extractor(batch):
            feats = np.asarray(batch).reshape(len(batch), -1)[:, :16]
            logits = rng.normal(size=(len(batch), 10))
            p = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
            return feats, p

        m = compute_metrics(real, fake, extractor=fake_extractor,
                            batch=4, with_logits=True)
        assert "inception_score" in m and np.isfinite(m["inception_score"])
        assert np.isfinite(m["frechet_distance"])
