"""AOT export artifact (serving/export.py + cli/export_model.py).

The deployment contract under test: the artifact reproduces the live
engine's bytes exactly, reloads from disk through jax.export alone, and
the loader path never touches the framework's model stack (subprocess
proof). Beyond-reference capability — the reference has no deployment
packaging (SURVEY.md §2 #5 is an offline eval script)."""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _jitter(params, scale=0.05):
    """Break the OpenAI zero-init (out conv + every ResBlock's second conv
    start at 0, so eps≡0 at init and neither t nor y can steer the output):
    conditioning-sensitivity tests need every path live."""
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    return jax.tree.unflatten(treedef, [
        l + scale * jax.random.normal(k, l.shape, l.dtype)
        if jnp.issubdtype(l.dtype, jnp.floating) else l
        for l, k in zip(leaves, keys)])


def _build_engine(tmp, num_classes=0, cond_type=None, sampler="ddim",
                  steps=2, batch_size=4, int8=False, jitter=False):
    from eo_diffusion_tpu.cli.presets import (build_denoiser, build_process,
                                              get_preset)
    from eo_diffusion_tpu.serving.engine import SamplerEngine, ServingConfig

    preset = get_preset("tiny")
    ucfg = preset.model_config(bf16=False, num_classes=num_classes or None,
                               cond_channels=(preset.in_channels
                                              if cond_type == "concat" else 0))
    model = build_denoiser(ucfg)
    diffusion = build_process(preset, 50, preset.image_size,
                              cond_type=cond_type)
    s = preset.image_size
    x0 = jnp.zeros((1, s, s, 3))
    init_kw = {}
    if cond_type == "concat":
        init_kw["cond"] = jnp.zeros((1, s, s, 3))
    if num_classes:
        init_kw["y"] = jnp.zeros((1,), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0,
                                 jnp.zeros((1,), jnp.int32), **init_kw)
    if jitter:
        params = _jitter(params)
    cfg = ServingConfig(batch_size=batch_size, sampler=sampler, steps=steps,
                        bf16=False, num_classes=num_classes,
                        cond_channels=(3 if cond_type == "concat" else 0),
                        int8=int8)
    return SamplerEngine(model, params, diffusion, s, 3, cfg), preset


class TestExportRoundTrip:
    def test_artifact_matches_live_engine_bytes(self, tmp_path):
        from eo_diffusion_tpu.serving.export import export_engine, load_model

        engine, preset = _build_engine(tmp_path)
        out = str(tmp_path / "art")
        manifest = export_engine(engine, out)
        assert manifest["n_leaves"] > 0
        for name in ("sampler.stablehlo", "params.npz", "manifest.json"):
            assert os.path.exists(os.path.join(out, name)), name

        generate, man = load_model(out)
        key = jax.random.PRNGKey(11)
        live = engine.generate(key, None, None)
        packaged = generate(np.asarray(key))
        # the exported program IS the engine's program: exact bytes
        np.testing.assert_array_equal(live, packaged)
        s = preset.image_size
        assert packaged.shape == (4, s, s, 3)
        # int seeds route through PRNGKey like the live batcher's seed path
        np.testing.assert_array_equal(
            generate(11), engine.generate(jax.random.PRNGKey(11), None, None))

    def test_class_conditional_artifact(self, tmp_path):
        from eo_diffusion_tpu.serving.export import export_engine, load_model

        engine, _ = _build_engine(tmp_path, num_classes=3, jitter=True)
        out = str(tmp_path / "art")
        export_engine(engine, out)
        generate, man = load_model(out)
        assert man["num_classes"] == 3
        a = generate(0, y=[0, 0, 0, 0])
        b = generate(0, y=[1, 2, 1, 2])
        assert np.isfinite(a).all() and np.isfinite(b).all()
        assert not np.array_equal(a, b), "labels must steer the sampler"
        with pytest.raises(AssertionError):
            generate(0, y=[0, 0, 0, 9])  # out of vocabulary
        # exact parity with the live engine on the same labels
        y = np.array([2, 1, 0, 2], np.int32)
        np.testing.assert_array_equal(
            generate(5, y=y),
            engine.generate(jax.random.PRNGKey(5), y, None))

    def test_concat_conditional_artifact(self, tmp_path):
        from eo_diffusion_tpu.serving.export import export_engine, load_model

        engine, preset = _build_engine(tmp_path, cond_type="concat")
        out = str(tmp_path / "art")
        export_engine(engine, out)
        generate, man = load_model(out)
        s = preset.image_size
        cond = np.random.default_rng(0).normal(
            size=(4, s, s, 3)).astype(np.float32)
        np.testing.assert_array_equal(
            generate(3, cond=cond),
            engine.generate(jax.random.PRNGKey(3), None, cond))
        with pytest.raises(AssertionError):
            generate(3, cond=cond[:, :2])  # wrong shape
        # unconditional artifact rejects stray conditioning
        eng_u, _ = _build_engine(tmp_path)
        out2 = str(tmp_path / "art_u")
        export_engine(eng_u, out2)
        gen_u, _ = load_model(out2)
        with pytest.raises(AssertionError):
            gen_u(0, y=[0, 0, 0, 0])

    def test_flow_sampler_artifact(self, tmp_path):
        """The ODE scan path (FlowMatching Euler) survives jax.export too —
        the serve CLI builds tiny-flow engines, so the artifact must."""
        from eo_diffusion_tpu.cli.presets import (build_denoiser,
                                                  build_process, get_preset)
        from eo_diffusion_tpu.serving.engine import SamplerEngine, ServingConfig
        from eo_diffusion_tpu.serving.export import export_engine, load_model

        preset = get_preset("tiny-flow")
        model = build_denoiser(preset.model_config(bf16=False))
        proc = build_process(preset, 50, preset.image_size)
        s = preset.image_size
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, s, s, 3)),
                                     jnp.zeros((1,), jnp.int32))
        cfg = ServingConfig(batch_size=2, sampler="flow", steps=2, bf16=False)
        engine = SamplerEngine(model, params, proc, s, 3, cfg)
        out = str(tmp_path / "art_flow")
        export_engine(engine, out)
        generate, man = load_model(out)
        assert man["sampler"] == "flow"
        np.testing.assert_array_equal(
            generate(9), engine.generate(jax.random.PRNGKey(9), None, None))

    def test_meanflow_one_nfe_artifact(self, tmp_path):
        """The 1-model-call MeanFlow sampler (arXiv:2505.13447) exports:
        dual-time packed timesteps live INSIDE the traced program, so the
        artifact surface is unchanged (seed -> images)."""
        from eo_diffusion_tpu.cli.presets import (build_denoiser,
                                                  build_process, get_preset)
        from eo_diffusion_tpu.serving.engine import SamplerEngine, ServingConfig
        from eo_diffusion_tpu.serving.export import export_engine, load_model

        preset = get_preset("tiny-meanflow")
        model = build_denoiser(preset.model_config(bf16=False))
        proc = build_process(preset, 50, preset.image_size)
        s = preset.image_size
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, s, s, 3)),
                                     jnp.zeros((1, 2), jnp.float32))
        cfg = ServingConfig(batch_size=2, sampler="flow", steps=1, bf16=False)
        engine = SamplerEngine(model, params, proc, s, 3, cfg)
        out = str(tmp_path / "art_mf")
        export_engine(engine, out)
        generate, man = load_model(out)
        assert man["steps"] == 1
        np.testing.assert_array_equal(
            generate(9), engine.generate(jax.random.PRNGKey(9), None, None))

    def test_int8_artifact_round_trips(self, tmp_path):
        """int8 packing survives export: the quantized leaves land in
        params.npz and the in-program dequant reproduces the live engine."""
        from eo_diffusion_tpu.serving.export import export_engine, load_model

        engine, _ = _build_engine(tmp_path, int8=True)
        out = str(tmp_path / "art8")
        manifest = export_engine(engine, out)
        assert manifest["int8"]
        z = np.load(os.path.join(out, "params.npz"))
        assert any(z[k].dtype == np.int8 for k in z.files)
        generate, _ = load_model(out)
        np.testing.assert_array_equal(
            generate(4), engine.generate(jax.random.PRNGKey(4), None, None))


class TestExportCLI:
    def test_cli_export_then_run(self, tmp_path):
        from eo_diffusion_tpu.cli import export_model as M

        out = str(tmp_path / "art")
        args = M.parse_args([
            "--preset", "tiny", "--out", out, "--batch_size", "2",
            "--sampler", "ddim", "--sampler_steps", "2", "--no_bf16",
            "--pag_scale", "1.5", "--run"])
        M.main(args)
        with open(os.path.join(out, "manifest.json")) as f:
            man = json.load(f)
        assert man["preset"] == "tiny" and man["steps"] == 2
        # PAG rode the export: recorded in the manifest, baked in the program
        assert man["pag_scale"] == 1.5
        assert os.path.exists(os.path.join(out, "smoke.png"))

    def test_artifact_server_http_roundtrip(self, tmp_path):
        """The deployment-host server: POST /v1/generate against the
        deserialized program, npy-b64 response matches the live engine's
        rows; oversize n is a 400, /healthz returns the manifest."""
        import base64
        import io
        import threading
        import urllib.error
        import urllib.request

        from eo_diffusion_tpu.serving.artifact_server import make_server
        from eo_diffusion_tpu.serving.export import export_engine

        engine, _ = _build_engine(tmp_path, batch_size=4)
        out = str(tmp_path / "art")
        export_engine(engine, out)
        srv, port = make_server(out, port=0)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            url = f"http://127.0.0.1:{port}"
            with urllib.request.urlopen(f"{url}/healthz", timeout=60) as r:
                man = json.loads(r.read())["manifest"]
            assert man["batch_size"] == 4
            body = json.dumps({"n": 2, "seed": 3}).encode()
            req = urllib.request.Request(f"{url}/v1/generate", data=body)
            with urllib.request.urlopen(req, timeout=600) as r:
                payload = json.loads(r.read())
            got = np.load(io.BytesIO(base64.b64decode(payload["npy_b64"])))
            live = engine.generate(jax.random.PRNGKey(3), None, None)[:2]
            np.testing.assert_array_equal(got, live)
            bad = urllib.request.Request(
                f"{url}/v1/generate", data=json.dumps({"n": 9}).encode())
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(bad, timeout=60)
            assert ei.value.code == 400
            # the 400 contract is explicit raises, not asserts, so it
            # survives python -O (ValueError -> 400 in the handler)
            eng = srv.RequestHandlerClass.engine
            with pytest.raises(ValueError, match="fixed-shape"):
                eng.run(9, 0)
            with pytest.raises(ValueError, match="entries"):
                eng.run(2, 0, y=[1, 2, 3])
        finally:
            srv.shutdown()
            srv.server_close()

    def test_loader_needs_no_model_code(self, tmp_path):
        """Deployment-host proof: a fresh process loads and runs the
        artifact importing ONLY serving.export (jax + numpy underneath) —
        none of the framework's model/diffusion modules may load."""
        from eo_diffusion_tpu.serving.export import export_engine

        engine, _ = _build_engine(tmp_path, batch_size=2)
        out = str(tmp_path / "art")
        export_engine(engine, out)
        script = (
            "import sys\n"
            "from eo_diffusion_tpu.serving.export import load_model\n"
            f"gen, man = load_model({out!r})\n"
            "x = gen(0)\n"
            "assert x.shape == (2, man['image_size'], man['image_size'], "
            "man['channels']), x.shape\n"
            "import numpy as np; assert np.isfinite(x).all()\n"
            "# the deployment-host server rides the same purity contract\n"
            "from eo_diffusion_tpu.serving.artifact_server import "
            "ArtifactEngine\n"
            f"eng = ArtifactEngine({out!r})\n"
            "assert np.array_equal(eng.run(2, 0), x)\n"
            "banned = [m for m in sys.modules\n"
            "          if m.startswith('eo_diffusion_tpu.models')\n"
            "          or m.startswith('eo_diffusion_tpu.diffusion')\n"
            "          or m.startswith('flax')]\n"
            "assert not banned, banned\n"
            "print('LOADER_OK')\n")
        env = dict(os.environ,
                   PYTHONPATH="/root/repo" + os.pathsep
                   + os.environ.get("PYTHONPATH", ""))
        r = subprocess.run([sys.executable, "-c", script], env=env,
                           capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "LOADER_OK" in r.stdout


class TestW8A8Export:
    def test_w8a8_program_round_trips(self, tmp_path):
        """--int8_compute bakes the int8 MXU program into the artifact: the
        deserialized program reproduces the live W8A8 engine byte-exactly
        and the manifest records the mode."""
        from eo_diffusion_tpu.cli.presets import (build_denoiser,
                                                  build_process, get_preset)
        from eo_diffusion_tpu.serving.engine import SamplerEngine, ServingConfig
        from eo_diffusion_tpu.serving.export import export_engine, load_model

        preset = get_preset("tiny-dit")
        import dataclasses as _dc

        dcfg = _dc.replace(preset.model_config(bf16=False),
                           hidden_size=256, num_heads=4)
        model = build_denoiser(dcfg)
        diffusion = build_process(preset, 50, preset.image_size)
        x0 = jnp.zeros((1, preset.image_size, preset.image_size, 3))
        params = _jitter(jax.jit(model.init)(
            jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.int32)))
        cfg = ServingConfig(batch_size=64, sampler="ddim", steps=2,
                            bf16=False, int8_compute=True)
        engine = SamplerEngine(model, params, diffusion, preset.image_size,
                               3, cfg)
        out = str(tmp_path / "art_w8a8")
        manifest = export_engine(engine, out)
        assert manifest["int8_compute"]
        generate, _ = load_model(out)
        np.testing.assert_array_equal(
            generate(4), engine.generate(jax.random.PRNGKey(4), None, None))
