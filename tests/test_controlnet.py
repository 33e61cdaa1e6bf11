"""ControlNet adapter tests (models/controlnet.py + UNet `control` input +
cli/finetune.py --method controlnet + cli/inference.py --controlnet).

The wiring is exact: zero-init heads make the controlled forward
bit-identical to the frozen base (arXiv:2302.05543 §3.2), so the
identity tests are equality, not tolerance. The e2e test bolts a hint
modality onto a frozen unconditional DDPM and checks the adapter alone
cuts the held-out denoising loss.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eo_diffusion_tpu.models.controlnet import (
    ControlNet,
    control_param_count,
    init_from_base,
    load_controlnet,
    save_controlnet,
)
from eo_diffusion_tpu.models.unet import UNet, UNetConfig

SIZE = 8


def _cfg(**kw):
    base = dict(image_size=SIZE, in_channels=3, model_channels=16,
                out_channels=3, num_res_blocks=1, attention_resolutions=(2,),
                channel_mult=(1, 2), num_heads=2)
    base.update(kw)
    return UNetConfig(**base)


def _dezero(params, scale=0.02, seed=9):
    """Perturb every leaf so the zero-init output convs stop masking the
    forward (at `model.init` the UNet output is exactly zero)."""
    leaves, treedef = jax.tree.flatten(params)
    ks = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    return jax.tree.unflatten(
        treedef,
        [l + scale * jax.random.normal(k, l.shape, l.dtype)
         for l, k in zip(leaves, ks)])


def _setup(hint_ch=1, **cfg_kw):
    cfg = _cfg(**cfg_kw)
    model = UNet(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, SIZE, SIZE, 3))
    t = jnp.array([3, 7])
    hint = jax.random.normal(jax.random.PRNGKey(2), (2, SIZE, SIZE, hint_ch))
    base = _dezero(jax.jit(model.init)(jax.random.PRNGKey(0), x, t))
    cnet = ControlNet(cfg, hint_channels=hint_ch)
    cparams = jax.jit(cnet.init)(jax.random.PRNGKey(3), x, t, hint)
    return model, cnet, base, cparams, x, t, hint


class TestWiring:
    def test_zero_init_is_exact_identity(self):
        model, cnet, base, cparams, x, t, hint = _setup()
        cparams, _ = init_from_base(cparams, base)
        ctrl = cnet.apply(cparams, x, t, hint)
        out_c = model.apply(base, x, t, control=ctrl)
        out_b = model.apply(base, x, t)
        assert float(jnp.max(jnp.abs(out_b))) > 0  # non-degenerate base
        np.testing.assert_array_equal(np.asarray(out_c), np.asarray(out_b))

    def test_init_from_base_copies_encoder(self):
        model, cnet, base, cparams, x, t, hint = _setup()
        cparams2, n_copied = init_from_base(cparams, base)
        assert n_copied > 0
        bp, cp = base["params"], cparams2["params"]
        for name in ("input_0_0", "middle_0", "time_embed_0"):
            for (pa, la), (pb, lb) in zip(
                    jax.tree_util.tree_leaves_with_path(bp[name]),
                    jax.tree_util.tree_leaves_with_path(cp[name])):
                np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
        # fresh heads stay zero (hint_out + per-block/middle zero convs)
        for name in cp:
            if name.startswith("zero_") or name == "hint_out":
                for l in jax.tree.leaves(cp[name]):
                    assert float(jnp.abs(l).max()) == 0.0, name

    def test_trained_adapter_steers_and_depends_on_hint(self):
        model, cnet, base, cparams, x, t, hint = _setup()
        cparams, _ = init_from_base(cparams, base)
        cp = jax.tree.map(lambda l: l + 0.05, cparams)  # de-zero the heads
        out_b = model.apply(base, x, t)
        out_1 = model.apply(base, x, t, control=cnet.apply(cp, x, t, hint))
        out_2 = model.apply(base, x, t,
                            control=cnet.apply(cp, x, t, -hint))
        assert float(jnp.max(jnp.abs(out_1 - out_b))) > 1e-3
        assert float(jnp.max(jnp.abs(out_1 - out_2))) > 1e-4

    def test_gradients_reach_adapter_only_leaves(self):
        model, cnet, base, cparams, x, t, hint = _setup()
        cparams, _ = init_from_base(cparams, base)

        def loss(cp):
            out = model.apply(base, x, t,
                              control=cnet.apply(cp, x, t, hint))
            return jnp.mean((out - 1.0) ** 2)

        g = jax.grad(loss)(cparams)
        total = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g))
        assert np.isfinite(total) and total > 0

    def test_deepcache_split_rejected(self):
        model, cnet, base, cparams, x, t, hint = _setup()
        ctrl = cnet.apply(cparams, x, t, hint)
        with pytest.raises(AssertionError):
            model.apply(base, x, t, control=ctrl, return_deep=True)

    def test_class_conditional_base(self):
        model, cnet, base, cparams, x, t, hint = (None,) * 7
        cfg = _cfg(num_classes=4)
        model = UNet(cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, SIZE, SIZE, 3))
        t = jnp.array([3, 7])
        y = jnp.array([1, 2])
        hint = jnp.ones((2, SIZE, SIZE, 1))
        base = _dezero(jax.jit(model.init)(jax.random.PRNGKey(0), x, t, y=y))
        cnet = ControlNet(cfg, hint_channels=1)
        cparams = jax.jit(cnet.init)(jax.random.PRNGKey(3), x, t, hint, y=y)
        cparams, n = init_from_base(cparams, base)
        assert n > 0
        ctrl = cnet.apply(cparams, x, t, hint, y=y)
        np.testing.assert_array_equal(
            np.asarray(model.apply(base, x, t, y=y, control=ctrl)),
            np.asarray(model.apply(base, x, t, y=y)))

    def test_save_load_roundtrip(self, tmp_path):
        _, cnet, base, cparams, x, t, hint = _setup()
        cparams, _ = init_from_base(cparams, base)
        save_controlnet(str(tmp_path), jax.device_get(cparams),
                        {"hint_channels": 1})
        loaded, meta = load_controlnet(str(tmp_path), cparams)
        assert meta["hint_channels"] == 1
        for a, b in zip(jax.tree.leaves(cparams), jax.tree.leaves(loaded)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestEndToEnd:
    def test_adapter_learns_hint_conditioning(self):
        """Frozen unconditional base, trained on bimodal flat images; the
        hint IS the clean target. Training only the adapter must cut the
        held-out denoising loss vs the frozen base — the control branch
        is the only path the hint can reach the output through."""
        import optax

        from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
        from eo_diffusion_tpu.train.trainer import Trainer, TrainerConfig

        rng_np = np.random.default_rng(0)

        def mk(bs=16):
            return {"image": (
                rng_np.choice([-0.6, 0.6], size=(bs, 1, 1, 1))
                + 0.05 * rng_np.normal(size=(bs, SIZE, SIZE, 3))
            ).astype(np.float32)}

        cfg = _cfg(attention_resolutions=(), model_channels=32, num_heads=1)
        model = UNet(cfg)
        diff = GaussianDiffusion.create(timesteps=100, image_size=SIZE,
                                        in_channels=3)
        tr = Trainer(TrainerConfig(lr=2e-3, batch_size=16, epochs=1,
                                   timesteps=100, model_ema_steps=5),
                     model, diff, 100)
        state = tr.init(jax.random.PRNGKey(0), mk())
        for _ in range(200):
            state, _ = tr.step(state, mk())
        base = state.params

        cnet = ControlNet(cfg, hint_channels=3)
        x0 = jnp.zeros((1, SIZE, SIZE, 3))
        cparams = jax.jit(cnet.init)(jax.random.PRNGKey(5), x0,
                                     jnp.zeros((1,), jnp.int32), x0)
        cparams, _ = init_from_base(cparams, base)
        tx = optax.adam(2e-3)
        opt = tx.init(cparams)

        @jax.jit
        def jstep(cp, opt, rng, img):
            def loss_fn(cp):
                def fn(x, t, c, y=None):
                    return model.apply(base, x, t, y=y,
                                       control=cnet.apply(cp, x, t, c))
                return diff.train_loss(fn, rng, img, cond=img)

            loss, grads = jax.value_and_grad(loss_fn)(cp)
            up, opt = tx.update(grads, opt, cp)
            return optax.apply_updates(cp, up), opt, loss

        key = jax.random.PRNGKey(9)
        for _ in range(300):
            key, k = jax.random.split(key)
            cparams, opt, loss = jstep(cparams, opt, k,
                                       jnp.asarray(mk()["image"]))
        assert np.isfinite(float(loss))

        eval_img = jnp.asarray(mk(bs=64)["image"])

        def held_out(params_fn):
            return float(diff.train_loss(params_fn, jax.random.PRNGKey(123),
                                         eval_img, cond=eval_img))

        l_base = held_out(lambda x, t, c, y=None: model.apply(base, x, t))
        l_ctrl = held_out(
            lambda x, t, c, y=None: model.apply(
                base, x, t, control=cnet.apply(cparams, x, t, c)))
        assert l_ctrl < 0.6 * l_base, (l_base, l_ctrl)
        # adapter is a strict subset of a second full model
        n_base = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(base))
        assert control_param_count(cparams) < n_base


class TestControlNetCLI:
    def test_finetune_and_serve_roundtrip(self, tmp_path):
        from eo_diffusion_tpu.cli import finetune as ft_cli
        from eo_diffusion_tpu.cli import inference as infer_cli
        from eo_diffusion_tpu.cli import train as train_cli

        cwd = os.getcwd()
        os.chdir(str(tmp_path))
        try:
            train_cli.main(train_cli.parse_args([
                "--preset", "tiny", "--epochs", "1",
                "--steps_per_epoch", "3", "--batch_size", "8",
                "--dir", "res_ctrl", "--sample_every", "100",
                "--save_every", "3", "--log_freq", "1", "--n_samples", "4",
            ]))
            ckpt_root = os.path.join(str(tmp_path), "logs", "res_ctrl")
            steps = sorted(d for d in os.listdir(ckpt_root)
                           if d.startswith("steps_"))
            base_ckpt = os.path.join(ckpt_root, steps[-1])

            outdir = str(tmp_path / "adapter")
            res = ft_cli.main(ft_cli.parse_args([
                "--method", "controlnet", "--preset", "tiny",
                "--ckpt", base_ckpt, "--dir", outdir,
                "--steps", "4", "--batch_size", "8", "--no_bf16",
            ]))
            assert np.isfinite(res["loss_last"]) and res["n_ctrl"] > 0
            assert os.path.exists(os.path.join(outdir, "controlnet.npz"))
            assert os.path.exists(os.path.join(outdir, "controlnet.json"))

            infer_out = str(tmp_path / "infer_ctrl")
            infer_cli.main(infer_cli.parse_args([
                "--preset", "tiny", "--ckpt", base_ckpt,
                "--controlnet", outdir, "--sampler", "ddim",
                "--sampler_steps", "5", "--save", "--metrics",
                "--n_iter", "0", "--batch_size", "4",
                "--outdir", infer_out,
            ]))
            assert os.listdir(os.path.join(infer_out, "samples"))
        finally:
            os.chdir(cwd)

    def test_latent_preset_rejected(self):
        from eo_diffusion_tpu.cli import finetune as ft_cli

        with pytest.raises(AssertionError):
            ft_cli.main(ft_cli.parse_args([
                "--method", "controlnet", "--preset", "tiny-latent",
                "--ckpt", "/nonexistent",
            ]))
