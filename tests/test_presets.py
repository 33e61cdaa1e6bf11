"""Preset registry dispatch tests (cli/presets.py): model_config /
build_denoiser / build_process route to the right backbone family and
process for every preset axis combination."""

import jax.numpy as jnp
import pytest

from eo_diffusion_tpu.cli.presets import (
    PRESETS,
    build_denoiser,
    build_process,
    get_preset,
)


class TestModelConfigDispatch:
    def test_unet_presets_build_unet(self):
        from eo_diffusion_tpu.models.unet import UNet, UNetConfig

        p = get_preset("clouds64-attn")
        cfg = p.model_config(bf16=True)
        assert isinstance(cfg, UNetConfig)
        assert isinstance(build_denoiser(cfg), UNet)

    def test_dit_presets_build_dit(self):
        from eo_diffusion_tpu.models.dit import DiT, DiTConfig

        p = get_preset("dit64")
        cfg = p.model_config(bf16=True)
        assert isinstance(cfg, DiTConfig)
        assert cfg.hidden_size == p.base_dim and cfg.depth == p.depth
        assert cfg.patch_size == p.patch_size
        assert isinstance(build_denoiser(cfg), DiT)

    def test_dit_cond_channels_enter_in_channels(self):
        p = get_preset("tiny-dit")
        cfg = p.model_config(cond_channels=3)
        assert cfg.in_channels == p.in_channels + 3
        assert cfg.out_channels == p.in_channels

    def test_bf16_flag(self):
        cfg = get_preset("tiny-dit").model_config(bf16=False)
        assert cfg.dtype == jnp.float32

    def test_class_dropout_reserves_null_row(self):
        for preset in ("tiny", "tiny-dit"):  # unet and dit backbones
            cfg = get_preset(preset).model_config(
                num_classes=4, class_dropout_prob=0.2)
            assert cfg.label_vocab == 5, preset
            plain = get_preset(preset).model_config(num_classes=4)
            assert plain.label_vocab == 4, preset


class TestProcessDispatch:
    def test_ddpm_process(self):
        from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion

        p = get_preset("tiny")
        proc = build_process(p, timesteps=50, image_size=8)
        assert isinstance(proc, GaussianDiffusion)
        assert proc.timesteps == 50

    def test_flow_process(self):
        from eo_diffusion_tpu.diffusion.flow import FlowMatching

        p = get_preset("tiny-flow")
        proc = build_process(p, timesteps=50, image_size=8)
        assert isinstance(proc, FlowMatching)
        assert proc.image_size == 8

    def test_latent_preset_sizes_process_to_latent_grid(self):
        p = get_preset("tiny-latent")
        proc = build_process(p, timesteps=50, image_size=p.image_size)
        assert proc.image_size == p.latent_size
        assert proc.in_channels == p.latent_channels

    def test_latent_flow_process(self):
        from eo_diffusion_tpu.diffusion.flow import FlowMatching

        p = get_preset("tiny-latent-flow")
        proc = build_process(p, timesteps=50, image_size=p.image_size)
        assert isinstance(proc, FlowMatching)
        assert proc.image_size == p.latent_size

    def test_flow_sum_conditioning_builds(self):
        # "sum" = sampling-time-only mask inpainting; supported on the flow
        # path via FlowMatching.sample(mask=, x0=)
        p = get_preset("tiny-flow")
        proc = build_process(p, timesteps=50, image_size=8, cond_type="sum")
        assert proc.cond_type == "sum"


class TestRegistryInvariants:
    def test_all_presets_produce_configs(self):
        for name in PRESETS:
            p = get_preset(name)
            cfg = p.model_config(bf16=False)
            assert cfg.image_size == (p.latent_size if p.is_latent
                                      else p.image_size), name
            build_denoiser(cfg)

    def test_get_preset_returns_copy(self):
        a = get_preset("tiny")
        a.image_size = 999
        assert get_preset("tiny").image_size != 999

    def test_unknown_preset_raises(self):
        with pytest.raises(ValueError, match="unknown preset"):
            get_preset("nope")
