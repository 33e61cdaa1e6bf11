"""Named experiment presets (the config registry SURVEY.md §5 calls for).

The reference selects architectures by editing source lines
(train.py:50-52, inference.py:60-62; known-good recipes in
configs/Configs.txt). Here each recipe is a named preset selectable with
``--preset``; every field can still be overridden by the reference's CLI
flags (``--model_base_dim``, ``--timesteps``, ...).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp

from eo_diffusion_tpu.models.unet import UNetConfig

__all__ = ["Preset", "PRESETS", "get_preset"]


@dataclasses.dataclass
class Preset:
    name: str
    dataset: str
    image_size: int
    in_channels: int
    base_dim: int
    dim_mults: Tuple[int, ...]
    attention_resolutions: Tuple[int, ...]
    num_res_blocks: int
    num_heads: int
    cond_type: Optional[str] = None
    num_classes: int = 0
    timesteps: int = 1000
    batch_size: int = 128
    # latent diffusion (CompVis LatentDiffusion slot, reference
    # diffusion/ddpm.py:628-692): latent_downs > 0 switches the preset to a
    # two-stage recipe -- a ConvAutoencoder first stage with 2**latent_downs
    # spatial reduction, then the UNet diffuses the [size/2**d]^2 x
    # latent_channels grid and samples decode back to pixels.
    latent_downs: int = 0
    latent_channels: int = 4
    ae_base_dim: int = 64
    ae_steps: int = 2000  # default first-stage training budget (cli/train.py)
    # beyond-reference axes: backbone family and training process.
    # backbone "dit" selects models/dit.DiT (base_dim becomes the hidden
    # size, depth the block count, patch_size the patchify stride);
    # process "flow" trains/samples with diffusion/flow.FlowMatching
    # (rectified flow) instead of the DDPM chain.
    backbone: str = "unet"  # "unet" | "dit"
    patch_size: int = 4
    depth: int = 12
    # "meanflow" trains diffusion/meanflow.MeanFlow (average-velocity
    # one-step generation, arXiv:2505.13447); its backbones are built
    # dual_time (the model takes (t, r) packed as [N, 2]).
    process: str = "ddpm"  # "ddpm" | "flow" | "edm" | "bridge" | "meanflow"
    # MeanFlow CFG-integrated training (paper §4): omega > 1 bakes
    # omega-guided sampling into the learned field (1-NFE guided samples
    # from a single conditional call). Needs num_classes > 0.
    mf_cfg_omega: float = 1.0
    # default CFG label-dropout for class-conditional presets (allocates
    # the null embedding row; cli/train's --class_dropout overrides)
    class_dropout: float = 0.0
    # DDPM prediction objective + Lin et al. 2023 schedule fix
    # (arXiv:2305.08891, beyond-reference): zero_terminal_snr rescales the
    # schedule so SNR(T)=0 (requires objective="v"); pair with
    # --ddim_spacing trailing at inference so sampling starts at t=T-1
    objective: str = "eps"  # "eps" | "x0" | "v"
    zero_terminal_snr: bool = False
    # Mixture-of-Experts DiT (models/moe.py, beyond-reference): > 0 routes
    # every moe_every-th block's FFN over num_experts experts (top-k
    # token-choice, GShard dense dispatch). Train with --ep on a mesh with
    # a model axis for expert parallelism.
    num_experts: int = 0
    moe_top_k: int = 1
    moe_every: int = 2
    # super-resolution stage (reference SuperResModel capability,
    # backbones/unet.py:828-842, generalized to an end-to-end recipe):
    # sr_factor > 0 makes this a concat-conditioned SR model — the CLIs
    # derive the conditioning as data.transforms.sr_cond(image, factor)
    # (avg-pool degrade, nearest-upsample back), so ANY dataset trains an
    # SR stage and cli/cascade.py chains it behind a base preset whose
    # image_size * sr_factor matches
    sr_factor: int = 0

    @property
    def is_latent(self) -> bool:
        return self.latent_downs > 0

    @property
    def latent_size(self) -> int:
        return self.image_size // (2 ** self.latent_downs)

    def unet_config(self, num_classes: Optional[int] = None, bf16: bool = True,
                    cond_channels: int = 0) -> UNetConfig:
        """UNet sized to the diffusion grid: pixels normally, the latent grid
        for latent presets (in/out channels become latent_channels)."""
        size = self.latent_size if self.is_latent else self.image_size
        chans = self.latent_channels if self.is_latent else self.in_channels
        return UNetConfig(
            image_size=size,
            in_channels=chans + cond_channels,
            model_channels=self.base_dim,
            out_channels=chans,
            num_res_blocks=self.num_res_blocks,
            attention_resolutions=self.attention_resolutions,
            channel_mult=self.dim_mults,
            num_heads=self.num_heads,
            num_classes=num_classes if num_classes else (self.num_classes or None),
            dtype=jnp.bfloat16 if bf16 else jnp.float32,
        )

    def model_config(self, num_classes: Optional[int] = None, bf16: bool = True,
                     cond_channels: int = 0, class_dropout_prob: float = 0.0):
        """Backbone config for the preset's model family: UNetConfig for
        "unet", DiTConfig for "dit" (base_dim -> hidden size).
        ``class_dropout_prob > 0`` reserves the null-class embedding row for
        classifier-free guidance (train-step label dropout owns the drop)."""
        if self.backbone == "unet":
            cfg = self.unet_config(num_classes=num_classes, bf16=bf16,
                                   cond_channels=cond_channels)
            if class_dropout_prob > 0:
                cfg = dataclasses.replace(
                    cfg, class_dropout_prob=class_dropout_prob)
            if self.process == "meanflow":
                # dual-time input; attention pinned to XLA because the
                # MeanFlow loss takes a jax.jvp THROUGH the model and
                # forward-mode autodiff cannot cross the Pallas kernel's
                # custom_vjp (at these token counts the auto-dispatch
                # stays on XLA anyway, ops/attention.py min_seq=512)
                cfg = dataclasses.replace(cfg, dual_time=True,
                                          attn_impl="xla")
            return cfg
        if self.backbone == "spade":
            # SDM/SPADE semantic-diffusion UNet (reference vendors it at
            # backbones/unet.py:557+ without an entry point): the segmap is
            # the SPATIAL conditioning (modulates every GroupNorm), so the
            # embedding-based class/CFG machinery does not apply
            assert not num_classes and class_dropout_prob == 0.0, (
                "the SPADE backbone conditions on the segmap spatially; "
                "embedding-class conditioning/CFG are not wired")
            assert not self.is_latent, "spade presets are pixel-space"
            from eo_diffusion_tpu.models.unet_spade import SpadeUNetConfig

            return SpadeUNetConfig(
                image_size=self.image_size,
                in_channels=self.in_channels,
                model_channels=self.base_dim,
                out_channels=self.in_channels,
                label_channels=max(cond_channels, 1),
                num_res_blocks=self.num_res_blocks,
                attention_resolutions=self.attention_resolutions,
                channel_mult=self.dim_mults,
                num_heads=self.num_heads,
                spade_hidden=min(128, 2 * self.base_dim),
                dtype=jnp.bfloat16 if bf16 else jnp.float32,
            )
        assert self.backbone == "dit", self.backbone
        from eo_diffusion_tpu.models.dit import DiTConfig

        size = self.latent_size if self.is_latent else self.image_size
        chans = self.latent_channels if self.is_latent else self.in_channels
        return DiTConfig(
            image_size=size,
            in_channels=chans + cond_channels,
            out_channels=chans,
            patch_size=self.patch_size,
            hidden_size=self.base_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            num_classes=num_classes if num_classes else (self.num_classes or None),
            class_dropout_prob=class_dropout_prob,
            dtype=jnp.bfloat16 if bf16 else jnp.float32,
            num_experts=self.num_experts,
            moe_top_k=self.moe_top_k,
            moe_every=self.moe_every,
            dual_time=(self.process == "meanflow"),
            # jvp through the model (MeanFlow loss) cannot cross the Pallas
            # kernel's custom_vjp — pin attention to the XLA path
            attn_impl="xla" if self.process == "meanflow" else "auto",
        )

    def ae_config(self, bf16: bool = False):
        from eo_diffusion_tpu.models.autoencoder import AutoencoderConfig

        assert self.is_latent, f"preset {self.name} is not a latent recipe"
        return AutoencoderConfig(
            in_channels=self.in_channels,
            latent_channels=self.latent_channels,
            base_channels=self.ae_base_dim,
            num_down=self.latent_downs,
            dtype=jnp.bfloat16 if bf16 else jnp.float32,
        )


PRESETS = {
    # train.py:50 active default (base 128, no attention, 1 res-block)
    "eurosat64": Preset("eurosat64", "eurosat", 64, 3, 128, (1, 2, 3, 4), (), 1, 1),
    # configs/Configs.txt:20-23 / notebook cell 7: the published clouds recipe
    "clouds64-attn": Preset("clouds64-attn", "clouds", 64, 3, 128, (1, 2, 3, 4), (4, 8), 2, 8,
                            cond_type="sum"),
    # inference.py:60 variant (mults 1,2,4,8)
    "inria64": Preset("inria64", "inria", 64, 3, 128, (1, 2, 4, 8), (), 1, 1),
    "oscd64": Preset("oscd64", "oscd", 64, 3, 128, (1, 2, 3, 4), (4, 8), 2, 8),
    # BASELINE.json CPU-runnable MNIST config
    "mnist": Preset("mnist", "mnist", 28, 1, 32, (1, 2, 2), (), 1, 1,
                    timesteps=1000, batch_size=128),
    # SEN12MS-CR supervised cloud removal: model p(clear | cloudy) with the
    # cloudy view as concat conditioning (256px native patches)
    "sen12mscr256": Preset("sen12mscr256", "sen12mscr", 256, 3, 128, (1, 2, 3, 4),
                           (4, 8), 2, 8, cond_type="concat", batch_size=16),
    "synthetic64": Preset("synthetic64", "synthetic", 64, 3, 64, (1, 2, 3, 4), (4, 8), 1, 4),
    # tiny smoke config for CI / CPU runs
    "tiny": Preset("tiny", "synthetic", 8, 3, 32, (1, 2), (), 1, 1,
                   timesteps=50, batch_size=16),
    # SPADE/SDM semantic-map conditioned generation (reference vendors the
    # SDM UNet without an entry point; cond_type="spade" feeds the
    # dataset's segmentation as the segmap that modulates every norm)
    "spade64": Preset("spade64", "synthetic", 64, 3, 64, (1, 2, 3, 4),
                      (8,), 2, 4, cond_type="spade", backbone="spade",
                      batch_size=64),
    "tiny-spade": Preset("tiny-spade", "synthetic", 8, 3, 32, (1, 2), (),
                         1, 1, cond_type="spade", backbone="spade",
                         timesteps=50, batch_size=16),
    # v-prediction + zero-terminal-SNR (Lin et al. 2023, arXiv:2305.08891;
    # beyond-reference): the schedule actually reaches SNR=0 so generations
    # stop inheriting x_T's mean; sample with --ddim_spacing trailing
    "vpred64": Preset("vpred64", "synthetic", 64, 3, 64, (1, 2, 3, 4), (4, 8),
                      1, 4, objective="v", zero_terminal_snr=True),
    "tiny-vpred": Preset("tiny-vpred", "synthetic", 8, 3, 32, (1, 2), (), 1, 1,
                         timesteps=50, batch_size=16, objective="v",
                         zero_terminal_snr=True),
    # EDM (Karras et al., arXiv:2206.00364; beyond-reference): sigma-space
    # preconditioned denoiser, Karras-grid Heun sampler (+churn)
    "edm64": Preset("edm64", "synthetic", 64, 3, 64, (1, 2, 3, 4), (4, 8),
                    1, 4, batch_size=64, process="edm"),
    "tiny-edm": Preset("tiny-edm", "synthetic", 8, 3, 32, (1, 2), (), 1, 1,
                       batch_size=16, process="edm"),
    # tiny cloud-removal smoke config: concat-conditions on the synthetic
    # cloudy view ("cond_image"), i.e. the sen12mscr256 use-case in miniature
    "tiny-cr": Preset("tiny-cr", "synthetic", 8, 3, 32, (1, 2), (), 1, 1,
                      cond_type="concat", timesteps=50, batch_size=16),
    # latent diffusion (CompVis slot, ddpm.py:628-692): 64px images diffused
    # as 16x16x4 latents behind a trained ConvAutoencoder first stage
    "latent64": Preset("latent64", "synthetic", 64, 3, 64, (1, 2, 3), (2, 4), 2, 4,
                       timesteps=1000, batch_size=64,
                       latent_downs=2, latent_channels=4, ae_base_dim=64,
                       ae_steps=3000),
    # tiny latent smoke config (CI / CPU): 16px pixels -> 8x8x4 latents
    "tiny-latent": Preset("tiny-latent", "synthetic", 16, 3, 32, (1, 2), (), 1, 1,
                          timesteps=50, batch_size=16,
                          latent_downs=1, latent_channels=4, ae_base_dim=16,
                          ae_steps=60),
    # beyond-reference: DiT-S/4 transformer denoiser at 64px (256 tokens,
    # head dim 64 -- native tile shapes for the fused attention kernel)
    "dit64": Preset("dit64", "synthetic", 64, 3, 384, (), (), 0, 6,
                    batch_size=64, backbone="dit", patch_size=4, depth=12),
    # the 256px modern-stack configuration (DiT-B/8 + rectified flow) the
    # capstone trains (tools/capstone_dit256.py), exposed as a preset so the
    # CLIs and serving can load those checkpoints directly
    "dit256": Preset("dit256", "synthetic", 256, 3, 768, (), (), 0, 12,
                     batch_size=16, backbone="dit", patch_size=8, depth=12,
                     process="flow"),
    # the production LDM configuration (VERDICT r4 item 2): f4 ConvAE first
    # stage at 256px, DiT-B/4 + rectified flow on the 64x64x4 latent grid
    # (256 tokens vs dit256's 1024 pixel-space tokens; the AE amortizes
    # away 16x of the denoiser's spatial area)
    "latent256": Preset("latent256", "synthetic_hard", 256, 3, 768, (), (),
                        0, 12, batch_size=32, backbone="dit", patch_size=4,
                        depth=12, process="flow", latent_downs=2,
                        latent_channels=4, ae_base_dim=128, ae_steps=6000),
    # conditional production stack (VERDICT r4 item 2): cloud removal AT the
    # latent256 config — the cloudy view is first-stage-encoded and channel-
    # concatenated to the noisy latent (cond_type="concat" train+sample
    # semantics); chip capstone tools/capstone_latent256_cond.py
    "latent256-cr": Preset("latent256-cr", "synthetic_hard", 256, 3, 768,
                           (), (), 0, 12, cond_type="concat", batch_size=32,
                           backbone="dit", patch_size=4, depth=12,
                           process="flow", latent_downs=2, latent_channels=4,
                           ae_base_dim=128, ae_steps=6000),
    "tiny-latent-cr": Preset("tiny-latent-cr", "synthetic", 16, 3, 64,
                             (), (), 0, 4, cond_type="concat", timesteps=50,
                             batch_size=16, backbone="dit", patch_size=2,
                             depth=2, process="flow", latent_downs=2,
                             latent_channels=4, ae_base_dim=16, ae_steps=16),
    "tiny-latent-dit": Preset("tiny-latent-dit", "synthetic", 16, 3, 64,
                              (), (), 0, 4, timesteps=50, batch_size=16,
                              backbone="dit", patch_size=2, depth=2,
                              process="flow", latent_downs=2,
                              latent_channels=4, ae_base_dim=16,
                              ae_steps=16),
    # beyond-reference: rectified-flow training on the synthetic64 UNet
    # (samples in 8-32 Euler/Heun steps, no beta schedule)
    "flow64": Preset("flow64", "synthetic", 64, 3, 64, (1, 2, 3, 4), (4, 8), 1, 4,
                     batch_size=64, process="flow"),
    # class-conditional rectified flow on the hard fixture: the guided-
    # distillation teacher (cli/distill.py --method guided) — train with
    # CFG label dropout, sample with --guidance_scale, then distill the
    # guided ODE into a single-call student (arXiv:2210.03142)
    "cflow64": Preset("cflow64", "synthetic_hard", 64, 3, 64, (1, 2, 3, 4),
                      (4, 8), 1, 4, batch_size=64, process="flow",
                      num_classes=5, class_dropout=0.15),
    "tiny-cflow": Preset("tiny-cflow", "synthetic_hard", 8, 3, 32, (1, 2),
                         (), 1, 1, timesteps=50, batch_size=16,
                         process="flow", num_classes=5, class_dropout=0.15),
    # class-conditional DDPM sibling (guided distillation's eps-teacher)
    "cddpm64": Preset("cddpm64", "synthetic_hard", 64, 3, 64, (1, 2, 3, 4),
                      (4, 8), 1, 4, batch_size=64, num_classes=5,
                      class_dropout=0.15),
    "tiny-cddpm": Preset("tiny-cddpm", "synthetic_hard", 8, 3, 32, (1, 2),
                         (), 1, 1, timesteps=50, batch_size=16,
                         num_classes=5, class_dropout=0.15),
    # CI / CPU smoke configs for the two new axes
    "tiny-dit": Preset("tiny-dit", "synthetic", 16, 3, 64, (), (), 0, 4,
                       timesteps=50, batch_size=16,
                       backbone="dit", patch_size=4, depth=2),
    # depth-4 smoke: divisible by 2 stages x 2 virtual chunks, so the
    # interleaved 1F1B CLI path (--pp_micro/--pp_virtual) is drivable
    "tiny-dit4": Preset("tiny-dit4", "synthetic", 16, 3, 64, (), (), 0, 4,
                        timesteps=50, batch_size=16,
                        backbone="dit", patch_size=4, depth=4),
    # backbone x process composition smoke: DiT denoiser under the EDM
    # objective/sampler (both axes are preset fields; nothing special)
    "tiny-dit-edm": Preset("tiny-dit-edm", "synthetic", 16, 3, 64, (), (),
                           0, 4, batch_size=16, backbone="dit",
                           patch_size=4, depth=2, process="edm"),
    "tiny-flow": Preset("tiny-flow", "synthetic", 8, 3, 32, (1, 2), (), 1, 1,
                        batch_size=16, process="flow"),
    # beyond-reference: MeanFlow one-step generation (arXiv:2505.13447) —
    # trains the 1-4-call sampler FROM SCRATCH (no teacher/distillation;
    # contrast cli/distill.py's three teacher-based families). Same UNet as
    # flow64 so the 1-NFE capstones compare directly against reflow64.
    "meanflow64": Preset("meanflow64", "synthetic", 64, 3, 64, (1, 2, 3, 4),
                         (4, 8), 1, 4, batch_size=64, process="meanflow"),
    "tiny-meanflow": Preset("tiny-meanflow", "synthetic", 8, 3, 32, (1, 2),
                            (), 1, 1, batch_size=16, process="meanflow"),
    # CFG-integrated MeanFlow (paper §4): guidance baked into the learned
    # field at train time — 1-NFE class-guided samples from ONE call
    "cmeanflow64": Preset("cmeanflow64", "synthetic_hard", 64, 3, 64,
                          (1, 2, 3, 4), (4, 8), 1, 4, batch_size=64,
                          process="meanflow", num_classes=5,
                          mf_cfg_omega=2.0),
    "tiny-cmeanflow": Preset("tiny-cmeanflow", "synthetic_hard", 8, 3, 32,
                             (1, 2), (), 1, 1, batch_size=16,
                             process="meanflow", num_classes=5,
                             mf_cfg_omega=2.0),
    # backbone x process composition smoke: dual-time DiT under MeanFlow
    "tiny-dit-meanflow": Preset("tiny-dit-meanflow", "synthetic", 16, 3, 64,
                                (), (), 0, 4, batch_size=16, backbone="dit",
                                patch_size=4, depth=2, process="meanflow"),
    # beyond-reference: Mixture-of-Experts DiT — 8-expert top-1 routed FFN
    # in every second block (GLaM interleave); sparse capacity scaling with
    # near-constant per-token FLOPs. Expert-parallel via --ep.
    "moe-dit64": Preset("moe-dit64", "synthetic", 64, 3, 384, (), (), 0, 6,
                        batch_size=64, backbone="dit", patch_size=4,
                        depth=12, num_experts=8, moe_top_k=2),
    "tiny-moe": Preset("tiny-moe", "synthetic", 16, 3, 64, (), (), 0, 4,
                       timesteps=50, batch_size=16, backbone="dit",
                       patch_size=4, depth=2, num_experts=4),
    # super-resolution stages (SuperResModel capability as a recipe):
    # sr64-256 upsamples a 64px base 4x (cascade partner: synthetic64);
    # tiny-sr upsamples 2x from 8px (cascade partner: tiny)
    "sr64-256": Preset("sr64-256", "synthetic", 256, 3, 128, (1, 2, 3, 4),
                       (4, 8), 2, 8, cond_type="concat", batch_size=16,
                       sr_factor=4),
    "tiny-sr": Preset("tiny-sr", "synthetic", 16, 3, 32, (1, 2), (), 1, 1,
                      cond_type="concat", timesteps=50, batch_size=16,
                      sr_factor=2),
    # Brownian-bridge paired translation (BBDM, arXiv:2205.07680;
    # beyond-reference): sampling starts AT the cloudy source image and
    # walks the exact bridge posterior to the clear target — the direct
    # image-to-image formulation of the flagship cloud-removal use-case
    "bridge64": Preset("bridge64", "synthetic", 64, 3, 64, (1, 2, 3, 4),
                       (4, 8), 1, 4, cond_type="concat", batch_size=64,
                       process="bridge"),
    "tiny-bridge": Preset("tiny-bridge", "synthetic", 8, 3, 32, (1, 2), (),
                          1, 1, cond_type="concat", timesteps=50,
                          batch_size=16, process="bridge"),
    # latent rectified flow (FlowMatching inside LatentDiffusion): 16px
    # pixels -> 8x8x4 latents, ODE sampling in latent space
    "tiny-latent-flow": Preset("tiny-latent-flow", "synthetic", 16, 3, 32,
                               (1, 2), (), 1, 1, batch_size=16, process="flow",
                               latent_downs=1, latent_channels=4,
                               ae_base_dim=16, ae_steps=60),
    # latent Brownian bridge: the paired translation runs between ENCODED
    # endpoints (cloudy and clear latents) and decodes the result — the
    # BBDM-in-latent-space composition (the BBDM paper's LBBDM variant)
    "tiny-latent-bridge": Preset("tiny-latent-bridge", "synthetic", 16, 3, 32,
                                 (1, 2), (), 1, 1, cond_type="concat",
                                 timesteps=50, batch_size=16,
                                 process="bridge", latent_downs=1,
                                 latent_channels=4, ae_base_dim=16,
                                 ae_steps=60),
}


def get_preset(name: str) -> Preset:
    if name not in PRESETS:
        raise ValueError(f"unknown preset {name!r}; have {sorted(PRESETS)}")
    return dataclasses.replace(PRESETS[name])


def build_denoiser(model_cfg):
    """Instantiate the backbone for a config built by Preset.model_config."""
    from eo_diffusion_tpu.models.dit import DiT, DiTConfig
    from eo_diffusion_tpu.models.unet import UNet, UNetConfig
    from eo_diffusion_tpu.models.unet_spade import SpadeUNet, SpadeUNetConfig

    if isinstance(model_cfg, DiTConfig):
        return DiT(model_cfg)
    if isinstance(model_cfg, SpadeUNetConfig):
        return SpadeUNet(model_cfg)
    assert isinstance(model_cfg, UNetConfig), type(model_cfg)
    return UNet(model_cfg)


def build_process(preset: Preset, timesteps: int, image_size: int,
                  cond_type=None):
    """Diffusion/flow process for the preset (the model-facing grid is the
    latent grid for latent presets)."""
    size = preset.latent_size if preset.is_latent else image_size
    chans = preset.latent_channels if preset.is_latent else preset.in_channels
    if cond_type == "spade":
        # process-side the segmap is ordinary pass-through conditioning;
        # "spade" only changes how the CLIs build the cond tensor and
        # which backbone consumes it
        cond_type = "concat"
    if preset.process == "flow":
        from eo_diffusion_tpu.diffusion.flow import FlowMatching

        # cond_type="sum" is sampling-time-only masked inpainting (the model
        # stays unconditional) and maps onto FlowMatching.sample's mask/x0
        # path; "concat" conditions the model like the DDPM presets
        return FlowMatching.create(image_size=size, in_channels=chans,
                                   cond_type=cond_type)
    if preset.process == "meanflow":
        from eo_diffusion_tpu.diffusion.meanflow import MeanFlow

        # same conditioning semantics as flow: "sum" is sampling-time-only
        # masked inpainting (mask/x0 on .sample), "concat" feeds the model
        kw = {}
        if preset.mf_cfg_omega != 1.0:
            assert preset.num_classes > 0, (
                "mf_cfg_omega needs a class-conditional preset")
            kw = dict(cfg_omega=preset.mf_cfg_omega,
                      cfg_null_index=preset.num_classes)
        return MeanFlow.create(image_size=size, in_channels=chans,
                               cond_type=cond_type, **kw)
    if preset.process == "edm":
        from eo_diffusion_tpu.diffusion.edm import EDMProcess

        return EDMProcess.create(image_size=size, in_channels=chans,
                                 cond_type=cond_type)
    if preset.process == "bridge":
        from eo_diffusion_tpu.diffusion.bridge import BrownianBridge

        # the source image is the bridge endpoint AND (concat) model input
        assert cond_type == "concat", (
            f"bridge presets are paired translation: cond_type must be "
            f"'concat' (the source image), got {cond_type!r}")
        return BrownianBridge.create(image_size=size, in_channels=chans,
                                     timesteps=timesteps, cond_type=cond_type)
    assert preset.process == "ddpm", preset.process
    from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion

    return GaussianDiffusion.create(timesteps=timesteps, image_size=size,
                                    in_channels=chans, cond_type=cond_type,
                                    objective=preset.objective,
                                    zero_terminal_snr=preset.zero_terminal_snr)
