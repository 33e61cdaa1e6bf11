"""End-to-end numerical parity against the reference implementation.

These tests import the actual reference repo (read-only, mounted at
/root/reference) and compare converted-weight forward passes and whole
deterministic DDIM trajectories. They are skipped automatically when the
reference (or torch) is unavailable.

Measured parity: single forward rel-err < 1e-6; 25-step DDIM trajectory
rel-err ~4e-5 (float32 accumulation only).
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)
torch = pytest.importorskip("torch")


def _stub_torchvision():
    """The reference imports torchvision (absent here) for save_image paths
    we never execute -- stub just enough to import."""
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    utils = types.ModuleType("torchvision.utils")
    utils.save_image = lambda *a, **k: None
    transforms = types.ModuleType("torchvision.transforms")
    functional = types.ModuleType("torchvision.transforms.functional")
    functional.adjust_brightness = lambda x, f: x
    transforms.functional = functional
    tv.utils, tv.transforms = utils, transforms
    for name, mod in (
        ("torchvision", tv), ("torchvision.utils", utils),
        ("torchvision.transforms", transforms),
        ("torchvision.transforms.functional", functional),
    ):
        sys.modules[name] = mod


@pytest.fixture(scope="module")
def reference():
    _stub_torchvision()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from backbones.unet_openai import UNetModel  # noqa: E402
    from diffusion.ddim import DDIMSampler  # noqa: E402
    from diffusion.model import EODiffusion  # noqa: E402

    # the reference hard-moves buffers to cuda (ddim.py:18-22); run on CPU
    DDIMSampler.register_buffer = lambda self, name, attr: setattr(self, name, attr)
    return UNetModel, EODiffusion, DDIMSampler


def _torch_unet(reference, **kw):
    UNetModel, _, _ = reference
    torch.manual_seed(0)
    tm = UNetModel(**kw).eval()
    with torch.no_grad():
        for p in tm.parameters():
            p.copy_(torch.randn_like(p) * 0.03)
    return tm


class TestForwardParity:
    def test_unet_forward_bit_parity(self, reference):
        import jax
        import jax.numpy as jnp

        from eo_diffusion_tpu.models.unet import UNet, UNetConfig
        from eo_diffusion_tpu.tools.convert_ckpt import convert_state_dict, fix_legacy_dict

        kw = dict(image_size=16, in_channels=3, model_channels=32, out_channels=3,
                  channel_mult=(1, 2), attention_resolutions=(2,), num_res_blocks=1,
                  num_heads=4)
        tm = _torch_unet(reference, **kw)
        params = convert_state_dict(fix_legacy_dict(tm.state_dict()), UNetConfig(**kw))
        jm = UNet(UNetConfig(**kw))

        x = np.random.default_rng(0).normal(size=(2, 16, 16, 3)).astype(np.float32)
        t = np.asarray([3, 77])
        with torch.no_grad():
            ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(t))
        ref = ref.numpy().transpose(0, 2, 3, 1)
        ours = np.asarray(jm.apply(params, jnp.asarray(x), jnp.asarray(t)))
        rel = np.abs(ref - ours).max() / (np.abs(ref).max() + 1e-12)
        assert rel < 1e-5, rel


class TestTrajectoryParity:
    def test_ddim_trajectory(self, reference):
        import jax
        import jax.numpy as jnp

        from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
        from eo_diffusion_tpu.models.unet import UNet, UNetConfig
        from eo_diffusion_tpu.tools.convert_ckpt import convert_state_dict, fix_legacy_dict

        _, EODiffusion, DDIMSampler = reference
        T, S, SZ = 100, 25, 16
        kw = dict(image_size=SZ, in_channels=3, model_channels=32, out_channels=3,
                  channel_mult=(1, 2), attention_resolutions=(2,), num_res_blocks=1,
                  num_heads=4)
        tm = _torch_unet(reference, **kw)
        ediff = EODiffusion(tm, image_size=SZ, in_channels=3, timesteps=T, device="cpu")
        sampler = DDIMSampler(ediff)

        x_T = np.random.default_rng(0).normal(size=(2, 3, SZ, SZ)).astype(np.float32)
        with torch.no_grad():
            ref, _ = sampler.sample(S=S, batch_size=2, shape=(3, SZ, SZ), eta=0.0,
                                    x_T=torch.from_numpy(x_T), verbose=False)
        ref = ref.numpy().transpose(0, 2, 3, 1)

        params = convert_state_dict(fix_legacy_dict(tm.state_dict()), UNetConfig(**kw))
        jm = UNet(UNetConfig(**kw))
        jd = GaussianDiffusion.create(timesteps=T, image_size=SZ, in_channels=3)
        mf = lambda x, t, c, y: jm.apply(params, x, t, cond=c, y=y)
        ours = np.asarray(
            jd.ddim_sample(mf, jax.random.PRNGKey(0), 2, num_steps=S,
                           x_T=jnp.asarray(x_T.transpose(0, 2, 3, 1))).x
        )
        rel = np.abs(ref - ours).max() / (np.abs(ref).max() + 1e-12)
        assert rel < 1e-3, rel


class TestCloudsFamilyParity:
    def test_clouds_like_config_forward(self, reference):
        """Parity on the published-checkpoint architecture family (heads=8,
        attention at ds 4/8, 2 res blocks) at reduced width."""
        import jax
        import jax.numpy as jnp

        from eo_diffusion_tpu.models.unet import UNet, UNetConfig
        from eo_diffusion_tpu.tools.convert_ckpt import convert_state_dict, fix_legacy_dict

        kw = dict(image_size=32, in_channels=3, model_channels=64, out_channels=3,
                  channel_mult=(1, 2, 3, 4), attention_resolutions=(4, 8),
                  num_res_blocks=2, num_heads=8)
        tm = _torch_unet(reference, **kw)
        params = convert_state_dict(fix_legacy_dict(tm.state_dict()), UNetConfig(**kw))
        jm = UNet(UNetConfig(**kw))
        x = np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32)
        t = np.asarray([10, 990])
        with torch.no_grad():
            ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(t))
        ref = ref.numpy().transpose(0, 2, 3, 1)
        ours = np.asarray(jm.apply(params, jnp.asarray(x), jnp.asarray(t)))
        rel = np.abs(ref - ours).max() / (np.abs(ref).max() + 1e-12)
        assert rel < 1e-5, rel
