"""eo_diffusion_tpu: a TPU-native JAX diffusion framework for Earth-Observation imagery.

A ground-up re-design of the capabilities of furio1999/EO_Diffusion
(DDPM/DDIM training + sampling, RePaint-style masked conditioning for cloud
removal / inpainting / synthetic change-pair generation, EO data pipelines,
EMA, metrics) built TPU-first: Flax models in NHWC, `lax.scan`-compiled
sampling trajectories, `jax.sharding` data parallelism over device meshes,
Pallas kernels for the hot ops, and a native C++ host input path.

Public API (lazily imported to keep `import eo_diffusion_tpu` light):

    from eo_diffusion_tpu import GaussianDiffusion, UNet, unet_clouds, Trainer
"""

__version__ = "0.1.0"

_EXPORTS = {
    "GaussianDiffusion": "eo_diffusion_tpu.diffusion.gaussian",
    "DiffusionOutput": "eo_diffusion_tpu.diffusion.gaussian",
    "dpm_solver_sample": "eo_diffusion_tpu.diffusion.dpm_solver",
    "tiled_ddim_sample": "eo_diffusion_tpu.diffusion.tiled",
    "classifier_guided": "eo_diffusion_tpu.diffusion.classifier_guidance",
    "UNet": "eo_diffusion_tpu.models.unet",
    "UNetConfig": "eo_diffusion_tpu.models.unet",
    "unet_clouds": "eo_diffusion_tpu.models.unet",
    "unet_eo_train": "eo_diffusion_tpu.models.unet",
    "Trainer": "eo_diffusion_tpu.train.trainer",
    "TrainerConfig": "eo_diffusion_tpu.train.trainer",
    "TrainState": "eo_diffusion_tpu.train.trainer",
    "make_mesh": "eo_diffusion_tpu.parallel.mesh",
    "DataLoader": "eo_diffusion_tpu.data.loader",
}


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        module = importlib.import_module(_EXPORTS[name])
        return getattr(module, name)
    raise AttributeError(f"module 'eo_diffusion_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_EXPORTS))
