"""eo_diffusion_tpu: a TPU-native JAX diffusion framework for Earth-Observation imagery.

A ground-up re-design of the capabilities of furio1999/EO_Diffusion
(DDPM/DDIM training + sampling, RePaint-style masked conditioning for cloud
removal / inpainting / synthetic change-pair generation, EO data pipelines,
EMA, metrics) built TPU-first: Flax/NNX models in NHWC, `lax.scan`-compiled
sampling trajectories, `jax.sharding` data parallelism over device meshes, and
Pallas kernels for the hot ops.
"""

__version__ = "0.1.0"
