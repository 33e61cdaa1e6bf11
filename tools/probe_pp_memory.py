"""Peak-memory comparison: GPipe-by-autodiff vs the 1F1B schedule.

The 1F1B engine's design claim (parallel/pipeline_train.py) is that
in-flight activation state is O(S) — a 2S-1-slot stage-input ring buffer —
while differentiating through the GPipe forward keeps every microbatch's
block residuals live between the sweeps, i.e. O(M). This probe turns the
claim into numbers with XLA's own accounting: both programs are lowered on
the virtual 8-device CPU mesh and ``compiled.memory_analysis()`` reports
the per-program temp allocation as the microbatch count M grows at fixed
per-microbatch size.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     PYTHONPATH=/root/repo python tools/probe_pp_memory.py
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from eo_diffusion_tpu.models.dit import DiT, DiTConfig
from eo_diffusion_tpu.parallel.pipeline import pp_dit_apply
from eo_diffusion_tpu.parallel.pipeline_train import pp_dit_grads

S = 4
MB = 2  # per-microbatch rows (fixed); batch = MB * M


def main():
    assert len(jax.devices()) >= S, (
        f"need {S} devices (run with xla_force_host_platform_device_count)")
    mesh = Mesh(np.array(jax.devices()[:S]).reshape(S), ("stage",))
    cfg = DiTConfig(image_size=32, in_channels=3, out_channels=3,
                    patch_size=4, hidden_size=128, depth=8, num_heads=4)
    model = DiT(cfg)
    x1 = jnp.zeros((1, 32, 32, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x1,
                                 jnp.zeros((1,), jnp.int32))

    print(f"DiT depth={cfg.depth} hidden={cfg.hidden_size} tokens="
          f"{(32 // cfg.patch_size) ** 2}, {S}-stage mesh, mb={MB} rows")
    print(f"{'M':>4} {'gpipe-grad temp MB':>20} {'1f1b temp MB':>14}")
    rows = []
    for M in (4, 8, 16, 32):
        b = MB * M
        x = jnp.zeros((b, 32, 32, 3))
        t = jnp.zeros((b,), jnp.int32)
        target = jnp.zeros_like(x)

        def gpipe_loss(p):
            out = pp_dit_apply(model, p, x, t, mesh, axis="stage", n_micro=M)
            return jnp.mean((out.astype(jnp.float32) - target) ** 2)

        g_c = jax.jit(jax.grad(gpipe_loss)).lower(params).compile()
        f_c = jax.jit(lambda p: pp_dit_grads(
            model, p, x, t, target, mesh, axis="stage", n_micro=M)
        ).lower(params).compile()

        g_mb = g_c.memory_analysis().temp_size_in_bytes / 1e6
        f_mb = f_c.memory_analysis().temp_size_in_bytes / 1e6
        rows.append((M, g_mb, f_mb))
        print(f"{M:>4} {g_mb:>20.1f} {f_mb:>14.1f}")

    # growth from the smallest to the largest M at fixed mb: GPipe's temps
    # scale ~linearly with M (all residuals resident), 1F1B's activation
    # state is M-independent (only the M-proportional IO/grad buffers grow)
    g_growth = rows[-1][1] / rows[0][1]
    f_growth = rows[-1][2] / rows[0][2]
    print(f"\ntemp growth M={rows[0][0]}->{rows[-1][0]}: "
          f"gpipe-grad x{g_growth:.1f}, 1f1b x{f_growth:.1f}")


if __name__ == "__main__":
    main()
