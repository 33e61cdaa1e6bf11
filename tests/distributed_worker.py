"""Worker process for the real multi-process `jax.distributed` test.

Launched by tests/test_distributed.py as N separate OS processes (CPU backend,
`--xla_force_host_platform_device_count` local devices each, localhost
coordinator). Each worker:

1. calls ``parallel.distributed.initialize`` (the code path SURVEY §2.3's
   communication-backend row commits to -- a real ``jax.distributed``
   rendezvous, not the single-process no-op branch),
2. builds the REAL Trainer on the global mesh,
3. contributes its local shard of a deterministic global batch via
   ``global_batch_from_local``,
4. runs one DP-sharded train step and writes the loss to ``--out``.

The parent test asserts every process saw the same loss, and that the loss
equals a single-process run on the same global batch (proving the sharded
multi-process step computes the same math).
"""

import argparse
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num_processes", type=int, default=1)
    ap.add_argument("--process_id", type=int, default=0)
    ap.add_argument("--out", required=True)
    ap.add_argument("--mode", choices=["dp", "tp_fsdp"], default="dp",
                    help="dp: pure data-parallel (mesh data=N); tp_fsdp: "
                         "('data'=2,'model'=4) mesh with TP attention + "
                         "FSDP param sharding through the real Trainer "
                         "(VERDICT r4 item 6)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from eo_diffusion_tpu.parallel.distributed import (
        global_batch_from_local,
        initialize,
        process_shard,
    )

    info = initialize(args.coordinator, args.num_processes, args.process_id)
    assert info["process_count"] == args.num_processes, info

    from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
    from eo_diffusion_tpu.models.unet import UNet, UNetConfig
    from eo_diffusion_tpu.train.trainer import Trainer, TrainerConfig

    SIZE, GB = 8, 8  # global batch of 8 rows
    if args.mode == "tp_fsdp":
        from eo_diffusion_tpu.parallel.mesh import make_mesh

        # ('data'=2, 'model'=4) composed mesh: the data axis spans the two
        # OS processes (jax.devices() lists process 0's devices first, and
        # make_mesh reshapes row-major), the model axis stays intra-process
        tcfg = TrainerConfig(lr=1e-3, batch_size=GB, epochs=1, timesteps=20,
                             seed=0, fsdp=True, tp=True)
        ucfg = UNetConfig(image_size=SIZE, in_channels=3, model_channels=16,
                          out_channels=3, num_res_blocks=1,
                          attention_resolutions=(2,), channel_mult=(1, 2),
                          num_heads=4, dtype=jnp.float32)
        mesh = make_mesh(model=4)
    else:
        tcfg = TrainerConfig(lr=1e-3, batch_size=GB, epochs=1, timesteps=20,
                             seed=0)
        ucfg = UNetConfig(image_size=SIZE, in_channels=3, model_channels=16,
                          out_channels=3, num_res_blocks=1,
                          attention_resolutions=(), channel_mult=(1, 2),
                          num_heads=1, dtype=jnp.float32)
        mesh = None
    unet = UNet(ucfg)
    diff = GaussianDiffusion.create(timesteps=20, image_size=SIZE, in_channels=3)
    trainer = Trainer(tcfg, unet, diff, steps_per_epoch=4, mesh=mesh)

    # deterministic global batch; every process derives the same array and
    # keeps only its own rows
    rng = np.random.default_rng(0)
    images = rng.normal(size=(GB, SIZE, SIZE, 3)).astype(np.float32)
    shard_id, n_shards = process_shard()
    rows = GB // n_shards
    local = images[shard_id * rows : (shard_id + 1) * rows]

    state = trainer.init(jax.random.PRNGKey(0), {"image": images[:1]})
    batch = global_batch_from_local({"image": local}, trainer.mesh)
    state, metrics = trainer.step(state, batch)
    loss = float(metrics["loss"])

    with open(args.out, "w") as f:
        json.dump({"loss": loss, **info}, f)
    print(f"worker {args.process_id}: loss {loss}", flush=True)


if __name__ == "__main__":
    main()
