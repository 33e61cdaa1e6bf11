"""Headline benchmark: DDIM-50 sampling throughput at 256x256 on one TPU chip.

Metric (BASELINE.md / BASELINE.json north star): sampled images/sec/chip for
the flagship clouds-config UNet (reference configs/Configs.txt:20-23 -- 88M
params, base 128, mults [1,2,3,4], attention at ds 4/8) running the full
50-step DDIM reverse trajectory as a single jitted ``lax.scan``, bf16
activations.

``vs_baseline`` compares against an estimated reference throughput on its own
hardware (README.md:44-50: Quadro RTX 4000-class GPU, PyTorch 1.13): the
reference publishes no throughput numbers (SURVEY.md §6), so we estimate
dense-fp16 tensor peak ~28 TFLOPs at a generous 20% MFU for the eager
per-step torch loop => ~5.6 TF/s effective. One 256x256 DDIM-50 sample costs
50 * ~1.1 TFLOPs => ~9.8s/image => ~0.102 img/s. (The driver's north star is
5x that on a v5e-8 pod slice == 0.064 img/s/chip.)

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus
self-grounded hardware-efficiency fields ("achieved_tf_s", "mfu_vs_peak"):
progress is measured against the chip (v5e bf16 peak ~197 TF/s), not only
against the estimated reference number.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

# persistent compile cache: cold 256^2 scan compiles take minutes on the
# remote-compile path; cached reruns start in seconds
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

RTX4000_EST_IMG_PER_SEC = 0.102  # see module docstring


def _attention_core_flops(cfg, batch: int) -> float:
    """Analytic FLOPs of the QK^T + PV matmuls per forward (the Pallas
    kernel reports 0 to XLA cost analysis): 4*T^2*C flops per attention
    block per sample. The qkv/proj_out Dense layers are XLA ops and already
    counted."""
    from eo_diffusion_tpu.models.unet import build_unet_plan

    plan = build_unet_plan(cfg)
    total = 0.0
    size = cfg.image_size

    def walk(blocks):
        nonlocal total, size
        for block in blocks:
            for spec in block:
                if spec.kind == "attn":
                    t = size * size
                    total += 4.0 * t * t * spec.out_ch
                elif spec.kind == "down" or (spec.kind == "res" and spec.down):
                    size //= 2
                elif spec.kind == "up" or (spec.kind == "res" and spec.up):
                    size *= 2

    walk(plan.input_blocks)
    walk([plan.middle_block])
    walk(plan.output_blocks)
    return total * batch

IMAGE_SIZE = 256
BATCH = 8
DDIM_STEPS = 50
WARMUP = 1
ITERS = 3


def main():
    from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
    from eo_diffusion_tpu.models.unet import UNet, unet_clouds

    cfg = unet_clouds(IMAGE_SIZE, dtype=jnp.bfloat16)
    model = UNet(cfg)
    diffusion = GaussianDiffusion.create(
        timesteps=1000, image_size=IMAGE_SIZE, in_channels=3
    )

    x0 = jnp.zeros((1, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.int32))

    def sample(params, rng):
        model_fn = lambda x, t, c, y: model.apply(params, x, t, cond=c, y=y)
        out = diffusion.ddim_sample(
            model_fn, rng, BATCH, num_steps=DDIM_STEPS, dtype=jnp.bfloat16
        )
        # scalar fetch forces full device execution (axon's block_until_ready
        # does not reliably block through the tunnel)
        return jnp.float32(jnp.sum(out.x))

    f = jax.jit(sample)
    for _ in range(WARMUP):
        float(f(params, jax.random.PRNGKey(0)))

    t0 = time.time()
    for i in range(ITERS):
        float(f(params, jax.random.PRNGKey(i)))
    dt = (time.time() - t0) / ITERS

    img_per_sec = BATCH / dt

    # self-grounded efficiency: XLA cost-analysis FLOPs of ONE denoiser
    # forward (the scan body -- cost analysis counts while-loops once) plus
    # the analytic FLOPs of the Pallas attention cores (custom calls report
    # 0 to cost analysis), times the step count, over measured wall time.
    from eo_diffusion_tpu.utils.profiling import flops_of

    V5E_PEAK_TF = 197.0
    try:
        xb = jnp.zeros((BATCH, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.bfloat16)
        tb = jnp.zeros((BATCH,), jnp.int32)
        per_step_tf = (
            flops_of(lambda p, x, t: model.apply(p, x, t), params, xb, tb)
            + _attention_core_flops(cfg, BATCH)
        ) / 1e12
        achieved = per_step_tf * DDIM_STEPS / dt
        mfu = achieved / V5E_PEAK_TF
    except Exception:
        achieved, mfu = None, None

    # rider: DeepCache k=3 throughput on the same computation budget metric
    # (deep branch recomputed every 3rd step; quality audit on a trained
    # model in gallery/capstone_r2_metrics.json -- the primary value above
    # stays the exact full DDIM-50 computation)
    try:
        from eo_diffusion_tpu.diffusion.deepcache import deepcache_model_fn

        fn_dc, st0 = deepcache_model_fn(
            model, params, jnp.zeros((BATCH, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.bfloat16),
            refresh_every=3,
        )

        def sample_dc(rng):
            out = diffusion.ddim_sample(
                fn_dc, rng, BATCH, num_steps=DDIM_STEPS, dtype=jnp.bfloat16,
                model_state=st0,
            )
            return jnp.float32(jnp.sum(out.x))

        fdc = jax.jit(sample_dc)
        float(fdc(jax.random.PRNGKey(0)))
        t0 = time.time()
        for i in range(ITERS):
            float(fdc(jax.random.PRNGKey(i)))
        dc_img_s = BATCH / ((time.time() - t0) / ITERS)
    except Exception:
        dc_img_s = None

    # rider: the beyond-reference DiT-B/8 family at the same 256px DDIM-50
    # protocol (tools/probe_dit_tpu.py has the full fwd/bwd numbers) -- the
    # primary value stays the reference-parity clouds UNet
    dit_img_s = flow_img_s = None
    try:
        from eo_diffusion_tpu.models.dit import DiT, dit_b

        dcfg = dit_b(IMAGE_SIZE, dtype=jnp.bfloat16)
        dmodel = DiT(dcfg)
        dparams = jax.jit(dmodel.init)(
            jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.int32))

        def sample_dit(dparams, rng):
            fn = lambda x, t, c, y: dmodel.apply(dparams, x, t, cond=c, y=y)
            out = diffusion.ddim_sample(fn, rng, BATCH, num_steps=DDIM_STEPS,
                                        dtype=jnp.bfloat16)
            return jnp.float32(jnp.sum(out.x))

        fdit = jax.jit(sample_dit)
        float(fdit(dparams, jax.random.PRNGKey(0)))
        t0 = time.time()
        for i in range(ITERS):
            float(fdit(dparams, jax.random.PRNGKey(i)))
        dit_img_s = BATCH / ((time.time() - t0) / ITERS)

        # modern-stack rider: the same DiT under rectified flow, Heun-8
        # (15 model calls; trained-quality grounding in
        # gallery/dit256_metrics.json — Heun-8 KID 0.0003 at this exact
        # resolution/model)
        from eo_diffusion_tpu.diffusion.flow import FlowMatching

        fm = FlowMatching.create(image_size=IMAGE_SIZE, in_channels=3)

        def sample_flow(dparams, rng):
            fn = lambda x, t, c, y: dmodel.apply(dparams, x, t, cond=c, y=y)
            out = fm.sample(fn, rng, BATCH, num_steps=8, method="heun",
                            dtype=jnp.bfloat16)
            return jnp.float32(jnp.sum(out.x))

        fflow = jax.jit(sample_flow)
        float(fflow(dparams, jax.random.PRNGKey(0)))
        t0 = time.time()
        for i in range(ITERS):
            float(fflow(dparams, jax.random.PRNGKey(i)))
        flow_img_s = BATCH / ((time.time() - t0) / ITERS)
    except Exception:
        pass

    # rider: the same DiT flow sampler with W8A8 int8 compute
    # (nn/primitives.int8_dense_compute — VERDICT r4 item 4; quality audit
    # in gallery/w8a8_rider.json on the trained latent256 model)
    w8a8_img_s = None
    try:
        from eo_diffusion_tpu.nn.primitives import int8_dense_compute

        with int8_dense_compute():
            f8 = jax.jit(sample_flow)
            f8.lower(dparams, jax.random.PRNGKey(0)).compile()
        float(f8(dparams, jax.random.PRNGKey(0)))
        t0 = time.time()
        for i in range(ITERS):
            float(f8(dparams, jax.random.PRNGKey(i)))
        w8a8_img_s = BATCH / ((time.time() - t0) / ITERS)
    except Exception:
        pass

    # rider: the latent256 production LDM config (f4 decode + DiT-B/4 flow
    # on the 64px latent grid — 256 tokens/call vs the pixel DiT's 1024;
    # trained-quality grounding in gallery/latent256_metrics.json)
    latent_img_s = latent1_img_s = None
    try:
        from eo_diffusion_tpu.models.autoencoder import (AutoencoderConfig,
                                                         ConvAutoencoder)

        lat, zc = IMAGE_SIZE // 4, 4
        ae = ConvAutoencoder(AutoencoderConfig(
            in_channels=3, latent_channels=zc, base_channels=128, num_down=2))
        ae_params = jax.jit(ae.init)(jax.random.PRNGKey(1),
                                     jnp.zeros((1, IMAGE_SIZE, IMAGE_SIZE, 3)))
        ldcfg = dit_b(lat, dtype=jnp.bfloat16)
        import dataclasses as _dc2

        ldcfg = _dc2.replace(ldcfg, in_channels=zc, out_channels=zc,
                             patch_size=4)
        lmodel = DiT(ldcfg)
        lparams = jax.jit(lmodel.init)(
            jax.random.PRNGKey(2), jnp.zeros((1, lat, lat, zc)),
            jnp.zeros((1,), jnp.int32))
        lfm = FlowMatching.create(image_size=lat, in_channels=zc)

        def sample_latent(lp, ap, rng):
            fn = lambda x, t, c, y: lmodel.apply(lp, x, t, cond=c, y=y)
            z = lfm.sample(fn, rng, BATCH, num_steps=8, method="heun",
                           dtype=jnp.bfloat16).x
            return jnp.float32(jnp.sum(ae.apply(ap, z, method="decode")))

        flat = jax.jit(sample_latent)
        float(flat(lparams, ae_params, jax.random.PRNGKey(0)))
        t0 = time.time()
        for i in range(ITERS):
            float(flat(lparams, ae_params, jax.random.PRNGKey(i)))
        latent_img_s = BATCH / ((time.time() - t0) / ITERS)

        # rider: the 1-NFE ReFlow-distilled corner of the same stack (one
        # euler call + f4 decode — trained-quality grounding in
        # gallery/latent256_distill_metrics.json, tools/capstone_latent_distill.py)
        def sample_latent1(lp, ap, rng):
            fn = lambda x, t, c, y: lmodel.apply(lp, x, t, cond=c, y=y)
            z = lfm.sample(fn, rng, BATCH, num_steps=1, method="euler",
                           dtype=jnp.bfloat16).x
            return jnp.float32(jnp.sum(ae.apply(ap, z, method="decode")))

        flat1 = jax.jit(sample_latent1)
        float(flat1(lparams, ae_params, jax.random.PRNGKey(0)))
        t0 = time.time()
        for i in range(ITERS):
            float(flat1(lparams, ae_params, jax.random.PRNGKey(i)))
        latent1_img_s = BATCH / ((time.time() - t0) / ITERS)
    except Exception:
        pass

    # rider: ToMe token merging on the same DiT protocol (ops/tome.py,
    # arXiv:2303.17604) — parameter-free, so the SAME dparams apply; ratio
    # 0.375 takes the 1024-token grid to 640 (5x128 lanes) in every block's
    # attention + MLP (quality audit: tests/test_tome.py closeness bound,
    # paperwise ~negligible FID delta at these ratios)
    tome_img_s = None
    try:
        import dataclasses as _dc

        tmodel = DiT(_dc.replace(dcfg, tome_ratio=0.375, tome_mlp=True))

        def sample_tome(dparams, rng):
            fn = lambda x, t, c, y: tmodel.apply(dparams, x, t, cond=c, y=y)
            out = diffusion.ddim_sample(fn, rng, BATCH, num_steps=DDIM_STEPS,
                                        dtype=jnp.bfloat16)
            return jnp.float32(jnp.sum(out.x))

        ftome = jax.jit(sample_tome)
        float(ftome(dparams, jax.random.PRNGKey(0)))
        t0 = time.time()
        for i in range(ITERS):
            float(ftome(dparams, jax.random.PRNGKey(i)))
        tome_img_s = BATCH / ((time.time() - t0) / ITERS)
    except Exception:
        pass

    print(
        json.dumps(
            {
                "metric": f"sampled images/sec/chip (256x256, DDIM-{DDIM_STEPS}, clouds UNet bf16)",
                "value": round(img_per_sec, 4),
                "unit": "img/s/chip",
                "vs_baseline": round(img_per_sec / RTX4000_EST_IMG_PER_SEC, 2),
                "achieved_tf_s": None if achieved is None else round(achieved, 1),
                "mfu_vs_peak": None if mfu is None else round(mfu, 3),
                "deepcache_k3_img_s": None if dc_img_s is None else round(dc_img_s, 3),
                "dit_b8_img_s": None if dit_img_s is None else round(dit_img_s, 3),
                "dit_flow_heun8_img_s": None if flow_img_s is None else round(flow_img_s, 3),
                "dit_flow_heun8_w8a8_img_s": None if w8a8_img_s is None else round(w8a8_img_s, 3),
                "latent256_heun8_img_s": None if latent_img_s is None else round(latent_img_s, 3),
                "latent256_euler1_img_s": None if latent1_img_s is None else round(latent1_img_s, 3),
                "dit_tome375_img_s": None if tome_img_s is None else round(tome_img_s, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
