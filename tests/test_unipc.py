"""UniPC sampler (diffusion/unipc.py, arXiv:2302.04867).

Two load-bearing pins:

* **Faithfulness**: the one-scan JAX implementation reproduces an
  independent, loop-based numpy transcription of the official multistep
  UniPC (bh2, data prediction, warmup + lower_order_final) to float32
  tolerance on an analytically-known denoiser.
* **Accuracy**: against the fine-grid probability-flow solution, UniPC-3
  lands closer than both DDIM and DPM-Solver++(2M) at the method's design
  points (8 and 32 steps). NOTE the full-range cosine schedule spans ~13
  in lambda, a stiff regime where third-order exponential multistep error
  is NOT monotone in step count (the official implementation shows the
  same spikes, e.g. at S=10 — reproduced by the transcription here), so
  the ordering is pinned at specific step counts, not universally.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
from eo_diffusion_tpu.diffusion.unipc import continuous_time_tables

SIZE, CH = 8, 3
MU, S = 0.3, 0.5  # data ~ N(MU, S^2) iid per pixel


def make_diffusion(T=1000):
    return GaussianDiffusion.create(timesteps=T, image_size=SIZE,
                                    in_channels=CH)


def analytic_eps_model(d):
    """Exact eps-predictor for N(MU, S^2 I) data under d's schedule.

    Coefficients are linearly interpolated over the discrete table so the
    model is smooth in t — UniPC evaluates at fractional timesteps (its
    lambda-uniform continuous grid), like a trained network whose
    sinusoidal embedding is smooth in t."""
    tt = jnp.arange(d.schedule.timesteps, dtype=jnp.float32)
    a_tab = jnp.asarray(d.schedule.sqrt_alphas_cumprod)
    s_tab = jnp.asarray(d.schedule.sqrt_one_minus_alphas_cumprod)

    def model(x, t, c, y):
        t = t.astype(jnp.float32)
        a = jnp.interp(t, tt, a_tab)[:, None, None, None]
        sig = jnp.maximum(jnp.interp(t, tt, s_tab), 1e-8)[:, None, None, None]
        x0_hat = MU + (a * S**2 / (a**2 * S**2 + sig**2)) * (x - a * MU)
        return (x - a * x0_hat) / sig

    return model


def official_unipc_np(d, x, num_steps, order=3):
    """Direct loop transcription of the official multistep UniPC (bh2,
    data prediction, warmup + lower_order_final), float64 numpy."""
    _, al, sg, lam = (np.asarray(v, np.float64)
                      for v in continuous_time_tables(d.schedule, num_steps))

    def model(x, i):  # exact posterior x0-prediction at grid node i
        a, s = al[i], sg[i]
        return MU + (a * S**2 / (a**2 * S**2 + s**2)) * (x - a * MU)

    m_list, idx_list = [model(x, 0)], [0]
    for step in range(1, num_steps + 1):
        cur, nxt = idx_list[-1], step
        p = min(order, len(m_list), num_steps + 1 - step)
        h = lam[nxt] - lam[cur]
        hh = -h
        B_h = np.expm1(hh)
        h_phi_1 = np.expm1(hh)
        rks, D1s = [], []
        for k in range(1, p):
            pi = idx_list[-(k + 1)]
            rk = (lam[pi] - lam[cur]) / h
            rks.append(rk)
            D1s.append((m_list[-(k + 1)] - m_list[-1]) / rk)
        rks.append(1.0)
        rks = np.array(rks)
        R, b = [], []
        h_phi_k = h_phi_1 / hh - 1
        fact = 1
        for k in range(1, p + 1):
            R.append(rks ** (k - 1))
            b.append(h_phi_k * fact / B_h)
            fact *= k + 1
            h_phi_k = h_phi_k / hh - 1 / fact
        R, b = np.array(R), np.array(b)
        if p > 1:
            rhos_p = (np.array([0.5]) if p == 2
                      else np.linalg.solve(R[:-1, :-1], b[:-1]))
            pred_res = sum(r * dd for r, dd in zip(rhos_p, D1s))
        else:
            pred_res = 0.0
        x_t_ = (sg[nxt] / sg[cur]) * x - al[nxt] * h_phi_1 * m_list[-1]
        x_pred = x_t_ - al[nxt] * B_h * pred_res
        m_t = model(x_pred, nxt)
        rhos_c = np.array([0.5]) if p == 1 else np.linalg.solve(R, b)
        corr = (sum(r * dd for r, dd in zip(rhos_c[:-1], D1s))
                if p > 1 else 0.0)
        x = x_t_ - al[nxt] * B_h * (corr + rhos_c[-1] * (m_t - m_list[-1]))
        m_list.append(m_t)
        idx_list.append(nxt)
        if len(m_list) > order:
            m_list.pop(0)
            idx_list.pop(0)
    return x


class TestFaithfulness:
    @pytest.mark.parametrize("steps", [4, 8, 16])
    def test_matches_official_transcription(self, steps):
        d = make_diffusion()
        model = analytic_eps_model(d)
        x_T = jax.random.normal(jax.random.PRNGKey(9), (4, SIZE, SIZE, CH),
                                jnp.float32)
        mine = np.asarray(d.unipc_sample(model, jax.random.PRNGKey(0), 4,
                                         num_steps=steps, x_T=x_T,
                                         clip=False).x)
        ref = official_unipc_np(d, np.asarray(x_T, np.float64), steps)
        # f32 vs f64 through a stiff trajectory (per-step amplification
        # ~e^h with h up to 3.4 at S=4): measured max |diff| 0.007
        np.testing.assert_allclose(mine, ref, atol=2e-2)
        assert np.sqrt(np.mean((mine - ref) ** 2)) < 1e-2


class TestAccuracy:
    def test_beats_ddim_and_dpm_at_design_points(self):
        d = make_diffusion()
        model = analytic_eps_model(d)
        rng = jax.random.PRNGKey(0)
        x_T = jax.random.normal(jax.random.fold_in(rng, 9),
                                (4, SIZE, SIZE, CH), jnp.float32)
        truth = np.asarray(d.ddim_sample(
            model, rng, 4, num_steps=1000, eta=0.0, x_T=x_T, clip=False).x)

        def err(out):
            return float(np.sqrt(np.mean((np.asarray(out.x) - truth) ** 2)))

        for s in (8, 32):
            e_ddim = err(d.ddim_sample(model, rng, 4, num_steps=s, eta=0.0,
                                       x_T=x_T, clip=False))
            e_dpm = err(d.dpm_sample(model, rng, 4, num_steps=s, x_T=x_T,
                                     clip=False))
            e_upc = err(d.unipc_sample(model, rng, 4, num_steps=s, x_T=x_T,
                                       clip=False))
            assert e_upc < e_dpm < e_ddim, (s, e_upc, e_dpm, e_ddim)
        assert e_upc < 0.01, e_upc  # S=32: actually accurate


class TestPlumbing:
    def test_cfg_batch_doubling_and_interval(self):
        d = make_diffusion(T=100)
        calls = []

        def spy(x, t, c, y):
            calls.append(x.shape[0])
            return 0.1 * x + (0.2 * c if c is not None else 0.0)

        cond = jnp.ones((2, SIZE, SIZE, CH))
        out = d.unipc_sample(spy, jax.random.PRNGKey(0), 2, num_steps=4,
                             cond=cond, uncond=jnp.zeros_like(cond),
                             guidance_scale=3.0, guidance_rescale=0.5,
                             guidance_interval=(0.1, 0.9))
        assert calls[0] == 4  # doubled
        assert np.isfinite(np.asarray(out.x)).all()

    def test_repaint_mask_keeps_known_region(self):
        d = make_diffusion(T=100)
        model = analytic_eps_model(d)
        x0 = jnp.full((1, SIZE, SIZE, CH), 0.5)
        mask = jnp.zeros((1, SIZE, SIZE, 1)).at[:, :4].set(1.0)
        out = np.asarray(d.unipc_sample(
            model, jax.random.PRNGKey(2), 1, num_steps=6, mask=mask,
            x0=x0).x)
        np.testing.assert_allclose(out[:, :4], 0.5, atol=1e-6)
        assert np.isfinite(out).all()

    def test_stateful_model_state_threads(self):
        d = make_diffusion(T=100)

        def stateful(x, t, c, y, st, i):
            return jnp.zeros_like(x), st + 1

        out = d.unipc_sample(stateful, jax.random.PRNGKey(3), 1, num_steps=5,
                             model_state=jnp.zeros(()))
        assert np.isfinite(np.asarray(out.x)).all()

    def test_v_objective_conversion(self):
        d = GaussianDiffusion.create(timesteps=200, image_size=SIZE,
                                     in_channels=CH, objective="v")
        out = d.unipc_sample(lambda x, t, c, y: 0.1 * x,
                             jax.random.PRNGKey(4), 2, num_steps=5)
        assert np.isfinite(np.asarray(out.x)).all()
