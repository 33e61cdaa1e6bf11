"""SDEdit tests (diffusion/edit.py — beyond-reference editing capability).

Validates the truncated-chain algebra in closed form (zero-eps denoiser
telescopes the DDIM tail analytically), strength monotonicity, start_index
parity with the full chain, the flow-path variant, and the latent wrapper.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eo_diffusion_tpu.core.schedules import make_ddim_schedule
from eo_diffusion_tpu.diffusion.edit import sdedit_plan, sdedit_sample
from eo_diffusion_tpu.diffusion.flow import FlowMatching
from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion

SIZE = 8
CH = 3


def make_diffusion(T=50):
    return GaussianDiffusion.create(timesteps=T, image_size=SIZE, in_channels=CH)


def zero_model(x, t, cond, y):
    return jnp.zeros_like(x)


def _source(n=4, seed=3):
    g = np.random.default_rng(seed)
    return jnp.asarray(g.uniform(-0.8, 0.8, (n, SIZE, SIZE, CH)), jnp.float32)


class TestPlan:
    def test_bounds(self):
        assert sdedit_plan(50, 1.0) == 50
        assert sdedit_plan(50, 1e-6) == 1
        assert sdedit_plan(50, 0.5) == 25

    def test_rejects_zero(self):
        with pytest.raises(AssertionError):
            sdedit_plan(50, 0.0)


class TestDDIMEdit:
    def test_closed_form_zero_eps(self):
        """With eps_hat = 0 the DDIM tail telescopes:
        out = sqrt(acp0)*src + sqrt(acp0*(1-a_enc)/a_enc)*noise, so the
        per-pixel MSE against the source has a closed form — this pins the
        (t_enc, x_T) pairing exactly (a one-index-off noising level would
        shift the variance by a full DDIM stride)."""
        diff = make_diffusion(T=100)
        num_steps, strength = 10, 0.5
        dd = make_ddim_schedule(diff.schedule, num_steps, 0.0, "uniform")
        k = sdedit_plan(dd.num_steps, strength)
        a_enc = float(dd.alphas[k - 1])
        acp0 = float(dd.alphas_prev[0])

        src = _source(n=8)
        out = sdedit_sample(diff, zero_model, jax.random.PRNGKey(0), src,
                            strength, num_steps=num_steps).x
        mse = float(jnp.mean((out - src) ** 2))
        expected = ((np.sqrt(acp0) - 1.0) ** 2 * float(jnp.mean(src**2))
                    + acp0 * (1.0 - a_enc) / a_enc)
        assert abs(mse - expected) / expected < 0.15, (mse, expected)

    def test_strength_monotone_distance(self):
        diff = make_diffusion()
        src = _source()
        dists = []
        for s in (0.2, 0.6, 1.0):
            out = sdedit_sample(diff, zero_model, jax.random.PRNGKey(0), src,
                                s, num_steps=10).x
            dists.append(float(jnp.mean((out - src) ** 2)))
        assert dists[0] < dists[1] < dists[2], dists

    def test_full_strength_start_index_parity(self):
        """start_index == num_steps must be bit-identical to the default."""
        diff = make_diffusion()
        x_T = _source()
        # the builder may round the subsequence length up (uniform stride
        # at T=50/S=8 yields 9 entries) — parity is against dd.num_steps
        dd = make_ddim_schedule(diff.schedule, 8, 0.0, "uniform")
        kw = dict(num_steps=8, x_T=x_T)
        a = diff.ddim_sample(zero_model, jax.random.PRNGKey(1), 4, **kw).x
        b = diff.ddim_sample(zero_model, jax.random.PRNGKey(1), 4,
                             start_index=dd.num_steps, **kw).x
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_start_index_bounds(self):
        diff = make_diffusion()
        with pytest.raises(AssertionError):
            diff.ddim_sample(zero_model, jax.random.PRNGKey(0), 2,
                             num_steps=8, start_index=99)

    def test_jit_and_log_every(self):
        diff = make_diffusion()
        src = _source(n=2)

        @jax.jit
        def run(src, key):
            return sdedit_sample(diff, zero_model, key, src, 0.5,
                                 num_steps=10, log_every=2).x

        out = run(src, jax.random.PRNGKey(0))
        assert out.shape == src.shape and np.isfinite(np.asarray(out)).all()

    def test_oracle_recovers_target(self):
        """An eps-oracle for a point mass pulls any source to the target."""
        diff = make_diffusion(T=100)
        target = jnp.full((4, SIZE, SIZE, CH), 0.5, jnp.float32)
        sa = jnp.asarray(diff.schedule.sqrt_alphas_cumprod)
        ss = jnp.asarray(diff.schedule.sqrt_one_minus_alphas_cumprod)

        def oracle(x, t, cond, y):
            a = sa[t][:, None, None, None]
            s = ss[t][:, None, None, None]
            return (x - a * target) / jnp.maximum(s, 1e-8)

        out = sdedit_sample(diff, oracle, jax.random.PRNGKey(0), _source(),
                            0.7, num_steps=20).x
        # DDIM carries the residual eps down to level acp[0] (sqrt(1-acp[0])
        # ~ 0.05 at T=100 cosine), so convergence is to-within that floor
        assert float(jnp.max(jnp.abs(out - target))) < 0.2
        assert float(jnp.mean(jnp.abs(out - target))) < 0.05


class TestFlowEdit:
    def test_point_mass_velocity_converges(self):
        fm = FlowMatching.create(image_size=SIZE, in_channels=CH)
        mu = 0.4

        def v(x, t_scaled, cond, y):
            t = (t_scaled / fm.time_scale)[:, None, None, None]
            return (x - mu) / jnp.maximum(t, 1e-4)

        out = sdedit_sample(fm, v, jax.random.PRNGKey(0), _source(), 0.5,
                            num_steps=32).x
        assert float(jnp.mean(jnp.abs(out - mu))) < 0.08

    def test_zero_velocity_stays_on_path(self):
        """v = 0 leaves x at the start point (1-t)*src + t*noise, whose
        distance from the source scales with t_enc = strength."""
        fm = FlowMatching.create(image_size=SIZE, in_channels=CH)
        src = _source()
        d = [float(jnp.mean((sdedit_sample(fm, zero_model,
                                           jax.random.PRNGKey(0), src, s,
                                           num_steps=10).x - src) ** 2))
             for s in (0.2, 0.8)]
        assert d[0] < d[1]
        # exact: ||t*(n - src)||^2 with the SAME realized noise both times
        # is proportional to t^2 -> ratio == 16 exactly
        assert abs(d[1] / d[0] - 16.0) < 1e-3, d


class TestLatentEdit:
    def test_latent_roundtrip_shapes(self):
        from eo_diffusion_tpu.diffusion.latent import LatentDiffusion

        inner = GaussianDiffusion.create(timesteps=50, image_size=SIZE // 2,
                                         in_channels=CH)
        ld = LatentDiffusion(
            inner,
            encode_fn=lambda x: x[:, ::2, ::2, :],
            decode_fn=lambda z: jnp.repeat(jnp.repeat(z, 2, 1), 2, 2),
        )
        src = _source(n=2)
        out = sdedit_sample(ld, zero_model, jax.random.PRNGKey(0), src,
                            0.5, num_steps=10).x
        assert out.shape == src.shape
        assert np.isfinite(np.asarray(out)).all()
