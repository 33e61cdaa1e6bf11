"""Golden tests for schedule math against the reference equations.

The reference formulas (diffusion/model.py:87-92, diffusion/util.py:38-91)
are re-derived here independently in numpy/torch and compared against
eo_diffusion_tpu.core.schedules.
"""

import math

import numpy as np
import pytest
import torch

from eo_diffusion_tpu.core import schedules as S


class TestCosineBetas:
    def test_matches_reference_formula_float32(self):
        # Reference computes in torch float32 (diffusion/model.py:87-92).
        T = 1000
        steps = torch.linspace(0, T, steps=T + 1, dtype=torch.float32)
        f_t = torch.cos(((steps / T + 0.008) / (1.0 + 0.008)) * math.pi * 0.5) ** 2
        ref = torch.clip(1.0 - f_t[1:] / f_t[:T], 0.0, 0.999).numpy()

        ours = S.cosine_betas(T)
        np.testing.assert_allclose(ours, ref, rtol=0, atol=2e-6)

    def test_monotone_alphas_cumprod(self):
        sched = S.make_schedule(1000)
        acp = sched.alphas_cumprod
        assert np.all(np.diff(acp) < 0)
        assert acp[0] > 0.99
        assert acp[-1] < 1e-4

    @pytest.mark.parametrize("T", [10, 100, 1000])
    def test_beta_bounds(self, T):
        betas = S.cosine_betas(T)
        assert np.all(betas >= 0.0)
        assert np.all(betas <= 0.999)
        assert betas.dtype == np.float32


class TestCompVisSchedules:
    def test_linear_matches_reference(self):
        # diffusion/util.py:39-42 computes in float64.
        T = 1000
        ref = (
            torch.linspace(1e-4**0.5, 2e-2**0.5, T, dtype=torch.float64) ** 2
        ).numpy()
        np.testing.assert_allclose(S.make_beta_schedule("linear", T), ref, rtol=1e-12)

    def test_cosine_matches_reference(self):
        T = 1000
        s = 8e-3
        ts = torch.arange(T + 1, dtype=torch.float64) / T + s
        alphas = ts / (1 + s) * np.pi / 2
        alphas = torch.cos(alphas).pow(2)
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        ref = np.clip(betas.numpy(), 0, 0.999)
        np.testing.assert_allclose(S.make_beta_schedule("cosine", T), ref, rtol=1e-12)

    def test_sqrt_variants(self):
        T = 100
        np.testing.assert_allclose(
            S.make_beta_schedule("sqrt_linear", T),
            np.linspace(1e-4, 2e-2, T),
            rtol=1e-12,
        )
        np.testing.assert_allclose(
            S.make_beta_schedule("sqrt", T),
            np.linspace(1e-4, 2e-2, T) ** 0.5,
            rtol=1e-12,
        )

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            S.make_beta_schedule("nope", 10)


class TestDDIMTimesteps:
    def test_uniform_default_config(self):
        # T=1000, S=250 -> c=4 -> steps 1,5,...,997 (util.py:63-77)
        steps = S.make_ddim_timesteps("uniform", 250, 1000)
        assert steps.shape == (250,)
        assert steps[0] == 1
        assert steps[-1] == 997
        assert np.all(np.diff(steps) == 4)

    def test_quad(self):
        steps = S.make_ddim_timesteps("quad", 50, 1000)
        ref = ((np.linspace(0, np.sqrt(1000 * 0.8), 50)) ** 2).astype(int) + 1
        np.testing.assert_array_equal(steps, ref)

    def test_off_by_one_guard(self):
        # ddim.py:27 -- when T/S < 2 the +1 shift would index out of range.
        sched = S.make_schedule(1000)
        dd = S.make_ddim_schedule(sched, 600)
        assert dd.timesteps.max() < 1000
        assert dd.timesteps.min() >= 0

    def test_no_guard_when_sparse(self):
        sched = S.make_schedule(1000)
        dd = S.make_ddim_schedule(sched, 250)
        assert dd.timesteps[0] == 1  # +1 shift retained


class TestDDIMParameters:
    def test_sigma_zero_at_eta_zero(self):
        sched = S.make_schedule(1000)
        dd = S.make_ddim_schedule(sched, 50, eta=0.0)
        np.testing.assert_array_equal(dd.sigmas, np.zeros(50, np.float32))

    def test_sigma_formula_eta_one(self):
        # util.py:86: sigma = eta*sqrt((1-a_prev)/(1-a) * (1 - a/a_prev))
        sched = S.make_schedule(1000)
        dd = S.make_ddim_schedule(sched, 50, eta=1.0)
        acp = sched.alphas_cumprod.astype(np.float64)
        a = acp[dd.timesteps]
        a_prev = np.concatenate([[acp[0]], acp[dd.timesteps[:-1]]])
        ref = np.sqrt((1 - a_prev) / (1 - a) * (1 - a / a_prev))
        np.testing.assert_allclose(dd.sigmas, ref, rtol=1e-5)

    def test_alphas_prev_shifted(self):
        sched = S.make_schedule(1000)
        dd = S.make_ddim_schedule(sched, 50)
        acp = sched.alphas_cumprod
        np.testing.assert_allclose(dd.alphas_prev[1:], acp[dd.timesteps[:-1]], rtol=1e-6)
        np.testing.assert_allclose(dd.alphas_prev[0], acp[0], rtol=1e-6)

    def test_eta_between(self):
        sched = S.make_schedule(1000)
        d0 = S.make_ddim_schedule(sched, 50, eta=0.0)
        d5 = S.make_ddim_schedule(sched, 50, eta=0.5)
        d1 = S.make_ddim_schedule(sched, 50, eta=1.0)
        np.testing.assert_allclose(d5.sigmas, 0.5 * d1.sigmas, rtol=1e-6)
        assert np.all(d5.sigmas[1:] > d0.sigmas[1:])


class TestBetasForAlphaBar:
    def test_cosine_alpha_bar(self):
        # guided-diffusion's standard usage of betas_for_alpha_bar
        ab = lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
        betas = S.betas_for_alpha_bar(100, ab)
        assert betas.shape == (100,)
        assert np.all(betas > 0) and np.all(betas <= 0.999)


class TestDiffusionScheduleProperties:
    def test_identities(self):
        sched = S.make_schedule(1000)
        np.testing.assert_allclose(
            sched.sqrt_alphas_cumprod**2 + sched.sqrt_one_minus_alphas_cumprod**2,
            np.ones(1000, np.float32),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            sched.sqrt_recip_alphas_cumprod,
            1.0 / sched.sqrt_alphas_cumprod,
            rtol=1e-5,
        )
        np.testing.assert_allclose(sched.alphas_cumprod_prev[0], 1.0)
        np.testing.assert_allclose(
            sched.alphas_cumprod_prev[1:], sched.alphas_cumprod[:-1]
        )


class TestDDIMGuards:
    def test_too_many_steps_rejected(self):
        sched = S.make_schedule(100)
        with pytest.raises(AssertionError, match="num_steps"):
            S.make_ddim_schedule(sched, 200)

    def test_single_step_ok(self):
        sched = S.make_schedule(100)
        dd = S.make_ddim_schedule(sched, 1)
        assert dd.num_steps >= 1


class TestZeroTerminalSNR:
    """Lin et al. 2023 (arXiv:2305.08891): rescaled schedule + trailing spacing."""

    def test_terminal_acp_zero_first_preserved(self):
        base = S.make_schedule(1000)
        z = S.make_schedule(1000, zero_terminal_snr=True)
        # SNR(T) must be exactly zero; SNR(1) (the t=0 row) unchanged
        assert z.alphas_cumprod[-1] == 0.0
        np.testing.assert_allclose(z.alphas_cumprod[0], base.alphas_cumprod[0],
                                   rtol=1e-6)
        assert base.alphas_cumprod[-1] > 0  # the flaw the rescale fixes

    def test_rescale_monotone_and_valid(self):
        betas = S.rescale_zero_terminal_snr(S.cosine_betas(1000).astype(np.float64))
        acp = np.cumprod(1.0 - betas)
        assert np.all(np.diff(acp) < 0)
        assert np.all(betas >= 0) and np.all(betas <= 1.0)

    def test_tables_finite(self):
        z = S.make_schedule(100, zero_terminal_snr=True)
        for f in ("betas", "alphas", "alphas_cumprod", "sqrt_alphas_cumprod",
                  "sqrt_one_minus_alphas_cumprod", "sqrt_recip_alphas_cumprod",
                  "sqrt_recipm1_alphas_cumprod"):
            assert np.all(np.isfinite(getattr(z, f))), f

    def test_works_on_linear_schedule_too(self):
        z = S.make_schedule(100, schedule="linear", zero_terminal_snr=True)
        assert z.alphas_cumprod[-1] == 0.0

    def test_trailing_spacing(self):
        steps = S.make_ddim_timesteps("trailing", 50, 1000)
        assert steps.shape == (50,)
        assert steps[-1] == 999          # anchored at T-1 (Table 2)
        assert np.all(np.diff(steps) > 0)  # ascending, unique
        assert steps[0] >= 0
        # uniform spacing by contrast never reaches T-1
        uni = S.make_ddim_timesteps("uniform", 50, 1000)
        assert uni[-1] < 999

    def test_trailing_dense_in_range(self):
        # T/S < 2 regime: trailing needs neither the +1 nor the guard shift
        sched = S.make_schedule(50)
        dd = S.make_ddim_schedule(sched, 40, method="trailing")
        assert dd.timesteps[-1] == 49
        assert np.all(dd.timesteps >= 0) and np.all(dd.timesteps < 50)
        assert len(np.unique(dd.timesteps)) == 40

    def test_trailing_full_ddim_schedule_on_ztsnr(self):
        sched = S.make_schedule(100, zero_terminal_snr=True)
        dd = S.make_ddim_schedule(sched, 10, method="trailing")
        # the first (highest-t) step carries acp = 0 -> model sees pure noise
        assert dd.alphas[-1] == 0.0
        assert np.all(np.isfinite(dd.sigmas))
        assert np.all(np.isfinite(dd.alphas_prev))


class TestUniformSpacingEdge:
    def test_nondivisor_step_count_stays_in_range(self):
        """T=1000, S=3: range(0,1000,333) ends at 999 and the reference's
        +1 shift indexes past the table (a crash, util.py:75); the SCHEDULE
        clamps every step valid (SURVEY §2.4 fix-don't-reproduce policy).
        The raw timestep fn stays reference-exact (+1, unclamped) so the
        clamp can't double-apply with the T/S < 2 down-shift."""
        steps = S.make_ddim_timesteps("uniform", 3, 1000)
        assert steps.max() == 1000  # reference-exact raw subsequence
        sched = S.make_schedule(1000)
        dd = S.make_ddim_schedule(sched, 3)  # must not raise
        assert dd.timesteps.max() <= 999 and dd.timesteps.min() >= 0
        assert np.all(np.isfinite(dd.sigmas))

    def test_full_chain_uniform_covers_terminal_step_without_dups(self):
        """Regression (review finding): with stride 1 (S >= T/2) the old
        clamp-then-downshift produced [0..998, 998] — a duplicated step
        and t=999 never denoised. Must be exactly [0..999] at S=T."""
        sched = S.make_schedule(1000)
        st = S.make_ddim_schedule(sched, 1000).timesteps
        np.testing.assert_array_equal(st, np.arange(1000))
        for S_ in (999, 501, 500, 250, 50):
            st = S.make_ddim_schedule(sched, S_).timesteps
            assert len(np.unique(st)) == len(st), S_
            assert st.min() >= 0 and st.max() <= 999, S_


class TestTrailingEdgeCases:
    def test_no_step_count_produces_negative_or_extra_steps(self):
        """Regression (review finding): arange-by-float-stride yielded S+1
        entries incl. timestep -1 for e.g. T=1000,S=61 (NaN sigmas on ZTSNR
        schedules); trailing must give exactly S in-range unique steps for
        every S."""
        for T in (50, 100, 1000):
            for S_ in range(1, min(T, 130) + 1):
                steps = S.make_ddim_timesteps("trailing", S_, T)
                assert steps.shape == (S_,), (T, S_, steps.shape)
                assert steps.min() >= 0 and steps.max() == T - 1, (T, S_)
                assert len(np.unique(steps)) == S_, (T, S_)

    def test_ztsnr_trailing_61_steps_finite(self):
        """The exact reproduced failure: T=1000 ZTSNR, 61 trailing steps."""
        sched = S.make_schedule(1000, zero_terminal_snr=True)
        dd = S.make_ddim_schedule(sched, 61, method="trailing")
        assert np.all(np.isfinite(dd.sigmas))
        assert np.all(np.isfinite(dd.alphas_prev))
        assert dd.timesteps.min() >= 0
