"""Progressive distillation (Salimans & Ho 2022, arXiv:2202.00512).

Iteratively halve the sampler: a student learns to match TWO deterministic
DDIM steps of its teacher in ONE step; after convergence the student
becomes the teacher and the grid halves again. N rounds turn a
1000-step-trained DDPM into a 2-4-step sampler — the third distillation
family in the framework next to ReFlow (flow teachers, diffusion/distill.py)
and consistency distillation (diffusion/consistency.py). The reference has
no distillation of any kind (its fastest path is DDIM-250, reference
inference.py:27).

Two paper-faithful choices matter numerically (both were measured to
diverge otherwise on the test fixture):

* **students are v-parameterized** (paper §4): an eps head cannot express
  few-step predictions — at t ~ T-1 the cosine schedule has acp ~ 1e-7, so
  x0 = (x_t - s*eps)/a amplifies the head's output error ~3000x (measured
  |x0_pred| ~ 1e3 from a well-trained eps teacher). The student's RAW
  output is therefore interpreted as v regardless of the teacher's
  objective (``student_process`` below); initializing a v student from eps
  teacher weights mis-calibrates the head for a few hundred steps, exactly
  as in the paper's setup.
* the loss regresses ONE student step onto the teacher's TWO-step
  endpoint in endpoint space: with a = sqrt(acp), s = sqrt(1-acp),
  r = s_lo/s_hi, a single eta=0 DDIM step is
  ``x_lo(x0) = (a_lo - r a_hi) x0 + r x_hi``, so
  ``loss = ||x_lo(x0_student) - x_lo_teacher||^2`` — bounded targets at
  every t (for a v head this is the paper's truncated-SNR x0 loss up to
  the (a_lo - r a_hi)^2 <= 1 step factor), and it is literally the
  sampler-composition error the halving argument bounds.

TPU shape: the two teacher steps and the target algebra are closed-form
tensor ops inside the one jitted loss; distillation grids are static
host-side arrays; sampling is a tiny ``lax.scan`` over the student grid.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from eo_diffusion_tpu.diffusion.gaussian import DiffusionOutput, GaussianDiffusion

__all__ = ["ProgressiveDistillation", "pd_sample"]


def _grid(timesteps: int, n_points: int) -> np.ndarray:
    """Ascending int grid 0..T-1 with ``n_points`` entries (static)."""
    g = np.round(np.linspace(0.0, timesteps - 1, n_points)).astype(np.int32)
    assert (np.diff(g) > 0).all(), (
        f"{n_points}-point grid over T={timesteps} collides; use fewer "
        "steps or more timesteps")
    return g


@dataclasses.dataclass(frozen=True)
class ProgressiveDistillation:
    """One halving round: teacher on 2N steps, student on N.

    :param teacher_process: process whose ``objective`` interprets the
        TEACHER model's raw output (round 1: the trained preset's process;
        later rounds: the previous round's v student).
    :param student_process: same schedule with the STUDENT head's
        objective (default "v", see module docstring).
    :param n_student: student DDIM steps this round (teacher takes 2x).
    """

    teacher_process: GaussianDiffusion
    student_process: GaussianDiffusion
    n_student: int

    @classmethod
    def create(cls, diffusion: GaussianDiffusion, n_student: int,
               student_objective: str = "v",
               teacher_objective: Optional[str] = None):
        assert n_student >= 1
        _grid(diffusion.timesteps, 2 * n_student + 1)  # validates
        teacher = (diffusion if teacher_objective is None else
                   dataclasses.replace(diffusion,
                                       objective=teacher_objective))
        student = dataclasses.replace(diffusion, objective=student_objective)
        return cls(teacher_process=teacher, student_process=student,
                   n_student=n_student)

    def grid(self) -> jnp.ndarray:
        """2N+1 ascending timesteps; students step on the even entries."""
        return jnp.asarray(_grid(self.teacher_process.timesteps,
                                 2 * self.n_student + 1))

    def _a_s(self, t: jax.Array):
        acp = jnp.asarray(self.teacher_process.schedule.alphas_cumprod)[t]
        cb = lambda v: v[:, None, None, None]
        return cb(jnp.sqrt(acp)), cb(jnp.sqrt(1.0 - acp))

    def _ddim_step(self, fn: Callable, x_t: jax.Array, t_from: jax.Array,
                   t_to: jax.Array, cond, y) -> jax.Array:
        """Deterministic teacher DDIM step t_from -> t_to (reference
        ddim.py:198-206 at eta=0, objective-converted). pred_x0 is clamped
        to [-1,1] with eps re-derived (Salimans-Ho "clip denoised")."""
        xf = x_t.astype(jnp.float32)
        raw = fn(x_t, t_from, cond, y)
        eps, x0 = self.teacher_process._to_eps_x0(raw, xf, t_from)
        x0 = jnp.clip(x0, -1.0, 1.0)
        a_from, s_from = self._a_s(t_from)
        eps = (xf - a_from * x0) / jnp.maximum(s_from, 1e-8)
        a_to, s_to = self._a_s(t_to)
        return a_to * x0 + s_to * eps

    def distill_loss(self, student_fn: Callable, teacher_fn: Callable,
                     rng: jax.Array, x0: jax.Array, cond=None,
                     y=None) -> jax.Array:
        """One batch of the 2-steps-into-1 regression (paper Algorithm 2).

        ``teacher_fn`` is evaluated under stop_gradient; ``x0`` is the data
        (or teacher-sample) pool batch. The student's raw output is read
        through ``student_process.objective`` ("v" by default).
        """
        i_rng, n_rng = jax.random.split(rng)
        n = x0.shape[0]
        g = self.grid()
        k = jax.random.randint(i_rng, (n,), 0, self.n_student)
        t_lo, t_mid, t_hi = g[2 * k], g[2 * k + 1], g[2 * k + 2]
        eps = jax.random.normal(n_rng, x0.shape, jnp.float32)
        x0f = x0.astype(jnp.float32)
        x_hi = self.teacher_process.q_sample(x0f, t_hi, eps)

        tfn = lambda *a: jax.lax.stop_gradient(teacher_fn(*a))
        x_mid = self._ddim_step(tfn, x_hi, t_hi, t_mid, cond, y)
        x_lo_t = jax.lax.stop_gradient(
            self._ddim_step(tfn, x_mid, t_mid, t_lo, cond, y))

        a_hi, s_hi = self._a_s(t_hi)
        a_lo, s_lo = self._a_s(t_lo)
        ratio = s_lo / jnp.maximum(s_hi, 1e-8)

        raw = student_fn(x_hi, t_hi, cond, y)
        _, x0_s = self.student_process._to_eps_x0(raw, x_hi, t_hi)
        x_lo_s = (a_lo - ratio * a_hi) * x0_s + ratio * x_hi
        return jnp.mean((x_lo_s - x_lo_t) ** 2)

    def sample(self, model_fn: Callable, rng: jax.Array, n_samples: int,
               cond=None, y=None, x_T: Optional[jax.Array] = None,
               dtype=jnp.float32) -> DiffusionOutput:
        """Sample the STUDENT on this round's grid (delegates to
        :func:`pd_sample` with the student's objective)."""
        return pd_sample(self.student_process, model_fn, rng, n_samples,
                         steps=self.n_student, cond=cond, y=y, x_T=x_T,
                         dtype=dtype)


def pd_sample(
    diffusion: GaussianDiffusion,
    model_fn: Callable,
    rng: jax.Array,
    n_samples: int,
    steps: int = 4,
    cond=None,
    y=None,
    x_T: Optional[jax.Array] = None,
    dtype=jnp.float32,
    model_state: Any = None,
    clip: bool = True,
) -> DiffusionOutput:
    """Deterministic DDIM on the PD linspace grid (one ``lax.scan``).

    ``diffusion.objective`` must match the checkpoint's head — "v" for
    students distilled by ``cli.distill --method progressive``. Progressive
    students are trained against THIS grid (0..T-1 linspace,
    diffusion/progressive._grid) — sampling them through
    ``ddim_sample(method="uniform")`` would evaluate off-grid timesteps the
    student never matched, which visibly degrades 1-4-step students.
    ``clip`` clamps pred_x0 each hop (eps re-derived) — the coarse-grid
    stabilizer PD training assumes.
    """
    g = jnp.asarray(_grid(diffusion.timesteps, steps + 1))
    shape = (n_samples, diffusion.image_size, diffusion.image_size,
             diffusion.in_channels)
    init_rng, _ = jax.random.split(rng)
    x = (x_T.astype(jnp.float32) if x_T is not None
         else jax.random.normal(init_rng, shape, jnp.float32))
    acp = jnp.asarray(diffusion.schedule.alphas_cumprod)
    stateful = model_state is not None

    def step(carry, i):
        x, st = carry
        t_hi, t_lo = g[steps - i], g[steps - i - 1]
        t = jnp.full((n_samples,), t_hi, jnp.int32)
        if stateful:
            raw, st = model_fn(x.astype(dtype), t, cond, y, st, i)
        else:
            raw = model_fn(x.astype(dtype), t, cond, y)
        eps, x0 = diffusion._to_eps_x0(raw, x, t)
        if clip:
            x0 = jnp.clip(x0, -1.0, 1.0)
            a_hi = jnp.sqrt(acp[t_hi])
            s_hi = jnp.sqrt(1.0 - acp[t_hi])
            eps = (x - a_hi * x0) / jnp.maximum(s_hi, 1e-8)
        a_lo = jnp.sqrt(acp[t_lo])
        s_lo = jnp.sqrt(1.0 - acp[t_lo])
        return (a_lo * x0 + s_lo * eps, st), None

    state0 = model_state if stateful else jnp.zeros((), jnp.float32)
    (x, _), _ = jax.lax.scan(step, (x, state0), jnp.arange(steps))
    return DiffusionOutput(x=x)
