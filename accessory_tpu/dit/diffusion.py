"""Gaussian diffusion: schedules, exact hybrid losses, respacing, samplers.

Reference: Large-DiT-*/diffusion/ (gaussian_diffusion.py ~900 LoC,
respace.py, diffusion_utils.py) — the OpenAI ADM formulation. This is the
TPU-functional redesign: every sampler is one ``lax.scan`` (jit-friendly,
no Python step loops at runtime), schedules precompute into device
constants, and respacing produces a new ``GaussianDiffusion`` whose
``timestep_map`` rewrites model-facing timesteps.

Covered (reference parity):
  * linear / cosine / squaredcos_cap_v2 beta schedules
  * ModelVarType: learned_range (default), fixed_small, fixed_large
  * exact hybrid loss: per-example eps-MSE + true VB term (KL between the
    q posterior and p with FROZEN mean, discretized gaussian NLL at t=0),
    rescaled by T/1000 (gaussian_diffusion.py:716-775)
  * timestep respacing incl. "ddimN" strides (respace.py:12-63)
  * DDPM ancestral + DDIM samplers, classifier-free guidance wrapper
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


def linear_beta_schedule(T: int) -> np.ndarray:
    scale = 1000.0 / T
    betas = np.linspace(scale * 1e-4, scale * 0.02, T, dtype=np.float64)
    # at small T the 1000/T scaling reaches beta=1.0 (alpha_bar=0 → division
    # by zero downstream); clip just below
    return np.clip(betas, 0.0, 0.999)


def cosine_beta_schedule(T: int, s: float = 0.008) -> np.ndarray:
    f = np.cos((np.arange(T + 1) / T + s) / (1 + s) * np.pi / 2) ** 2
    betas = 1 - f[1:] / f[:-1]
    return np.clip(betas, 0, 0.999)


def space_timesteps(num_timesteps: int,
                    section_counts: Union[str, Sequence[int]]) -> set:
    """Pick a timestep subset (reference respace.space_timesteps semantics):
    "ddimN" uses the fixed DDIM stride; otherwise comma-separated section
    counts stride equally-sized portions of the original process."""
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            want = int(section_counts[len("ddim"):])
            for stride in range(1, num_timesteps):
                if len(range(0, num_timesteps, stride)) == want:
                    return set(range(0, num_timesteps, stride))
            raise ValueError(
                f"cannot make exactly {want} steps with an integer stride")
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start = 0
    out = []
    for i, count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < count:
            raise ValueError(f"cannot take {count} steps from a section of {size}")
        stride = 1 if count <= 1 else (size - 1) / (count - 1)
        cur = 0.0
        for _ in range(count):
            out.append(start + round(cur))
            cur += stride
        start += size
    return set(out)


def _normal_kl(mean1, logvar1, mean2, logvar2):
    """KL(N(mean1, var1) || N(mean2, var2)) elementwise, in nats."""
    return 0.5 * (-1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
                  + jnp.square(mean1 - mean2) * jnp.exp(-logvar2))


def _approx_std_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(np.sqrt(2.0 / np.pi)
                                 * (x + 0.044715 * x ** 3)))


def _discretized_gaussian_ll(x, means, log_scales):
    """log p(x) for images discretized to 256 bins in [-1, 1]
    (diffusion_utils.discretized_gaussian_log_likelihood)."""
    centered = x - means
    inv_std = jnp.exp(-log_scales)
    plus = _approx_std_cdf(inv_std * (centered + 1.0 / 255.0))
    minus = _approx_std_cdf(inv_std * (centered - 1.0 / 255.0))
    log_plus = jnp.log(jnp.maximum(plus, 1e-12))
    log_1m_minus = jnp.log(jnp.maximum(1.0 - minus, 1e-12))
    log_delta = jnp.log(jnp.maximum(plus - minus, 1e-12))
    return jnp.where(x < -0.999, log_plus,
                     jnp.where(x > 0.999, log_1m_minus, log_delta))


def _mean_flat(x):
    return jnp.mean(x.reshape(x.shape[0], -1), axis=1)


@dataclasses.dataclass
class GaussianDiffusion:
    num_timesteps: int = 1000
    schedule: str = "linear"
    learn_sigma: bool = True
    var_type: str = "learned_range"  # | "fixed_small" | "fixed_large"
    betas_override: Optional[np.ndarray] = None
    # respacing: model-facing timestep = timestep_map[t] (original indexing)
    timestep_map: Optional[np.ndarray] = None

    def __post_init__(self):
        if self.betas_override is not None:
            betas = np.asarray(self.betas_override, np.float64)
            self.num_timesteps = len(betas)
        else:
            betas = (linear_beta_schedule(self.num_timesteps)
                     if self.schedule == "linear"
                     else cosine_beta_schedule(self.num_timesteps))
        alphas = 1.0 - betas
        acp = np.cumprod(alphas)
        acp_prev = np.append(1.0, acp[:-1])
        self.betas = jnp.asarray(betas, jnp.float32)
        self.alphas_cumprod = jnp.asarray(acp, jnp.float32)
        self.sqrt_acp = jnp.asarray(np.sqrt(acp), jnp.float32)
        self.sqrt_1m_acp = jnp.asarray(np.sqrt(1 - acp), jnp.float32)
        self.sqrt_recip_acp = jnp.asarray(np.sqrt(1 / acp), jnp.float32)
        self.sqrt_recipm1_acp = jnp.asarray(np.sqrt(1 / acp - 1), jnp.float32)
        post_var = betas * (1 - acp_prev) / (1 - acp)
        self.posterior_var = jnp.asarray(post_var, jnp.float32)
        self.posterior_logvar_clipped = jnp.asarray(
            np.log(np.append(post_var[1], post_var[1:])), jnp.float32)
        self.posterior_mean_c0 = jnp.asarray(
            betas * np.sqrt(acp_prev) / (1 - acp), jnp.float32)
        self.posterior_mean_ct = jnp.asarray(
            (1 - acp_prev) * np.sqrt(alphas) / (1 - acp), jnp.float32)
        self.log_betas = jnp.asarray(np.log(betas), jnp.float32)
        # FIXED_LARGE variance (gaussian_diffusion.py:298-301): beta_t with
        # the t=0 entry replaced by the posterior variance
        fl = np.append(post_var[1], betas[1:])
        self.fixed_large_var = jnp.asarray(fl, jnp.float32)
        self.fixed_large_logvar = jnp.asarray(np.log(fl), jnp.float32)
        self._tmap = (None if self.timestep_map is None
                      else jnp.asarray(self.timestep_map, jnp.int32))

    # -- respacing ---------------------------------------------------------

    def respaced(self, section_counts: Union[str, Sequence[int]]
                 ) -> "GaussianDiffusion":
        """SpacedDiffusion (respace.py): keep only the selected original
        timesteps, recompute betas so the marginals match, and record the
        original indices so the model still sees original-scale t."""
        use = sorted(space_timesteps(self.num_timesteps, section_counts))
        acp = np.cumprod(1.0 - np.asarray(self.betas, np.float64))
        last = 1.0
        new_betas, tmap = [], []
        for t in use:
            new_betas.append(1.0 - acp[t] / last)
            last = acp[t]
            tmap.append(t)
        return GaussianDiffusion(
            schedule=self.schedule, learn_sigma=self.learn_sigma,
            var_type=self.var_type,
            betas_override=np.asarray(new_betas),
            timestep_map=np.asarray(tmap))

    def _model_t(self, t):
        return t if self._tmap is None else self._tmap[t]

    # -- forward process -------------------------------------------------

    def q_sample(self, x0, t, noise):
        shape = (-1,) + (1,) * (x0.ndim - 1)
        return (self.sqrt_acp[t].reshape(shape) * x0
                + self.sqrt_1m_acp[t].reshape(shape) * noise)

    def q_posterior(self, x0, xt, t):
        sh = (-1,) + (1,) * (x0.ndim - 1)
        mean = (self.posterior_mean_c0[t].reshape(sh) * x0
                + self.posterior_mean_ct[t].reshape(sh) * xt)
        return mean, self.posterior_logvar_clipped[t].reshape(sh)

    # -- reverse process -------------------------------------------------

    def _eps_to_x0(self, xt, t, eps):
        shape = (-1,) + (1,) * (xt.ndim - 1)
        return (self.sqrt_recip_acp[t].reshape(shape) * xt
                - self.sqrt_recipm1_acp[t].reshape(shape) * eps)

    def p_mean_variance(self, model_out, xt, t, clip: bool = True):
        """model output → (mean, logvar, pred_x0) of p(x_{t-1}|x_t)
        (gaussian_diffusion.py:254-333, mean_type=EPSILON)."""
        sh = (-1,) + (1,) * (xt.ndim - 1)
        if self.learn_sigma:
            eps, var_raw = jnp.split(model_out, 2, axis=1)
            frac = (var_raw + 1) / 2
            logvar = (frac * self.log_betas[t].reshape(sh)
                      + (1 - frac) * self.posterior_logvar_clipped[t].reshape(sh))
        else:
            eps = model_out
            logvar = (self.fixed_large_logvar if self.var_type == "fixed_large"
                      else self.posterior_logvar_clipped)[t].reshape(sh)
            logvar = jnp.broadcast_to(logvar, xt.shape)
        x0 = self._eps_to_x0(xt, t, eps)
        if clip:
            x0 = jnp.clip(x0, -1, 1)
        mean, _ = self.q_posterior(x0, xt, t)
        return mean, logvar, x0

    # -- losses ------------------------------------------------------------

    def vb_term(self, model_out, x0, xt, t, clip: bool = False):
        """Per-example VB term in bits/dim: KL(q(x_{t-1}|x_t,x_0) ||
        p(x_{t-1}|x_t)) for t>0, discretized gaussian NLL at t=0
        (gaussian_diffusion.py:683-715)."""
        true_mean, true_logvar = self.q_posterior(x0, xt, t)
        mean, logvar, _ = self.p_mean_variance(model_out, xt, t, clip=clip)
        kl = _mean_flat(_normal_kl(true_mean,
                                   jnp.broadcast_to(true_logvar, xt.shape),
                                   mean, logvar)) / np.log(2.0)
        nll = -_mean_flat(_discretized_gaussian_ll(
            x0, mean, 0.5 * logvar)) / np.log(2.0)
        return jnp.where(t == 0, nll, kl)

    def training_loss(self, model_fn: Callable, x0, t, key, model_args=(),
                      reduce: bool = True):
        """Exact hybrid loss (LossType.RESCALED_MSE + LEARNED_RANGE,
        gaussian_diffusion.py:747-771): per-example eps-MSE plus the true
        VB term with the mean FROZEN (stop-gradient on eps inside the VB
        input) rescaled by T/1000.

        ``reduce=False`` returns the per-example (b,) loss vector instead of
        the batch mean — the loss-aware timestep sampler (timestep_sampler.py)
        needs per-(t, loss) pairs for its history and applies importance
        weights before reducing."""
        noise = jax.random.normal(key, x0.shape, x0.dtype)
        xt = self.q_sample(x0, t, noise)
        out = model_fn(xt, self._model_t(t), *model_args)
        if self.learn_sigma:
            eps, var_raw = jnp.split(out, 2, axis=1)
            mse_per = _mean_flat(jnp.square(eps - noise))
            # freeze the mean for the VB term so it only trains the variance
            frozen = jnp.concatenate([jax.lax.stop_gradient(eps), var_raw],
                                     axis=1)
            vb_per = self.vb_term(frozen, x0, xt, t) * \
                (self.num_timesteps / 1000.0)
            per = mse_per + vb_per
            if not reduce:
                return per, {"mse": jnp.mean(mse_per), "vb": jnp.mean(vb_per)}
            return jnp.mean(per), {"mse": jnp.mean(mse_per),
                                   "vb": jnp.mean(vb_per)}
        mse_per = _mean_flat(jnp.square(out - noise))
        if not reduce:
            return mse_per, {"mse": jnp.mean(mse_per), "vb": jnp.zeros(())}
        return jnp.mean(mse_per), {"mse": jnp.mean(mse_per),
                                   "vb": jnp.zeros(())}

    # -- sampling ----------------------------------------------------------

    def p_sample_loop(self, model_fn: Callable, shape, key, model_args=(),
                      clip: bool = True):
        """DDPM ancestral sampling as one lax.scan (jit-friendly)."""
        key, sub = jax.random.split(key)
        x = jax.random.normal(sub, shape, jnp.float32)

        def step(carry, t):
            x, key = carry
            key, sub = jax.random.split(key)
            tb = jnp.full((shape[0],), t, jnp.int32)
            out = model_fn(x, self._model_t(tb), *model_args)
            mean, logvar, _ = self.p_mean_variance(out, x, tb, clip=clip)
            noise = jax.random.normal(sub, shape, jnp.float32)
            nonzero = (t > 0).astype(jnp.float32)
            x = mean + nonzero * jnp.exp(0.5 * logvar) * noise
            return (x, key), None

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        (x, _), _ = jax.lax.scan(step, (x, key), ts)
        return x

    def ddim_sample_loop(self, model_fn: Callable, shape, key,
                         steps: Optional[int] = None, eta: float = 0.0,
                         clip: bool = True, model_args=()):
        """DDIM over a strided subsequence (or this (respaced) process's
        own timesteps when steps is None)."""
        key, sub = jax.random.split(key)
        x = jax.random.normal(sub, shape, jnp.float32)
        if steps is None or steps >= self.num_timesteps:
            seq_np = np.arange(self.num_timesteps - 1, -1, -1)
        else:
            seq_np = np.linspace(0, self.num_timesteps - 1, steps,
                                 dtype=np.int64)[::-1].copy()
        seq = jnp.asarray(seq_np)
        seq_prev = jnp.concatenate([seq[1:], jnp.array([-1])])

        acp_full = jnp.concatenate(
            [jnp.ones((1,), jnp.float32), self.alphas_cumprod])

        def step(carry, ts):
            x, key = carry
            t, t_prev = ts
            key, sub = jax.random.split(key)
            tb = jnp.full((shape[0],), t, jnp.int32)
            out = model_fn(x, self._model_t(tb), *model_args)
            eps = jnp.split(out, 2, axis=1)[0] if self.learn_sigma else out
            x0 = self._eps_to_x0(x, tb, eps)
            if clip:
                x0 = jnp.clip(x0, -1, 1)
            # re-derive eps from the (possibly clipped) x0 (gaussian_
            # diffusion.py:514-560 does the same)
            sh = (-1,) + (1,) * (x.ndim - 1)
            eps = ((self.sqrt_recip_acp[tb].reshape(sh) * x - x0)
                   / self.sqrt_recipm1_acp[tb].reshape(sh))
            a_t = acp_full[t + 1]
            a_prev = acp_full[t_prev + 1]
            sigma = eta * jnp.sqrt((1 - a_prev) / (1 - a_t)) * \
                jnp.sqrt(1 - a_t / a_prev)
            dir_xt = jnp.sqrt(jnp.maximum(1 - a_prev - sigma ** 2, 0.0)) * eps
            noise = jax.random.normal(sub, shape, jnp.float32)
            x = jnp.sqrt(a_prev) * x0 + dir_xt + sigma * noise * (t_prev >= 0)
            return (x, key), None

        (x, _), _ = jax.lax.scan(step, (x, key), (seq, seq_prev))
        return x


def cfg_model_fn(model_fn: Callable, guidance_scale: float, null_label: int):
    """Classifier-free guidance wrapper: runs cond+uncond in one batch
    (reference models/model.py forward_with_cfg)."""

    def wrapped(x, t, y, *rest):
        xx = jnp.concatenate([x, x], axis=0)
        tt = jnp.concatenate([t, t], axis=0)
        yy = jnp.concatenate([y, jnp.full_like(y, null_label)], axis=0)
        out = model_fn(xx, tt, yy, *rest)
        cond, uncond = jnp.split(out, 2, axis=0)
        c_eps, c_rest = jnp.split(cond, 2, axis=1)
        u_eps, _ = jnp.split(uncond, 2, axis=1)
        eps = u_eps + guidance_scale * (c_eps - u_eps)
        return jnp.concatenate([eps, c_rest], axis=1)

    return wrapped


def ema_update(ema_params, params, decay: float = 0.9999):
    """EMA of parameters (reference Large-DiT train.py:121-131)."""
    return jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1 - decay),
        ema_params, params)
