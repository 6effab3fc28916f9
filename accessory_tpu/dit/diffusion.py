"""Gaussian diffusion: schedules, training losses, DDPM/DDIM sampling, CFG.

Reference: Large-DiT-*/diffusion/ (gaussian_diffusion.py ~900 LoC) — the
OpenAI ADM formulation: linear/cosine beta schedules, q(x_t|x_0) sampling,
hybrid eps-MSE + VB loss for learned sigma, ancestral sampling, DDIM, and
classifier-free guidance. Implemented as a small functional class whose
samplers are jit/scan-compatible.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

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


@dataclasses.dataclass
class GaussianDiffusion:
    num_timesteps: int = 1000
    schedule: str = "linear"
    learn_sigma: bool = True

    def __post_init__(self):
        betas = (linear_beta_schedule(self.num_timesteps)
                 if self.schedule == "linear"
                 else cosine_beta_schedule(self.num_timesteps))
        alphas = 1.0 - betas
        acp = np.cumprod(alphas)
        acp_prev = np.append(1.0, acp[:-1])
        self.betas = jnp.asarray(betas, jnp.float32)
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

    # -- forward process -------------------------------------------------

    def q_sample(self, x0, t, noise):
        shape = (-1,) + (1,) * (x0.ndim - 1)
        return (self.sqrt_acp[t].reshape(shape) * x0
                + self.sqrt_1m_acp[t].reshape(shape) * noise)

    # -- training loss ----------------------------------------------------

    def training_loss(self, model_fn: Callable, x0, t, key, model_args=()):
        """Hybrid loss: MSE on eps (+ simplified VB term on learned sigma,
        with the stop-gradient-on-mean trick from the reference)."""
        noise = jax.random.normal(key, x0.shape, x0.dtype)
        xt = self.q_sample(x0, t, noise)
        out = model_fn(xt, t, *model_args)
        if self.learn_sigma:
            eps, var_raw = jnp.split(out, 2, axis=1)
        else:
            eps, var_raw = out, None
        mse = jnp.mean(jnp.square(eps - noise))
        vb = 0.0
        if var_raw is not None:
            # interpolate log-variance between beta and posterior (ADM):
            # simplified VB regularizer on the variance head only
            frac = (var_raw + 1) / 2
            shape = (-1,) + (1,) * (x0.ndim - 1)
            logvar = (frac * self.log_betas[t].reshape(shape)
                      + (1 - frac) * self.posterior_logvar_clipped[t].reshape(shape))
            # kl against posterior with frozen mean: encourage logvar toward
            # the true posterior variance
            true_lv = self.posterior_logvar_clipped[t].reshape(shape)
            vb = jnp.mean(0.5 * (jnp.exp(true_lv - logvar)
                                 + (logvar - true_lv) - 1.0)) * 1e-3
        return mse + vb, {"mse": mse, "vb": vb}

    # -- sampling ----------------------------------------------------------

    def _eps_to_x0(self, xt, t, eps):
        shape = (-1,) + (1,) * (xt.ndim - 1)
        return (self.sqrt_recip_acp[t].reshape(shape) * xt
                - self.sqrt_recipm1_acp[t].reshape(shape) * eps)

    def p_sample_loop(self, model_fn: Callable, shape, key, model_args=(),
                      clip: bool = True):
        """DDPM ancestral sampling as one lax.scan (jit-friendly)."""
        key, sub = jax.random.split(key)
        x = jax.random.normal(sub, shape, jnp.float32)

        def step(carry, t):
            x, key = carry
            key, sub = jax.random.split(key)
            tb = jnp.full((shape[0],), t, jnp.int32)
            out = model_fn(x, tb)
            eps = jnp.split(out, 2, axis=1)[0] if self.learn_sigma else out
            x0 = self._eps_to_x0(x, tb, eps)
            if clip:
                x0 = jnp.clip(x0, -1, 1)
            sh = (-1,) + (1,) * (x.ndim - 1)
            mean = (self.posterior_mean_c0[tb].reshape(sh) * x0
                    + self.posterior_mean_ct[tb].reshape(sh) * x)
            noise = jax.random.normal(sub, shape, jnp.float32)
            nonzero = (t > 0).astype(jnp.float32)
            x = mean + nonzero * jnp.sqrt(
                self.posterior_var[tb].reshape(sh)) * noise
            return (x, key), None

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        (x, _), _ = jax.lax.scan(step, (x, key), ts)
        return x

    def ddim_sample_loop(self, model_fn: Callable, shape, key,
                         steps: int = 50, eta: float = 0.0, clip: bool = True):
        """DDIM with a strided timestep subsequence."""
        key, sub = jax.random.split(key)
        x = jax.random.normal(sub, shape, jnp.float32)
        seq = jnp.asarray(
            np.linspace(0, self.num_timesteps - 1, steps, dtype=np.int64)[::-1].copy())
        seq_prev = jnp.concatenate([seq[1:], jnp.array([-1])])

        acp_full = jnp.concatenate(
            [jnp.ones((1,), jnp.float32), self.sqrt_acp ** 2])

        def step(carry, ts):
            x, key = carry
            t, t_prev = ts
            key, sub = jax.random.split(key)
            tb = jnp.full((shape[0],), t, jnp.int32)
            out = model_fn(x, tb)
            eps = jnp.split(out, 2, axis=1)[0] if self.learn_sigma else out
            x0 = self._eps_to_x0(x, tb, eps)
            if clip:
                x0 = jnp.clip(x0, -1, 1)
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

    def wrapped(x, t, y):
        xx = jnp.concatenate([x, x], axis=0)
        tt = jnp.concatenate([t, t], axis=0)
        yy = jnp.concatenate([y, jnp.full_like(y, null_label)], axis=0)
        out = model_fn(xx, tt, yy)
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
