"""Diffusion timestep schedule samplers (uniform + loss-second-moment).

Behavioral reference: Large-DiT-ImageNet/diffusion/timestep_sampler.py
  * ScheduleSampler.sample        :43-59 — importance-sample t, return
    unbiasing weights 1/(T*p[t])
  * LossAwareSampler.update_with_local_losses :71-106 — cross-rank
    all_gather of (t, loss) pairs, then a deterministic shared update
  * LossSecondMomentResampler     :120-150 — per-timestep loss history
    (history_per_term=10), weights ∝ sqrt(E[loss²]) with uniform_prob
    mixed in; uniform until every timestep has a full history

TPU-first differences:
  * the sampler is a pure function over an explicit device-array state
    (``SamplerState``: (T, H) loss history + (T,) counts) so the whole
    sample → train → update cycle stays inside one jitted step — the
    reference round-trips losses to host numpy and runs a torch
    all_gather every step.
  * distributed sync is free under GSPMD: the state is replicated over
    the mesh and the update consumes the *global* (t, loss) batch, so
    every shard applies the identical deterministic update — the role of
    update_with_local_losses' all_gather without any collective code.
  * the full-history "shift out the oldest" buffer is a circular buffer
    (write slot = count mod H): the weights only read the unordered mean
    of squares, so the statistics are identical and the update is O(b)
    dynamic-slice writes instead of an O(H) shift.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class SamplerState(NamedTuple):
    """Loss history for loss-aware sampling. Replicate over the mesh."""
    history: jnp.ndarray  # (T, H) f32 — last H losses seen per timestep
    counts: jnp.ndarray   # (T,) i32 — lifetime writes per timestep (capped)


def init_sampler_state(num_timesteps: int,
                       history_per_term: int = 10) -> SamplerState:
    return SamplerState(
        history=jnp.zeros((num_timesteps, history_per_term), jnp.float32),
        counts=jnp.zeros((num_timesteps,), jnp.int32))


def sampler_weights(state: SamplerState,
                    uniform_prob: float = 0.001) -> jnp.ndarray:
    """Normalized sampling distribution p(t) (reference weights():131-138,
    already normalized here since sample() only uses w/sum(w)).

    Uniform until warm (every timestep has a full history), then
    sqrt(mean(loss²)) renormalized with ``uniform_prob`` mixed in so no
    timestep starves.
    """
    T, H = state.history.shape
    warmed = jnp.all(state.counts >= H)
    w = jnp.sqrt(jnp.mean(jnp.square(state.history), axis=-1))
    w = w / jnp.maximum(jnp.sum(w), 1e-20)
    w = w * (1 - uniform_prob) + uniform_prob / T
    return jnp.where(warmed, w, jnp.full((T,), 1.0 / T))


def sample_timesteps(state: SamplerState, key: jax.Array, batch: int,
                     uniform_prob: float = 0.001
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Importance-sample a (b,) timestep batch + unbiasing weights.

    weights[i] = 1/(T * p[t_i]) (reference sample():53-58) — multiplying
    the per-example losses by these keeps the objective's expectation equal
    to the uniform-sampling objective.
    """
    p = sampler_weights(state, uniform_prob)
    t = jax.random.categorical(key, jnp.log(p), shape=(batch,))
    w = 1.0 / (p.shape[0] * p[t])
    return t.astype(jnp.int32), w


def update_sampler_state(state: SamplerState, t: jnp.ndarray,
                         losses: jnp.ndarray) -> SamplerState:
    """Record the batch's (t, loss) pairs (update_with_all_losses:139-147).

    Sequential over the batch (lax.fori_loop) so duplicate timesteps in one
    batch each land in their own history slot, exactly like the reference's
    Python loop. Detached: call with stop_gradient'd losses (the history is
    statistics, not a differentiable path).
    """
    H = state.history.shape[1]

    def body(i, s):
        ti = t[i]
        # counts % H is the fill slot while counts < H and the circular
        # write pointer after; i32 counts cannot realistically overflow
        # (2^31 writes per timestep)
        slot = s.counts[ti] % H
        hist = jax.lax.dynamic_update_slice(
            s.history, losses[i].astype(jnp.float32)[None, None],
            (ti, slot))
        return SamplerState(hist, s.counts.at[ti].add(1))

    return jax.lax.fori_loop(0, t.shape[0], body, state)


def create_named_schedule_sampler(name: str, num_timesteps: int,
                                  history_per_term: int = 10):
    """Factory matching the reference entry point (timestep_sampler.py:13-24).

    Returns (init_state, sample_fn, update_fn); for "uniform" the state is
    None and update is a no-op, so train loops can thread one interface.
    """
    if name == "uniform":
        def sample_u(state, key, batch):
            t = jax.random.randint(key, (batch,), 0, num_timesteps)
            return t, jnp.ones((batch,), jnp.float32)

        return None, sample_u, lambda state, t, losses: state
    if name == "loss-second-moment":
        return (init_sampler_state(num_timesteps, history_per_term),
                lambda state, key, batch: sample_timesteps(state, key, batch),
                update_sampler_state)
    raise ValueError(f"unknown schedule sampler: {name}")
