"""DiT training CLI (ImageNet-class-conditional style).

Reference: Large-DiT-ImageNet/train.py / Large-DiT-T2I/train.py:160-235 —
TP+FSDP/HSDP training with EMA and gradient clipping. TPU mapping: the
(dp, fsdp, tp) mesh replaces the intra/inter-node process groups
(parallel.py:40-92); EMA is a jitted tree-map; CFG label dropout happens in
the input pipeline.

Expects pre-extracted VAE latents as .npz shards ({"latents": (N, C, H, W),
"labels": (N,)}); VAE encoding itself is outside scope (the reference also
consumes pre-encoded features for ImageNet).
"""

from __future__ import annotations

import argparse
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np


def get_args_parser():
    p = argparse.ArgumentParser("DiT training", add_help=False)
    p.add_argument("--data_dir", required=True, type=str)
    p.add_argument("--output_dir", default="./dit_out", type=str)
    p.add_argument("--dim", default=1152, type=int)
    p.add_argument("--n_layers", default=28, type=int)
    p.add_argument("--n_heads", default=16, type=int)
    p.add_argument("--input_size", default=32, type=int)
    p.add_argument("--num_classes", default=1000, type=int)
    p.add_argument("--batch_size", default=32, type=int)
    p.add_argument("--lr", default=1e-4, type=float)
    p.add_argument("--max_iters", default=400000, type=int)
    p.add_argument("--ema_decay", default=0.9999, type=float)
    p.add_argument("--clip_grad", default=1.0, type=float)
    p.add_argument("--model_parallel_size", default=1, type=int)
    p.add_argument("--save_freq", default=10000, type=int)
    p.add_argument("--log_every", default=100, type=int)
    p.add_argument("--seed", default=0, type=int)
    # reference train.py --schedule_sampler (uniform | loss-second-moment)
    p.add_argument("--schedule_sampler", default="uniform", type=str,
                   choices=("uniform", "loss-second-moment"))
    return p


def make_dit_train_step(args_d, diffusion, tx, remat=True,
                        schedule_sampler: str = "uniform"):
    """``schedule_sampler="loss-second-moment"`` importance-samples
    timesteps from the per-t loss history (reference LossAwareSampler /
    LossSecondMomentResampler, timestep_sampler.py:71-150) — the whole
    sample → weighted loss → history update cycle runs inside the one
    jitted step (see dit/timestep_sampler.py). The step then carries a
    ``sampler_state`` argument and returns it updated.
    """
    from accessory_tpu.dit.model import dit_forward
    from accessory_tpu.dit.timestep_sampler import (
        create_named_schedule_sampler)

    sstate0, sample_fn, update_fn = create_named_schedule_sampler(
        schedule_sampler, diffusion.num_timesteps)
    loss_aware = sstate0 is not None

    def loss_fn(params, latents, labels, t, t_weights, key, cap_feats=None):
        per, parts = diffusion.training_loss(
            lambda xt, tt, yy=labels: dit_forward(
                params, args_d, xt, tt, yy, cap_feats=cap_feats,
                remat=remat),
            latents, t, key, reduce=False)
        # importance-sampling unbiasing weights (1 for uniform): the
        # weighted mean keeps E[loss] equal to the uniform objective
        return jnp.mean(per * t_weights), (parts, per)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(state, ema, latents, labels, key, cap_feats=None,
             sampler_state=None):
        key, k_t, k_n, k_drop = jax.random.split(key, 4)
        b = latents.shape[0]
        if loss_aware:
            t, t_weights = sample_fn(sampler_state, k_t, b)
        else:
            t = jax.random.randint(k_t, (b,), 0, diffusion.num_timesteps)
            t_weights = jnp.ones((b,), jnp.float32)
        # CFG label dropout → null label (LabelEmbedder semantics); for T2I
        # the same dropout nulls the caption conditioning (Large-DiT-T2I
        # caption dropout role)
        drop = jax.random.uniform(k_drop, (b,)) < args_d.class_dropout_prob
        labels = jnp.where(drop, args_d.num_classes, labels)
        if cap_feats is not None:
            cap_feats = jnp.where(drop[:, None, None], 0.0, cap_feats)
        (loss, (parts, per)), grads = grad_fn(state.params, latents, labels,
                                              t, t_weights, k_n, cap_feats)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        import optax

        params = optax.apply_updates(state.params, updates)
        from accessory_tpu.dit.diffusion import ema_update
        from accessory_tpu.train.train_step import TrainState

        ema = ema_update(ema, params)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state)
        metrics = {"loss": loss, **parts}
        if loss_aware:
            sampler_state = update_fn(sampler_state,
                                      jax.lax.stop_gradient(t),
                                      jax.lax.stop_gradient(per))
            return new_state, ema, metrics, key, sampler_state
        return new_state, ema, metrics, key

    return (step, sstate0) if loss_aware else step


def main(args) -> None:
    import optax

    from accessory_tpu.dit.diffusion import GaussianDiffusion
    from accessory_tpu.dit.model import DiTArgs, dit_param_axes, init_dit
    from accessory_tpu.train.train_step import TrainState
    from accessory_tpu.util.logging import MetricLogger

    args_d = DiTArgs(input_size=args.input_size, dim=args.dim,
                     n_layers=args.n_layers, n_heads=args.n_heads,
                     num_classes=args.num_classes)
    diffusion = GaussianDiffusion()
    params = init_dit(jax.random.PRNGKey(args.seed), args_d)
    ema = jax.tree.map(lambda x: x.astype(jnp.float32), params)
    tx = optax.chain(optax.clip_by_global_norm(args.clip_grad),
                     optax.adamw(args.lr, weight_decay=0.0))
    state = TrainState.create(params, tx)
    loss_aware = args.schedule_sampler == "loss-second-moment"
    made = make_dit_train_step(args_d, diffusion, tx,
                               schedule_sampler=args.schedule_sampler)
    step_fn, sampler_state = made if loss_aware else (made, None)
    step = jax.jit(step_fn)

    files = sorted(glob.glob(os.path.join(args.data_dir, "*.npz")))
    assert files, f"no .npz latent shards under {args.data_dir}"

    def batches():
        while True:
            for f in files:
                d = np.load(f)
                lat, lab = d["latents"], d["labels"]
                for i in range(0, len(lat) - args.batch_size + 1, args.batch_size):
                    yield (jnp.asarray(lat[i:i + args.batch_size], jnp.float32),
                           jnp.asarray(lab[i:i + args.batch_size], jnp.int32))

    key = jax.random.PRNGKey(args.seed + 1)
    logger = MetricLogger()
    os.makedirs(args.output_dir, exist_ok=True)
    for it, (lat, lab) in logger.log_every(batches(), args.log_every, "DiT",
                                           total=args.max_iters):
        if it >= args.max_iters:
            break
        if loss_aware:
            state, ema, metrics, key, sampler_state = step(
                state, ema, lat, lab, key, sampler_state=sampler_state)
        else:
            state, ema, metrics, key = step(state, ema, lat, lab, key)
        logger.update(loss=float(metrics["loss"]), mse=float(metrics["mse"]))
        if (it + 1) % args.save_freq == 0:
            from accessory_tpu.checkpoint import save_checkpoint

            save_checkpoint(os.path.join(args.output_dir, f"iter{it+1}"),
                            {"model": state.params, "ema": ema})
    return state, ema


if __name__ == "__main__":
    main(get_args_parser().parse_args())
