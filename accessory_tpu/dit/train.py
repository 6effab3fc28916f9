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
    return p


def make_dit_train_step(args_d, diffusion, tx, remat=True):
    from accessory_tpu.dit.model import dit_forward

    def loss_fn(params, latents, labels, t, key, cap_feats=None):
        loss, parts = diffusion.training_loss(
            lambda xt, tt, yy=labels: dit_forward(
                params, args_d, xt, tt, yy, cap_feats=cap_feats,
                remat=remat),
            latents, t, key)
        return loss, parts

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(state, ema, latents, labels, key, cap_feats=None):
        key, k_t, k_n, k_drop = jax.random.split(key, 4)
        b = latents.shape[0]
        t = jax.random.randint(k_t, (b,), 0, diffusion.num_timesteps)
        # CFG label dropout → null label (LabelEmbedder semantics); for T2I
        # the same dropout nulls the caption conditioning (Large-DiT-T2I
        # caption dropout role)
        drop = jax.random.uniform(k_drop, (b,)) < args_d.class_dropout_prob
        labels = jnp.where(drop, args_d.num_classes, labels)
        if cap_feats is not None:
            cap_feats = jnp.where(drop[:, None, None], 0.0, cap_feats)
        (loss, parts), grads = grad_fn(state.params, latents, labels, t, k_n,
                                       cap_feats)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        import optax

        params = optax.apply_updates(state.params, updates)
        from accessory_tpu.dit.diffusion import ema_update
        from accessory_tpu.train.train_step import TrainState

        ema = ema_update(ema, params)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state)
        return new_state, ema, {"loss": loss, **parts}, key

    return step


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
    step = jax.jit(make_dit_train_step(args_d, diffusion, tx))

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
        state, ema, metrics, key = step(state, ema, lat, lab, key)
        logger.update(loss=float(metrics["loss"]), mse=float(metrics["mse"]))
        if (it + 1) % args.save_freq == 0:
            from accessory_tpu.checkpoint import save_checkpoint

            save_checkpoint(os.path.join(args.output_dir, f"iter{it+1}"),
                            {"model": state.params, "ema": ema})
    return state, ema


if __name__ == "__main__":
    main(get_args_parser().parse_args())
