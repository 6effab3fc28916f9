"""DiT sampling CLI: class-conditional generation with CFG.

Reference: Large-DiT-ImageNet/sample.py. Produces latents (decode with a VAE
offline); DDPM or DDIM.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def get_args_parser():
    p = argparse.ArgumentParser("DiT sampling", add_help=False)
    p.add_argument("--ckpt", required=True, type=str)
    p.add_argument("--labels", nargs="*", type=int, default=[0])
    p.add_argument("--cfg_scale", default=4.0, type=float)
    p.add_argument("--sampler", choices=["ddpm", "ddim"], default="ddim")
    p.add_argument("--steps", default=50, type=int)
    p.add_argument("--out", default="samples.npz", type=str)
    p.add_argument("--seed", default=0, type=int)
    # model shape (must match ckpt)
    p.add_argument("--dim", default=1152, type=int)
    p.add_argument("--n_layers", default=28, type=int)
    p.add_argument("--n_heads", default=16, type=int)
    p.add_argument("--input_size", default=32, type=int)
    p.add_argument("--num_classes", default=1000, type=int)
    return p


def sample(params, args_d, labels, cfg_scale=4.0, sampler="ddim", steps=50,
           seed=0):
    from accessory_tpu.dit.diffusion import GaussianDiffusion, cfg_model_fn
    from accessory_tpu.dit.model import dit_forward

    diffusion = GaussianDiffusion()
    y = jnp.asarray(labels, jnp.int32)
    b = y.shape[0]
    shape = (b, args_d.in_channels, args_d.input_size, args_d.input_size)

    base_fn = lambda x, t, yy: dit_forward(params, args_d, x, t, yy)  # noqa: E731
    guided = cfg_model_fn(base_fn, cfg_scale, args_d.num_classes)
    model_fn = lambda x, t: guided(x, t, y)  # noqa: E731

    key = jax.random.PRNGKey(seed)
    if sampler == "ddpm":
        return diffusion.p_sample_loop(model_fn, shape, key)
    return diffusion.ddim_sample_loop(model_fn, shape, key, steps=steps)


def main(args) -> None:
    from accessory_tpu.checkpoint import load_checkpoint
    from accessory_tpu.dit.model import DiTArgs

    args_d = DiTArgs(input_size=args.input_size, dim=args.dim,
                     n_layers=args.n_layers, n_heads=args.n_heads,
                     num_classes=args.num_classes)
    ckpt = load_checkpoint(args.ckpt)
    params = ckpt.get("ema", ckpt.get("model", ckpt))
    lat = sample(params, args_d, args.labels, args.cfg_scale, args.sampler,
                 args.steps, args.seed)
    np.savez(args.out, latents=np.asarray(lat))
    print(f"wrote {len(args.labels)} samples to {args.out}")


if __name__ == "__main__":
    main(get_args_parser().parse_args())
