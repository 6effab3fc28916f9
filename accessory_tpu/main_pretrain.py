"""Pretraining CLI.

Reference: accessory/main_pretrain.py (arg parser :54-122, iter-based LR,
packed/vanilla dataset switch :226-235, single long epoch :274-279) +
engine_pretrain.py (iter-state tracking for resume :84-90, periodic save
:93-97, in-loop validation :100-105).
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import jax
import numpy as np


def get_args_parser():
    p = argparse.ArgumentParser("accessory_tpu pretraining", add_help=False)
    p.add_argument("--batch_size", default=8, type=int)
    p.add_argument("--accum_iter", default=1, type=int)
    p.add_argument("--llama_type", default="llama", type=str)
    p.add_argument("--llama_config", nargs="*", default=[], type=str)
    p.add_argument("--tokenizer_path", type=str, required=True)
    p.add_argument("--pretrained_path", nargs="*", default=[], type=str)
    p.add_argument("--data_meta_path", type=str, required=True,
                   help="directory of parquet shards (or packed .pkl)")
    p.add_argument("--packed_data", action="store_true")
    p.add_argument("--max_words", default=2048, type=int)
    p.add_argument("--output_dir", default="./output", type=str)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--min_lr", type=float, default=3e-5)
    p.add_argument("--warmup_iters", type=int, default=2000)
    p.add_argument("--lr_decay_iters", type=int, default=400000)
    p.add_argument("--max_iters", type=int, default=400000)
    p.add_argument("--weight_decay", type=float, default=0.1)
    p.add_argument("--clip_grad", type=float, default=1.0)
    p.add_argument("--data_parallel", choices=["ddp", "sdp", "fsdp"],
                   default="fsdp")
    p.add_argument("--model_parallel_size", type=int, default=1)
    p.add_argument("--precision", choices=["bf16", "fp32"], default="bf16")
    p.add_argument("--checkpointing", action="store_true")
    p.add_argument("--save_freq", type=int, default=5000)
    p.add_argument("--val_freq", type=int, default=5000)
    p.add_argument("--val_iters", type=int, default=20)
    p.add_argument("--auto_resume", action="store_true", default=True)
    p.add_argument("--resume", default=None, type=str)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_every", type=int, default=10)
    return p


def main(args):
    from accessory_tpu.data import Falcon, FalconPacked
    from accessory_tpu.data.falcon import batched
    from accessory_tpu.meta import MetaModel
    from accessory_tpu.train import (
        TrainState, adjust_learning_rate, make_optimizer, make_train_step)
    from accessory_tpu.train.ckpt import (
        find_latest_checkpoint, resume_stage1, resume_stage2,
        save_train_checkpoint)
    from accessory_tpu.train.train_step import shard_train_state
    from accessory_tpu.main_finetune import build_mesh
    from accessory_tpu.util.logging import (
        MetricLogger, setup_for_distributed, write_log_line)

    setup_for_distributed(jax.process_index() == 0)
    os.makedirs(args.output_dir, exist_ok=True)
    dtype = "bfloat16" if args.precision == "bf16" else "float32"
    model = MetaModel(args.llama_type, list(args.llama_config),
                      args.tokenizer_path, max_seq_len=args.max_words,
                      seed=args.seed)
    model.args.dtype = dtype
    module = model.module

    resume_dir = args.resume or (
        find_latest_checkpoint(args.output_dir) if args.auto_resume else None)
    if resume_dir:
        model.params = resume_stage1(resume_dir, model.params, dtype=dtype)
    elif args.pretrained_path:
        from accessory_tpu.checkpoint import load_checkpoint_list

        model.params = load_checkpoint_list(
            list(args.pretrained_path), model.params, dtype=dtype)

    lr_args = args

    def lr_fn(step):
        return adjust_learning_rate(step, lr_args)

    tx = make_optimizer(model.params, lr_fn, weight_decay=args.weight_decay,
                        clip_norm=args.clip_grad)
    state = TrainState.create(model.params, tx)
    mesh = build_mesh(args)
    state = shard_train_state(state, module.param_axes(model.args), mesh)
    step_fn = jax.jit(make_train_step(
        module, model.args, tx, remat=args.checkpointing,
        accum_steps=args.accum_iter,
        moe_aux=args.llama_type.startswith("mixtral")))

    shard, n_shards = jax.process_index(), jax.process_count()
    ds_cls = FalconPacked if args.packed_data else Falcon
    kwargs = {} if args.packed_data else {
        "max_words": args.max_words, "tokenizer": model.tokenizer}
    train_ds = ds_cls(args.data_meta_path, rank=shard, num_shards=n_shards,
                      split="train", **kwargs)
    val_ds = ds_cls(args.data_meta_path, rank=0, num_shards=1, split="val",
                    **kwargs)

    start_it = 0
    if resume_dir:
        state, meta_r, ds_state = resume_stage2(resume_dir, state,
                                                data_shard_rank=shard)
        start_it = meta_r["iter"]
        if ds_state:
            train_ds.load_state_dict(ds_state)

    def lm_batch(tokens):
        # labels aligned with inputs (pad=0 masked); the loss applies the
        # next-token shift itself (reference meta.py: output[:,:-1] vs
        # labels[:,1:])
        return {"examples": tokens, "labels": tokens.copy()}

    logger = MetricLogger()
    loader = batched(iter(train_ds), args.batch_size * args.accum_iter)
    for it, tokens in logger.log_every(loader, args.log_every, "Pretrain",
                                       start_iter=start_it,
                                       total=args.max_iters):
        if it >= args.max_iters:
            break
        state, metrics = step_fn(state, lm_batch(tokens))
        c_loss = float(metrics["c_loss"])
        if not np.isfinite(c_loss):
            print("non-finite loss, aborting", force=True)
            raise SystemExit(1)
        logger.update(closs=c_loss, lr=lr_fn(int(state.step)))

        if (it + 1) % args.save_freq == 0:
            save_train_checkpoint(
                args.output_dir, state, args, 0, it + 1,
                model_args=model.args, llama_type=args.llama_type,
                tokenizer=model.tokenizer,
                dataset_state=train_ds.state_dict(), data_shard_rank=shard)
        if (it + 1) % args.val_freq == 0:
            vlosses = []
            for vi, vtok in enumerate(batched(iter(val_ds), args.batch_size)):
                if vi >= args.val_iters:
                    break
                vb = lm_batch(vtok)
                from accessory_tpu.train.loss import cross_entropy_loss

                logits, _ = module.forward(state.params, model.args,
                                           vb["examples"])
                vl, _ = cross_entropy_loss(logits, vb["labels"])
                vlosses.append(float(vl))
            print(f"val loss @ {it + 1}: {np.mean(vlosses):.4f}")
            write_log_line(args.output_dir,
                           {"iter": it + 1, "val_loss": float(np.mean(vlosses))})
    return state


if __name__ == "__main__":
    parser = get_args_parser()
    main(parser.parse_args())
