"""Finetuning CLI.

Reference: accessory/main_finetune.py (arg parser :55-138, QPEFT build
:172-210, FSDP wrap :241-263, activation checkpointing :268-276, epoch loop
:329-357) + engine_finetune.py (step loop).

TPU mapping of the reference's switches:
  --data_parallel {ddp,sdp,fsdp} → mesh axes: ddp = dp only; fsdp/sdp = dp
    replaced by a parameter-sharding fsdp axis (GSPMD ZeRO-3)
  --model_parallel_size N        → tp axis size
  --checkpointing                → jax.checkpoint (remat) on the scan body
  --precision bf16               → param/activation dtype
  --quant + PEFT                 → QPEFT: W4 base + dense adapters

Run: python -m accessory_tpu.main_finetune --llama_type llama \
       --llama_config cfg.json --tokenizer_path tok.json \
       --data_config data.yaml --output_dir out [...]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def get_args_parser():
    p = argparse.ArgumentParser("accessory_tpu finetuning", add_help=False)
    p.add_argument("--batch_size", default=4, type=int,
                   help="per data-shard batch size")
    p.add_argument("--accum_iter", default=1, type=int)
    p.add_argument("--epochs", default=4, type=int)
    p.add_argument("--llama_type", default="llama", type=str)
    p.add_argument("--llama_config", nargs="*", default=[], type=str)
    p.add_argument("--tokenizer_path", type=str, required=True)
    p.add_argument("--pretrained_path", nargs="*", default=[], type=str)
    p.add_argument("--data_config", type=str, required=True)
    p.add_argument("--max_words", default=512, type=int)
    p.add_argument("--image_words", default=0, type=int)
    p.add_argument("--output_dir", default="./output", type=str)
    p.add_argument("--lr", type=float, default=2e-5)
    p.add_argument("--min_lr", type=float, default=0.0)
    p.add_argument("--warmup_epochs", type=float, default=1.0)
    p.add_argument("--weight_decay", type=float, default=0.02)
    p.add_argument("--clip_grad", type=float, default=2.0)
    p.add_argument("--data_parallel", choices=["ddp", "sdp", "fsdp"],
                   default="fsdp")
    p.add_argument("--model_parallel_size", type=int, default=1)
    p.add_argument("--precision", choices=["bf16", "fp32"], default="bf16")
    p.add_argument("--checkpointing", action="store_true")
    p.add_argument("--quant", action="store_true",
                   help="QPEFT: quantize the frozen base to W4")
    p.add_argument("--only_save_trainable", action="store_true")
    p.add_argument("--trainable_params", default=None, type=str,
                   help="substring filter for trainable params (full mode)")
    p.add_argument("--save_interval", default=1, type=int)
    p.add_argument("--save_iteration_interval", default=5000, type=int)
    p.add_argument("--auto_resume", action="store_true", default=True)
    p.add_argument("--resume", default=None, type=str)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_every", type=int, default=10)
    return p


def build_mesh(args):
    from accessory_tpu.parallel import make_mesh

    n = len(jax.devices())
    tp = args.model_parallel_size
    assert n % tp == 0, (n, tp)
    rest = n // tp
    if args.data_parallel == "ddp":
        return make_mesh({"dp": rest, "fsdp": 1, "tp": tp})
    return make_mesh({"dp": 1, "fsdp": rest, "tp": tp})


def main(args):
    from accessory_tpu.data import FinetuneDataset, FinetuneDistSampler
    from accessory_tpu.meta import MetaModel
    from accessory_tpu.models import get_model_module
    from accessory_tpu.quant import DEFAULT_BLOCKLIST, quantize_params
    from accessory_tpu.train import (
        TrainState, adjust_learning_rate_epoch, make_optimizer, make_train_step)
    from accessory_tpu.train.ckpt import (
        find_latest_checkpoint, resume_stage1, resume_stage2,
        save_train_checkpoint)
    from accessory_tpu.train.train_step import shard_train_state
    from accessory_tpu.util.logging import (
        MetricLogger, setup_for_distributed, write_log_line)

    setup_for_distributed(jax.process_index() == 0)
    os.makedirs(args.output_dir, exist_ok=True)
    print(f"devices: {jax.devices()}")

    dtype = "bfloat16" if args.precision == "bf16" else "float32"
    model = MetaModel(args.llama_type, list(args.llama_config),
                      args.tokenizer_path, max_seq_len=args.max_words,
                      seed=args.seed)
    model.args.dtype = dtype
    module = model.module

    # resume / pretrained weights (stage 1: before sharding)
    resume_dir = args.resume or (
        find_latest_checkpoint(args.output_dir) if args.auto_resume else None)
    start_epoch, start_iter = 0, 0
    if resume_dir:
        print(f"resuming weights from {resume_dir}")
        model.params = resume_stage1(resume_dir, model.params, dtype=dtype)
    elif args.pretrained_path:
        from accessory_tpu.checkpoint import load_checkpoint_list

        model.params = load_checkpoint_list(
            list(args.pretrained_path), model.params, dtype=dtype)

    # trainability + optional base quantization (QPEFT, reference :172-210)
    get_filter = getattr(module, "get_trainable_params_filter", None)
    trainable = get_filter(model.args) if get_filter else (lambda n: True)
    if args.trainable_params:
        subs = args.trainable_params.split(",")
        base_trainable = trainable
        trainable = lambda n: base_trainable(n) and any(s in n for s in subs)  # noqa: E731
    if args.quant:
        assert args.only_save_trainable, \
            "quant training requires --only_save_trainable (reference :175)"
        block = tuple(DEFAULT_BLOCKLIST) + tuple(model.get_quant_blocklist())
        model.params = quantize_params(model.params, bits=4, blocklist=block)

    # trainable params train in fp32 masters (reference
    # promote_trainable_params_to_fp32, tensor_type.py:60-66)
    from accessory_tpu.train.precision import promote_trainable_params_to_fp32

    model.params = promote_trainable_params_to_fp32(model.params, trainable)

    lr_args = argparse.Namespace(lr=args.lr, min_lr=args.min_lr,
                                 warmup_epochs=args.warmup_epochs,
                                 epochs=args.epochs)

    # dataset + sampler (grouped by type)
    dataset = FinetuneDataset(args.data_config, max_words=args.max_words,
                              image_words=args.image_words,
                              tokenizer=model.tokenizer)
    n_shards = jax.process_count()
    shard = jax.process_index()
    sampler = FinetuneDistSampler(dataset, num_replicas=n_shards, rank=shard,
                                  batch_size=args.batch_size,
                                  acc_grad=args.accum_iter, seed=args.seed)
    iters_per_epoch = len(sampler) // (args.batch_size * args.accum_iter)

    def lr_fn(step):
        return adjust_learning_rate_epoch(
            jnp.clip(step / max(iters_per_epoch, 1), 0, args.epochs), lr_args)

    tx = make_optimizer(model.params, lr_fn, weight_decay=args.weight_decay,
                        clip_norm=args.clip_grad, trainable=trainable)
    state = TrainState.create(model.params, tx)
    mesh = build_mesh(args)
    state = shard_train_state(state, module.param_axes(model.args), mesh)
    step_fn = jax.jit(make_train_step(
        module, model.args, tx, remat=args.checkpointing,
        accum_steps=args.accum_iter,
        moe_aux=args.llama_type.startswith("mixtral")))

    if resume_dir:
        state, meta_r, _ = resume_stage2(resume_dir, state)
        start_epoch = meta_r["epoch"]
        start_iter = meta_r["iter"]
        if start_iter == 0:
            start_epoch += 1

    tb = None
    try:
        from torch.utils.tensorboard import SummaryWriter

        tb = SummaryWriter(log_dir=args.output_dir)
    except Exception:
        pass

    def batches(epoch):
        sampler.set_epoch(epoch, start_iter if epoch == start_epoch else 0)
        buf_x, buf_y, buf_img = [], [], []
        per_step = args.batch_size * args.accum_iter
        for idx in iter(sampler):
            item = dataset[idx]
            buf_x.append(item[0])
            buf_y.append(item[1])
            if len(item) > 3:  # multimodal item carries an image
                buf_img.append(item[3])
            if len(buf_x) == per_step:
                out = {"examples": np.stack(buf_x), "labels": np.stack(buf_y)}
                if buf_img:
                    out["images"] = np.stack(buf_img)
                yield out
                buf_x, buf_y, buf_img = [], [], []

    for epoch in range(start_epoch, args.epochs):
        logger = MetricLogger()
        it = start_iter if epoch == start_epoch else 0
        for i, batch in logger.log_every(
                batches(epoch), args.log_every, f"Epoch [{epoch}]",
                start_iter=it, total=iters_per_epoch):
            state, metrics = step_fn(state, batch)
            c_loss = float(metrics["c_loss"])
            if not np.isfinite(c_loss):
                print("non-finite loss, aborting", force=True)
                raise SystemExit(1)
            logger.update(closs=c_loss, grad_norm=float(metrics["grad_norm"]),
                          lr=lr_fn(int(state.step)))
            if tb is not None:
                tb.add_scalar("c_train_loss", c_loss, int(state.step))
            if (i + 1) % args.save_iteration_interval == 0:
                save_train_checkpoint(
                    args.output_dir, state, args, epoch, i + 1,
                    model_args=model.args, llama_type=args.llama_type,
                    tokenizer=model.tokenizer, trainable_filter=trainable,
                    only_save_trainable=args.only_save_trainable,
                    data_shard_rank=shard)
        start_iter = 0
        if (epoch + 1) % args.save_interval == 0 or epoch + 1 == args.epochs:
            save_train_checkpoint(
                args.output_dir, state, args, epoch, None,
                model_args=model.args, llama_type=args.llama_type,
                tokenizer=model.tokenizer, trainable_filter=trainable,
                only_save_trainable=args.only_save_trainable,
                data_shard_rank=shard)
        write_log_line(args.output_dir, {
            "epoch": epoch, "closs": logger.meters["closs"].global_avg})
    return state


if __name__ == "__main__":
    parser = get_args_parser()
    main(parser.parse_args())
