"""Host-side utilities: logging/metrics, profiling, misc."""


def resolve_kv_dtype(kv_dtype, supports_int8: bool = True):
    """Default KV-cache dtype policy — int8 auto-on where it is measured best.

    Resolution order: an explicit ``kv_dtype`` wins; else env
    ``ACCESSORY_KV_DTYPE`` (the A/B flag — set ``fp`` to force bf16 pools);
    else **int8 on TPU** for modules that support it, fp elsewhere.

    The TPU default is int8 because it won every chip-measured config
    (BENCHMARKS.md round 4): 1k-ctx headline 5921-6064 vs 5838 bf16 tok/s,
    4k ctx 4414 vs 3873-4101, LLaMA2-7B +21.8% (MHA ⇒ KV-heavy). Parity is
    gated by tests/test_kv_int8.py + the on-chip verify_kv_int8 matrix step
    (max|logit d| ~0.05 on fixture models). CPU stays fp so parity suites
    compare exact math.
    """
    if kv_dtype is not None:
        return kv_dtype
    import os

    env = os.environ.get("ACCESSORY_KV_DTYPE")
    if env:
        return env
    import jax

    if supports_int8 and jax.default_backend() == "tpu":
        return "int8"
    return None


def remat_policy(remat):
    """Map a remat spec to a jax.checkpoint policy.

    True / "dots": save dot outputs with no batch dims — fastest recompute,
    highest memory (good to ~1B params on a 16GB chip).
    "full": save nothing, recompute the whole block in backward — the
    7B-on-16GB QPEFT regime, where the saved FFN intermediates alone
    (L x b x s x ffn_dim bf16) exceed HBM. Reference role: the
    checkpointing knob of accessory's main_finetune (--checkpointing).
    """
    import jax

    if remat == "full":
        return None
    # dots + the splash-attention output (named residual, see
    # ops.flash_attention): the splash forward is a custom call the dots
    # policy can't see, so without the name it reruns in backward —
    # 12 extra fwd kernels/step at 700M scale (trace, r4). Saving costs
    # b*s*nq*hd bf16 per layer (16.8 MB at the 700M bench shape).
    return jax.checkpoint_policies.save_from_both_policies(
        jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        jax.checkpoint_policies.save_only_these_names("splash_attn_out"),
    )
