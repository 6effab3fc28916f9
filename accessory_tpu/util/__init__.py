"""Host-side utilities: logging/metrics, profiling, misc."""


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
