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
    return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
