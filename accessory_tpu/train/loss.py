"""Language-model loss.

Reference: accessory/model/meta.py:226-255 — CrossEntropyLoss(ignore_index=0)
over shifted (examples, labels), with a right-trim of all-pad label columns.
Under jit we keep static shapes and fold the trim into the mask (identical
value: ignored positions contribute 0 to both sum and count).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def cross_entropy_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_index: int = 0,
    shift: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked mean next-token CE.

    logits: (b, s, vocab) fp32; labels: (b, s) int, ALIGNED with the inputs
    (label[t] is the token at input position t; ignore_index = masked) — the
    reference dataset convention. With ``shift=True`` (default) we score
    logits[:, :-1] against labels[:, 1:], exactly the reference shift at
    meta.py forward (output[:, :-1] vs labels[:, 1:]). ``shift=False`` scores
    position-for-position (callers that pre-shifted themselves).
    Returns (scalar loss, valid-token count). Matches torch
    CrossEntropyLoss(ignore_index) reduction="mean" semantics.
    """
    if shift:
        logits = logits[:, :-1]
        labels = labels[:, 1:]
    mask = labels != ignore_index
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    safe_labels = jnp.where(mask, labels, 0)
    tok_lp = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    n = jnp.maximum(jnp.sum(mask), 1)
    loss = -jnp.sum(jnp.where(mask, tok_lp, 0.0)) / n
    return loss, jnp.sum(mask)
