"""MoE op tests: ragged (grouped GEMM) vs dense (one-hot) dispatch exactness,
gating semantics, load-balancing loss value."""

import jax
import jax.numpy as jnp
import numpy as np

from accessory_tpu.ops.moe import (
    load_balancing_loss,
    moe_ffn_dense,
    moe_ffn_ragged,
    topk_gating,
)

T, D, H, E, K = 24, 32, 48, 4, 2


def make_weights(key):
    ks = jax.random.split(key, 4)
    gate = jax.random.normal(ks[0], (D, E), jnp.float32) * 0.1
    w1 = jax.random.normal(ks[1], (E, D, H), jnp.float32) * D ** -0.5
    w3 = jax.random.normal(ks[2], (E, D, H), jnp.float32) * D ** -0.5
    w2 = jax.random.normal(ks[3], (E, H, D), jnp.float32) * H ** -0.5
    return gate, w1, w3, w2


def reference_moe(x, gate_w, w1, w3, w2, k):
    """Straight NumPy per-token loop — mirrors the reference's python loop
    over experts (mixtral.py:283-289)."""
    xn = np.asarray(x, np.float32)
    logits = xn @ np.asarray(gate_w)
    scores = np.exp(logits - logits.max(-1, keepdims=True))
    scores /= scores.sum(-1, keepdims=True)
    out = np.zeros_like(xn)
    for t in range(xn.shape[0]):
        idx = np.argsort(-scores[t])[:k]
        w = scores[t, idx] / scores[t, idx].sum()
        for j, e in enumerate(idx):
            hidden = (xn[t] @ np.asarray(w1[e]))
            hidden = hidden / (1 + np.exp(-hidden)) * (xn[t] @ np.asarray(w3[e]))
            out[t] += w[j] * (hidden @ np.asarray(w2[e]))
    return out


def test_ragged_matches_dense_and_reference():
    x = jax.random.normal(jax.random.PRNGKey(1), (T, D), jnp.float32)
    gate, w1, w3, w2 = make_weights(jax.random.PRNGKey(2))
    yr, _ = moe_ffn_ragged(x, gate, w1, w3, w2, k=K)
    yd, _ = moe_ffn_dense(x, gate, w1, w3, w2, k=K)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(yd), rtol=1e-4, atol=1e-4)
    ref = reference_moe(x, gate, w1, w3, w2, K)
    np.testing.assert_allclose(np.asarray(yr), ref, rtol=1e-3, atol=1e-3)


def test_gating_renormalizes():
    x = jax.random.normal(jax.random.PRNGKey(3), (T, D), jnp.float32)
    gate, *_ = make_weights(jax.random.PRNGKey(4))
    w, idx, scores = topk_gating(x, gate, K)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), np.ones(T), rtol=1e-5)
    assert idx.shape == (T, K)
    np.testing.assert_allclose(np.asarray(scores.sum(-1)), np.ones(T), rtol=1e-5)


def test_balance_loss_uniform_routing():
    # scores uniform → mean score 1/E per expert; topk picks K experts
    # per token → counts sum T*K. loss = w*E/(T*K) * (T*K/E terms...)
    scores = jnp.full((T, E), 1.0 / E)
    idx = jnp.stack([jnp.arange(T) % E, (jnp.arange(T) + 1) % E], axis=1)
    loss = load_balancing_loss(scores, idx, E, K, weight=0.01)
    # perfectly uniform: loss = w * E/(T*K) * sum_e((T*K/E) * (1/E)) = w
    np.testing.assert_allclose(float(loss), 0.01, rtol=1e-5)


def test_moe_quant_unstacked_experts_parity():
    """Tuple-of-per-expert quant weights == stacked quant weights."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from accessory_tpu.ops.moe import _qw_index, moe_ffn
    from accessory_tpu.quant.qtensor import quantize_weight

    rng = np.random.RandomState(0)
    E, D, H, T = 4, 64, 96, 6
    x = jnp.asarray(rng.standard_normal((T, D)), jnp.float32)
    gate_w = jnp.asarray(rng.standard_normal((D, E)), jnp.float32)

    def qstack(k_in, k_out):
        ws = [quantize_weight(
            jnp.asarray(rng.standard_normal((k_in, k_out)) * 0.05,
                        jnp.float32), bits=4, group_size=32)
            for _ in range(E)]
        stacked = type(ws[0])(
            packed=jnp.stack([w.packed for w in ws]),
            scales=jnp.stack([w.scales for w in ws]),
            zeros=jnp.stack([w.zeros for w in ws]),
            bits=4, group_size=32, in_dim=k_in, out_dim=k_out,
            act_dtype=ws[0].act_dtype, layout=ws[0].layout,
            tile_k=ws[0].tile_k)
        return stacked

    q1, q3, q2 = qstack(D, H), qstack(D, H), qstack(H, D)
    y_stacked, _ = moe_ffn(x, gate_w, q1, q3, q2, k=2)
    split = lambda q: tuple(_qw_index(q, e) for e in range(E))
    y_tuple, _ = moe_ffn(x, gate_w, split(q1), split(q3), split(q2), k=2)
    np.testing.assert_array_equal(np.asarray(y_stacked), np.asarray(y_tuple))
