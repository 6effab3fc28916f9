"""Magic-number W4 kernel tests (interpret mode): kernel vs dequant oracle,
layout conversion, end-to-end llama forward with magic-layout weights."""

import jax
import jax.numpy as jnp
import numpy as np

from accessory_tpu.ops.quant_matmul_magic import (
    magic_constants,
    magic_qmm,
    repack_for_magic,
)
from accessory_tpu.quant.qtensor import (
    dequantize_weight,
    quantize_weight,
    to_magic_layout,
)


def test_magic_matches_dequant_oracle():
    K, N, M, TK = 1024, 256, 8, 512
    w = jax.random.normal(jax.random.PRNGKey(0), (K, N), jnp.float32) * K ** -0.5
    qw = quantize_weight(w, bits=4, group_size=128, act_dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.float32)

    pm = repack_for_magic(qw.packed, K, TK)
    s2, z2 = magic_constants(qw.scales, qw.zeros)
    out = magic_qmm(x, pm, s2, z2, group_size=128, tk=TK, interpret=True)
    ref = jnp.dot(x, dequantize_weight(qw, jnp.float32))
    rel = float(jnp.max(jnp.abs(out - ref))) / float(jnp.max(jnp.abs(ref)))
    assert rel < 5e-3, rel


def test_to_magic_layout_and_model_forward():
    from accessory_tpu.config import LLaMAArgs
    from accessory_tpu.models import llama
    from accessory_tpu.quant import quantize_params

    args = LLaMAArgs(dim=512, n_layers=2, n_heads=4, n_kv_heads=2,
                     vocab_size=128, multiple_of=256, max_seq_len=16,
                     dtype="float32")
    params = llama.init_params(jax.random.PRNGKey(0), args)
    qp = quantize_params(params, bits=4, group_size=128)
    toks = jnp.arange(8)[None] % 128
    ref, _ = llama.forward(qp, args, toks)

    def to_magic(leaf):
        if hasattr(leaf, "layout") and leaf.layout == "std" and leaf.bits == 4:
            return to_magic_layout(leaf)
        return leaf

    mp = jax.tree.map(to_magic, qp,
                      is_leaf=lambda x: hasattr(x, "packed"))
    qwm = mp["layers"]["attention"]["wq"]["weight"]
    assert qwm.layout == "magic" and qwm.tile_k > 0

    out, _ = llama.forward(mp, args, toks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-3, atol=5e-2)
