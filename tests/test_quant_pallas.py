"""Fused dequant+matmul Pallas kernel vs XLA reference (interpret mode on
CPU; the real-TPU run is exercised by bench/verify drives)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from accessory_tpu.ops.quant_matmul_pallas import quant_matmul_pallas
from accessory_tpu.quant.qtensor import dequantize_weight, quantize_weight


@pytest.mark.parametrize("m,k,n", [(8, 256, 128), (16, 512, 256), (100, 512, 384)])
def test_kernel_matches_xla_reference(m, k, n):
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    w = jax.random.normal(kw, (k, n), jnp.float32) * k ** -0.5
    qw = quantize_weight(w, bits=4, group_size=128, act_dtype=jnp.float32)
    x = jax.random.normal(kx, (m, k), jnp.float32)

    ref = jnp.dot(x, dequantize_weight(qw, jnp.float32))
    out = quant_matmul_pallas(x, qw, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    # tight check against an fp32 recompute of the same dequant math
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-2, atol=np.abs(np.asarray(ref)).max() * 1e-2)


def test_kernel_3d_input():
    w = jax.random.normal(jax.random.PRNGKey(1), (256, 128), jnp.float32) * 0.06
    qw = quantize_weight(w, bits=4, group_size=64, act_dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 256), jnp.float32)
    ref = jnp.einsum("bsk,kn->bsn", x, dequantize_weight(qw, jnp.float32))
    out = quant_matmul_pallas(x, qw, interpret=True)
    assert out.shape == (2, 5, 128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_dispatch_predicate():
    from accessory_tpu.quant.qtensor import quant_matmul

    # w3 must take the XLA path (and still be correct)
    w = jax.random.normal(jax.random.PRNGKey(3), (256, 128), jnp.float32) * 0.06
    qw3 = quantize_weight(w, bits=3, group_size=64, act_dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(4), (4, 256), jnp.float32)
    out = quant_matmul(x, qw3, use_pallas=True)  # falls back internally
    ref = jnp.dot(x, dequantize_weight(qw3, jnp.float32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)
