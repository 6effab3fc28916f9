"""Native library tests: C implementations must match the numpy fallbacks."""

import numpy as np

from accessory_tpu import native


def test_native_builds():
    assert native.available(), "g++ build of native/packing.cc failed"


def test_pack_stream():
    toks = np.arange(37, dtype=np.int32)
    out = native.pack_stream(toks, 8)
    assert out.shape == (4, 8)
    np.testing.assert_array_equal(out.ravel(), toks[:32])


def test_pad_batch():
    items = [np.arange(3, dtype=np.int32), np.arange(10, dtype=np.int32),
             np.empty((0,), np.int32)]
    out = native.pad_batch(items, 6, pad_id=-1)
    np.testing.assert_array_equal(out[0], [0, 1, 2, -1, -1, -1])
    np.testing.assert_array_equal(out[1], [0, 1, 2, 3, 4, 5])
    np.testing.assert_array_equal(out[2], [-1] * 6)


def test_pack_unpack_u4_matches_quant_layout():
    from accessory_tpu.quant.qtensor import pack_int, unpack_int
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    q = rng.randint(0, 16, size=(64, 32)).astype(np.int32)
    packed_native = native.pack_u4(q)
    packed_jax = np.asarray(pack_int(jnp.asarray(q), 4))
    np.testing.assert_array_equal(packed_native, packed_jax)
    np.testing.assert_array_equal(native.unpack_u4(packed_native, 64), q)
