"""Large-DiT tests: adaLN-zero identity at init, training loss decreases,
DDPM/DDIM samplers produce finite latents, CFG wrapper, EMA, end-to-end
train CLI smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from accessory_tpu.dit.diffusion import (
    GaussianDiffusion,
    cfg_model_fn,
    ema_update,
)
from accessory_tpu.dit.model import DiTArgs, dit_forward, init_dit

TINY = DiTArgs(input_size=8, patch_size=2, in_channels=4, dim=64, n_layers=2,
               n_heads=4, num_classes=10, multiple_of=32)


def test_forward_shapes_and_adaln_zero():
    params = init_dit(jax.random.PRNGKey(0), TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 8))
    t = jnp.array([0, 500])
    y = jnp.array([3, 10])  # 10 = null label
    out = dit_forward(params, TINY, x, t, y)
    assert out.shape == (2, 8, 8, 8)  # out_channels = 2*4 (learned sigma)
    # adaLN-zero: gates are zero-init → blocks are identity and the
    # zero-init head makes the initial output exactly zero
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_q_sample_and_snr():
    diff = GaussianDiffusion(num_timesteps=100)
    x0 = jnp.ones((2, 4, 8, 8))
    noise = jax.random.normal(jax.random.PRNGKey(0), x0.shape)
    early = diff.q_sample(x0, jnp.array([5, 5]), noise)
    late = diff.q_sample(x0, jnp.array([95, 95]), noise)
    # later timesteps are noisier (less signal)
    assert float(jnp.mean((early - x0) ** 2)) < float(jnp.mean((late - x0) ** 2))


def test_training_loss_decreases():
    import optax

    params = init_dit(jax.random.PRNGKey(0), TINY)
    diff = GaussianDiffusion(num_timesteps=100)
    tx = optax.adamw(2e-3)
    opt = tx.init(params)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 8, 8))
    y = jnp.array([1, 2, 3, 4])

    @jax.jit
    def step(params, opt, key):
        k_t, k_n = jax.random.split(key)
        t = jax.random.randint(k_t, (4,), 0, 100)

        def loss_fn(p):
            loss, parts = diff.training_loss(
                lambda xt, tt: dit_forward(p, TINY, xt, tt, y), x0, t, k_n)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    losses = []
    key = jax.random.PRNGKey(2)
    for i in range(20):
        key, sub = jax.random.split(key)
        params, opt, loss = step(params, opt, sub)
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses


def test_samplers_run():
    params = init_dit(jax.random.PRNGKey(0), TINY)
    diff = GaussianDiffusion(num_timesteps=20)
    y = jnp.array([1, 2])
    fn = cfg_model_fn(lambda x, t, yy: dit_forward(params, TINY, x, t, yy),
                      guidance_scale=2.0, null_label=TINY.num_classes)
    model_fn = lambda x, t: fn(x, t, y)  # noqa: E731
    lat = diff.p_sample_loop(model_fn, (2, 4, 8, 8), jax.random.PRNGKey(3))
    assert lat.shape == (2, 4, 8, 8) and np.isfinite(np.asarray(lat)).all()
    lat2 = diff.ddim_sample_loop(model_fn, (2, 4, 8, 8),
                                 jax.random.PRNGKey(4), steps=5)
    assert np.isfinite(np.asarray(lat2)).all()


def test_ema_update():
    a = {"w": jnp.ones((4,))}
    b = {"w": jnp.zeros((4,))}
    out = ema_update(a, b, decay=0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.9)


def test_train_cli_smoke(tmp_path):
    from accessory_tpu.dit.train import get_args_parser, main

    lat = np.random.RandomState(0).randn(8, 4, 8, 8).astype(np.float32)
    lab = np.arange(8) % 4
    np.savez(tmp_path / "shard0.npz", latents=lat, labels=lab)

    args = get_args_parser().parse_args([
        "--data_dir", str(tmp_path), "--output_dir", str(tmp_path / "out"),
        "--dim", "64", "--n_layers", "2", "--n_heads", "4",
        "--input_size", "8", "--num_classes", "4", "--batch_size", "4",
        "--max_iters", "3", "--save_freq", "2", "--log_every", "1",
    ])
    state, ema = main(args)
    assert int(state.step) == 3
    import os

    assert os.path.isdir(tmp_path / "out" / "iter2")


def test_t2i_caption_conditioning():
    args = DiTArgs(input_size=8, patch_size=2, in_channels=4, dim=64,
                   n_layers=2, n_heads=4, num_classes=10, multiple_of=32,
                   cap_feat_dim=48)
    params = init_dit(jax.random.PRNGKey(0), args)
    assert "cap_embed" in params
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 8))
    t = jnp.array([10, 20])
    y = jnp.array([10, 10])  # null labels: caption-only conditioning
    caps = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 48))
    a = dit_forward(params, args, x, t, y, cap_feats=caps)
    b = dit_forward(params, args, x, t, y)
    assert a.shape == b.shape == (2, 8, 8, 8)
    # init is adaLN-zero so both are zero; open the final modulation + head
    # so the conditioning vector (and thus the caption) reaches the output
    params["final"]["linear"]["weight"] = (
        jnp.ones_like(params["final"]["linear"]["weight"]) * 0.01)
    params["final"]["ada"]["weight"] = (
        jnp.ones_like(params["final"]["ada"]["weight"]) * 0.01)
    a = dit_forward(params, args, x, t, y, cap_feats=caps)
    b = dit_forward(params, args, x, t, y)
    assert not np.allclose(np.asarray(a), np.asarray(b))
