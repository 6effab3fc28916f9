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


def test_space_timesteps():
    from accessory_tpu.dit.diffusion import space_timesteps

    assert space_timesteps(1000, "ddim50") == set(range(0, 1000, 20))
    s = space_timesteps(300, [10, 15, 20])
    assert len(s) == 45
    assert space_timesteps(100, "10") == space_timesteps(100, [10])


def test_respaced_marginals_match():
    """Respacing must preserve alpha_cumprod at the kept timesteps
    (respace.py invariant) and remap model-facing t."""
    import numpy as np

    from accessory_tpu.dit.diffusion import GaussianDiffusion

    gd = GaussianDiffusion(num_timesteps=100, learn_sigma=False)
    sp = gd.respaced("ddim10")
    assert sp.num_timesteps == 10
    acp_full = np.asarray(gd.alphas_cumprod)
    acp_sp = np.asarray(sp.alphas_cumprod)
    for i, t in enumerate(np.asarray(sp.timestep_map)):
        np.testing.assert_allclose(acp_sp[i], acp_full[t], rtol=1e-5)


def test_vb_term_perfect_model_low_kl():
    """A model that predicts the exact noise and the true posterior variance
    should get a (near-)minimal VB term."""
    import numpy as np

    from accessory_tpu.dit.diffusion import GaussianDiffusion

    gd = GaussianDiffusion(num_timesteps=50, learn_sigma=True)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(2, 4, 8, 8).clip(-1, 1), jnp.float32)
    noise = jnp.asarray(rng.randn(2, 4, 8, 8), jnp.float32)
    t = jnp.array([10, 30], jnp.int32)
    xt = gd.q_sample(x0, t, noise)
    # perfect eps; var_raw=-1 selects the posterior variance exactly
    perfect = jnp.concatenate([noise, -jnp.ones_like(noise)], axis=1)
    vb_good = gd.vb_term(perfect, x0, xt, t)
    bad = jnp.concatenate([noise * 0.0, -jnp.ones_like(noise)], axis=1)
    vb_bad = gd.vb_term(bad, x0, xt, t)
    assert float(vb_good.mean()) < float(vb_bad.mean())
    assert float(vb_good.mean()) < 0.05  # near-zero KL in bits/dim


def test_training_loss_learned_sigma_finite_and_grad():
    from accessory_tpu.dit.diffusion import GaussianDiffusion

    gd = GaussianDiffusion(num_timesteps=20, learn_sigma=True)
    w = jnp.ones((4 * 2,)) * 0.1

    def model_fn(x, t, w):
        return jnp.repeat(x, 2, axis=1) * w.reshape(1, -1, 1, 1)

    def loss(w, key):
        x0 = jax.random.normal(key, (2, 4, 8, 8)).clip(-1, 1)
        t = jnp.array([3, 15], jnp.int32)
        l, aux = gd.training_loss(lambda x, tt: model_fn(x, tt, w), x0, t, key)
        return l

    g = jax.grad(loss)(w, jax.random.PRNGKey(0))
    assert jnp.isfinite(g).all()


def test_ddim_respaced_sampler_runs():
    from accessory_tpu.dit.diffusion import GaussianDiffusion

    gd = GaussianDiffusion(num_timesteps=40, learn_sigma=True).respaced("ddim8")

    def model_fn(x, t):
        return jnp.concatenate([x * 0.1, jnp.zeros_like(x)], axis=1)

    out = gd.ddim_sample_loop(model_fn, (2, 4, 8, 8), jax.random.PRNGKey(0))
    assert out.shape == (2, 4, 8, 8)
    assert jnp.isfinite(out).all()
    out2 = gd.p_sample_loop(model_fn, (2, 4, 8, 8), jax.random.PRNGKey(1))
    assert jnp.isfinite(out2).all()


def test_t2i_end_to_end_train_and_sample():
    """T2I conditioning end-to-end: caption-conditioned training steps
    reduce loss, then a caption-conditioned DDIM sample runs (Large-DiT-T2I
    role)."""
    import optax

    from accessory_tpu.dit.diffusion import GaussianDiffusion
    from accessory_tpu.dit.model import DiTArgs, dit_forward, init_dit
    from accessory_tpu.dit.train import make_dit_train_step
    from accessory_tpu.train.train_step import TrainState

    args = DiTArgs(input_size=8, patch_size=2, in_channels=4, dim=32,
                   n_layers=2, n_heads=4, num_classes=10, cap_feat_dim=16,
                   learn_sigma=True)
    params = init_dit(jax.random.PRNGKey(0), args)
    gd = GaussianDiffusion(num_timesteps=20, learn_sigma=True)
    tx = optax.adamw(1e-3)
    state = TrainState.create(params, tx)
    ema = jax.tree.map(lambda x: x, params)
    step = jax.jit(make_dit_train_step(args, gd, tx))

    rng = jax.random.PRNGKey(1)
    lat = jax.random.normal(rng, (4, 4, 8, 8)).clip(-1, 1)
    labels = jnp.array([1, 2, 3, 4], jnp.int32)
    caps = jax.random.normal(jax.random.PRNGKey(2), (4, 6, 16))
    def eval_loss(p):
        # deterministic probe: fixed t/noise key so progress is comparable
        gd2 = GaussianDiffusion(num_timesteps=20, learn_sigma=True)
        t = jnp.array([3, 8, 12, 17], jnp.int32)
        l, _ = gd2.training_loss(
            lambda xt, tt: dit_forward(p, args, xt, tt, labels,
                                       cap_feats=caps),
            lat, t, jax.random.PRNGKey(42))
        return float(l)

    before = eval_loss(state.params)
    key = jax.random.PRNGKey(3)
    for _ in range(25):
        state, ema, m, key = step(state, ema, lat, labels, key, caps)
    assert eval_loss(state.params) < before

    # caption-conditioned sampling (respaced DDIM)
    sp = gd.respaced("ddim5")
    out = sp.ddim_sample_loop(
        lambda x, t: dit_forward(
            state.params, args, x, t, jnp.array([1, 2], jnp.int32),
            cap_feats=caps[:2]),
        (2, 4, 8, 8), jax.random.PRNGKey(4))
    assert out.shape == (2, 4, 8, 8) and jnp.isfinite(out).all()


# ---------------------------------------------------------------------------
# loss-aware timestep sampling (reference timestep_sampler.py:71-150)
# ---------------------------------------------------------------------------

def test_loss_second_moment_matches_numpy_reference():
    """Circular-buffer update == the reference's shift-out-oldest buffer
    (statistics are order-free: weights read only mean(history**2))."""
    from accessory_tpu.dit.timestep_sampler import (
        init_sampler_state, sampler_weights, update_sampler_state)

    T, H = 7, 3
    rng = np.random.RandomState(0)
    state = init_sampler_state(T, H)
    # numpy re-implementation of LossSecondMomentResampler.update/weights
    hist = np.zeros((T, H)); counts = np.zeros(T, np.int64)
    for _ in range(9):
        t = rng.randint(0, T, size=(5,))
        losses = rng.uniform(0.1, 2.0, size=(5,)).astype(np.float32)
        state = update_sampler_state(state, jnp.asarray(t), jnp.asarray(losses))
        for ti, li in zip(t, losses):  # reference loop, shift semantics
            if counts[ti] == H:
                hist[ti, :-1] = hist[ti, 1:]; hist[ti, -1] = li
            else:
                hist[ti, counts[ti]] = li; counts[ti] += 1
        warmed = (counts == H).all()
        w = np.sqrt(np.mean(hist ** 2, axis=-1))
        if warmed:
            w = w / w.sum(); w = w * (1 - 0.001) + 0.001 / T
        else:
            w = np.ones(T) / T
        np.testing.assert_allclose(np.asarray(sampler_weights(state)), w,
                                   rtol=1e-5)


def test_loss_aware_sampler_concentrates_and_unbiased():
    """After warmup on a loss landscape where late timesteps hurt more,
    sampling concentrates there while the 1/(T p) weights keep the
    objective unbiased (reference sample():53-58)."""
    from accessory_tpu.dit.timestep_sampler import (
        init_sampler_state, sample_timesteps, sampler_weights,
        update_sampler_state)

    T, H, B = 16, 4, 64
    state = init_sampler_state(T, H)
    key = jax.random.PRNGKey(0)

    def loss_of(t):  # late half is 9x the early half in RMS
        return jnp.where(t >= T // 2, 3.0, 1.0)

    for i in range(12):
        key, sub = jax.random.split(key)
        t, w = sample_timesteps(state, sub, B)
        state = update_sampler_state(state, t, loss_of(t))
    p = np.asarray(sampler_weights(state))
    assert p.sum() == pytest.approx(1.0, rel=1e-5)
    assert p[T // 2:].sum() > 0.70, p     # concentrated on the lossy half
    assert (p > 0).all()                  # uniform_prob floor: no starvation
    # unbiasedness: E_p[w * f(t)] == uniform mean of f for any f
    key, sub = jax.random.split(key)
    t, w = sample_timesteps(state, sub, 200_000)
    f = loss_of(t)
    est = float(jnp.mean(w * f))
    truth = float(jnp.mean(loss_of(jnp.arange(T))))
    assert est == pytest.approx(truth, rel=0.05), (est, truth)
    np.testing.assert_allclose(np.asarray(w),
                               1.0 / (T * p[np.asarray(t)]), rtol=1e-5)


def test_dit_train_step_loss_aware_converges():
    """make_dit_train_step(schedule_sampler='loss-second-moment') runs
    jitted end-to-end, threads the sampler state, and still reduces the
    loss (convergence sanity)."""
    import optax

    from accessory_tpu.dit.train import make_dit_train_step
    from accessory_tpu.train.train_step import TrainState

    params = init_dit(jax.random.PRNGKey(0), TINY)
    diff = GaussianDiffusion(num_timesteps=20)
    tx = optax.adamw(2e-3)
    state = TrainState.create(params, tx)
    ema = jax.tree.map(lambda x: x.astype(jnp.float32), params)
    step_fn, sstate = make_dit_train_step(
        TINY, diff, tx, schedule_sampler="loss-second-moment")
    step = jax.jit(step_fn)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 8, 8))
    y = jnp.array([1, 2, 3, 4])
    key = jax.random.PRNGKey(2)
    losses = []
    for i in range(20):
        state, ema, metrics, key, sstate = step(state, ema, x0, y, key,
                                                sampler_state=sstate)
        losses.append(float(metrics["loss"]))
    assert int(sstate.counts.sum()) == 20 * 4
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses
