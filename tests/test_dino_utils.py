"""Vendored DINO surface: cosine_scheduler, LARS, MultiCrop, DINOHead, meters."""

import numpy as np

import jax
import jax.numpy as jnp

from vit_ocm_wmsegmentation_tpu.train import dino
from vit_ocm_wmsegmentation_tpu.utils.meters import MetricLogger, SmoothedValue


def test_cosine_scheduler_matches_reference_formula():
    sched = dino.cosine_scheduler(1.0, 0.1, epochs=10, niter_per_ep=5, warmup_epochs=2,
                                  start_warmup_value=0.0)
    assert len(sched) == 50
    np.testing.assert_allclose(sched[:10], np.linspace(0, 1.0, 10))
    iters = np.arange(40)
    want = 0.1 + 0.5 * 0.9 * (1 + np.cos(np.pi * iters / 40))
    np.testing.assert_allclose(sched[10:], want)


def test_lars_step_direction_and_decay():
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    grads = {"w": jnp.full((4, 4), 0.5), "b": jnp.ones((4,))}
    tx = dino.lars(learning_rate=0.1, momentum=0.9, weight_decay=1e-4)
    state = tx.init(params)
    updates, state = tx.update(grads, state, params)
    # weights get trust-scaled, decayed updates; bias is plain momentum-sgd
    assert updates["w"].shape == (4, 4)
    np.testing.assert_allclose(np.asarray(updates["b"]), -0.1 * np.ones(4), atol=1e-7)
    # trust ratio = eta*||p||/||g+wd*p||
    g = 0.5 + 1e-4
    trust = 0.001 * 4.0 / (g * 4.0)
    np.testing.assert_allclose(np.asarray(updates["w"]), -0.1 * trust * g, rtol=1e-5)


def test_lars_matches_reference_under_varying_lr():
    """Multi-step trajectory against a transliteration of the reference
    optimizer (dino/utils.py:536-561): the momentum buffer is LR-FREE
    (mu = m*mu + dp; p -= lr*mu), so under a decaying schedule old
    gradients decay with the CURRENT lr. An implementation that folds lr
    into mu (mu = m*mu + lr*dp) agrees at step 0 and diverges from step 1
    on — this pins the reference form (r3 review finding)."""
    rng = np.random.default_rng(11)
    p0 = rng.normal(0, 1, (4, 4)).astype(np.float32)
    grads = [rng.normal(0, 1, (4, 4)).astype(np.float32) for _ in range(4)]
    lrs = [0.3, 0.1, 0.03, 0.01]
    m, wd, eta = 0.9, 1e-4, 0.001

    # reference transliteration (torch LARS.step, numpy)
    p_ref, mu = p0.copy(), np.zeros_like(p0)
    for lr, g in zip(lrs, grads):
        dp = g + wd * p_ref
        q = eta * np.linalg.norm(p_ref) / np.linalg.norm(dp)
        dp = dp * q
        mu = m * mu + dp
        p_ref = p_ref - lr * mu

    params = {"w": jnp.asarray(p0)}
    tx = dino.lars(learning_rate=lambda t: jnp.asarray(lrs)[t], momentum=m,
                   weight_decay=wd, eta=eta)
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = {"w": params["w"] + updates["w"]}
    np.testing.assert_allclose(np.asarray(params["w"]), p_ref, rtol=2e-5)


def test_multi_crop_groups_resolutions():
    calls = []

    def backbone(x):
        calls.append(x.shape)
        return jnp.mean(x, axis=(1, 2, 3))[:, None]

    crops = [jnp.ones((2, 8, 8, 3)), jnp.ones((2, 8, 8, 3)) * 2, jnp.ones((2, 4, 4, 3)) * 3]
    out = dino.multi_crop_forward(backbone, lambda h: h * 10, crops)
    assert out.shape == (6, 1)
    assert calls == [(4, 8, 8, 3), (2, 4, 4, 3)]  # same-res crops batched together
    np.testing.assert_allclose(np.asarray(out[:, 0]), [10, 10, 20, 20, 30, 30])


def test_dino_head_normalized_bottleneck():
    params = dino.dino_head_init(jax.random.PRNGKey(0), in_dim=16, out_dim=8,
                                 nlayers=3, hidden_dim=32, bottleneck_dim=12)
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (4, 16)).astype(np.float32))
    out = dino.dino_head_apply(params, x)
    assert out.shape == (4, 8)
    # weight-normalized last layer: scaling v must not change the output
    params2 = dict(params, last_v=params["last_v"] * 3.7)
    np.testing.assert_allclose(np.asarray(dino.dino_head_apply(params2, x)), np.asarray(out), atol=1e-5)


def test_smoothed_value_and_metric_logger():
    v = SmoothedValue(window_size=3)
    for x in (1, 2, 3, 4):
        v.update(x)
    assert v.value == 4 and v.median == 3 and v.global_avg == 2.5
    v.synchronize_between_processes()  # single-process no-op
    assert v.count == 4
    ml = MetricLogger()
    ml.update(loss=0.5, acc=0.9)
    assert "loss" in str(ml) and ml.loss.value == 0.5
    seen = list(ml.log_every(range(3), print_freq=10, header="t"))
    assert seen == [0, 1, 2]
