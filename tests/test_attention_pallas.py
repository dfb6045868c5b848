"""Differential tests for the in-repo short-seq fused attention kernel
(ops/attention_pallas.py) — interpret mode vs the pure-XLA oracle, values
AND gradients, plus the ViT integration (attn_impl='fused' matches 'xla'
on the same checkpoint). Same lockstep discipline as the ray-cast kernel
(CLAUDE.md renderer invariant)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aerial_gym_simulator_tpu.ops.attention_pallas import (
    attention_oracle, fused_attention)


def _qkv(key, b, s, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    mk = lambda k: jax.random.normal(k, (b, s, d), jnp.float32).astype(dtype)
    return mk(kq), mk(kk), mk(kv)


@pytest.mark.parametrize("b,s,d,h", [(2, 128, 64, 2),   # no padding
                                     (2, 100, 64, 4),   # padded 100->128
                                     (1, 225, 128, 4)]) # the ViT shape
def test_fused_matches_oracle_f32(b, s, d, h):
    q, k, v = _qkv(jax.random.PRNGKey(0), b, s, d)
    out = fused_attention(q, k, v, h, interpret=True)
    ref = attention_oracle(q, k, v, h)
    assert out.shape == (b, s, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_matches_oracle_bf16():
    """Training runs the kernel on bf16 activations; tolerance covers the
    different accumulation orders (whole-row vs oracle einsum)."""
    q, k, v = _qkv(jax.random.PRNGKey(1), 2, 225, 128, jnp.bfloat16)
    out = fused_attention(q, k, v, 4, interpret=True)
    ref = attention_oracle(q, k, v, 4)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05)


def test_fused_gradients_match_oracle():
    """custom_vjp (recompute-in-backward kernel) vs jax.grad through the
    oracle — dq, dk, dv all match. This is the training hot path
    (vae_loss gradients through every encoder block)."""
    b, s, d, h = 2, 100, 64, 4
    q, k, v = _qkv(jax.random.PRNGKey(2), b, s, d)
    tgt = jax.random.normal(jax.random.PRNGKey(3), (b, s, d), jnp.float32)

    def loss_fused(q, k, v):
        return jnp.sum((fused_attention(q, k, v, h, interpret=True)
                        - tgt) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum((attention_oracle(q, k, v, h) - tgt) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, gf, gr in zip("qkv", g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"d{name} mismatch")


def test_padding_mask_survives_adversarial_magnitudes():
    """The -1e30 key mask must hold even when REAL logits are large (big
    activations x big scale): padded keys stay at zero probability, every
    output row stays finite, and the padded call still matches the oracle
    on the real tokens. Also checks gradients stay finite at those
    magnitudes (the finite-minus-infinity design exists exactly so zero
    cotangents in the padded region can't breed NaNs — see _NEG_BIG)."""
    b, s, d, h = 1, 96, 64, 2
    q, k, v = _qkv(jax.random.PRNGKey(4), b, s, d)
    q, k = q * 30.0, k * 30.0  # logits O(1e3) before scaling
    out = fused_attention(q, k, v, h, interpret=True)
    ref = attention_oracle(q, k, v, h)
    assert bool(jnp.isfinite(out).all())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    def loss(q, k, v):
        return jnp.sum(fused_attention(q, k, v, h, interpret=True) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert all(bool(jnp.isfinite(g).all()) for g in grads)


def test_vit_fused_impl_matches_xla_checkpoint():
    """DepthViT(attn_impl='fused') produces the same encoder outputs as
    attn_impl='xla' from the SAME params — checkpoints trained on either
    path load on the other (the bit-compat contract that lets the shipped
    artifacts replay anywhere)."""
    from aerial_gym_simulator_tpu.models.vit import DepthViT

    key = jax.random.PRNGKey(5)
    x = jax.random.uniform(key, (2, 36, 48, 1), jnp.float32)
    kw = dict(latent_dim=8, out_hw=(36, 48), patch=(9, 16), dim=32,
              depth=2, num_heads=2)
    m_xla = DepthViT(attn_impl="xla", **kw)
    m_fused = DepthViT(attn_impl="fused", **kw)
    params = m_xla.init(key, x[:1], key)
    mean_x, logv_x = m_xla.apply(params, x, method=DepthViT.encode)
    mean_f, logv_f = m_fused.apply(params, x, method=DepthViT.encode)
    np.testing.assert_allclose(np.asarray(mean_f), np.asarray(mean_x),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logv_f), np.asarray(logv_x),
                               rtol=2e-4, atol=2e-4)


def test_vit_fused_gradients_finite_and_close():
    """vae_loss-style gradient through the fused encoder: finite and close
    to the xla-attention gradient on the same params (the e2e training
    contract for scripts/train_vit_nav_e2e.sh --vit_attn fused)."""
    from aerial_gym_simulator_tpu.models.vit import DepthViT

    key = jax.random.PRNGKey(6)
    x = jax.random.uniform(key, (2, 36, 48, 1), jnp.float32)
    kw = dict(latent_dim=8, out_hw=(36, 48), patch=(9, 16), dim=32,
              depth=1, num_heads=2)

    def mk_loss(impl):
        model = DepthViT(attn_impl=impl, **kw)

        def loss(p):
            mean, logvar = model.apply(p, x, method=DepthViT.encode)
            return jnp.sum(mean ** 2) + jnp.sum(logvar ** 2)
        return model, loss

    m_xla, loss_xla = mk_loss("xla")
    _, loss_fused = mk_loss("fused")
    params = m_xla.init(key, x[:1], key)
    g_x = jax.grad(loss_xla)(params)
    g_f = jax.grad(loss_fused)(params)
    lx = jax.tree_util.tree_leaves(g_x)
    lf = jax.tree_util.tree_leaves(g_f)
    assert all(bool(jnp.isfinite(g).all()) for g in lf)
    for a, b in zip(lf, lx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)
