"""ViT depth encoder (models/vit.py): training/inference contracts match
the conv VAE's, and the tensor-parallel sharding map produces identical
outputs on the virtual multi-device mesh."""

import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aerial_gym_simulator_tpu.models.vae import vae_loss
from aerial_gym_simulator_tpu.models.vit import (DepthViT, ViTImageEncoder,
                                                 vit_tp_shardings)

HW = (135, 240)  # nav training render resolution; 15x15 patches of (9, 16)


def _init_model(latent=16, dim=32, depth=2, heads=4):
    model = DepthViT(latent_dim=latent, out_hw=HW, dim=dim, depth=depth,
                     num_heads=heads)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1,) + HW + (1,)), key)
    return model, params


def test_depth_vit_shapes_and_vae_loss_trainable():
    model, params = _init_model()
    key = jax.random.PRNGKey(1)
    x = jax.random.uniform(key, (3,) + HW + (1,))
    recon, mean, logvar = model.apply(params, x, key)
    assert recon.shape == (3,) + HW + (1,)
    assert mean.shape == (3, 16) and logvar.shape == (3, 16)
    # trains with the SAME loss as the conv VAE
    (loss, (bce, kld)), grads = jax.value_and_grad(
        lambda p: vae_loss(model, p, x, key), has_aux=True)(params)
    assert np.isfinite(float(loss))
    gmax = max(float(jnp.abs(g).max())
               for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gmax) and gmax > 0


def test_vit_image_encoder_resizes_and_encodes():
    enc = ViTImageEncoder(latent_dim=16, image_res=(270, 480), dim=32,
                          depth=2)
    # odd input resolution resizes to the patch-multiple grid
    imgs = jnp.ones((2, 100, 200), jnp.float32) * 0.5
    lat = enc.encode(imgs)
    assert lat.shape == (2, 16) and lat.dtype == jnp.float32
    assert np.isfinite(np.asarray(lat)).all()
    # sampled latent differs from the mean latent
    lat_s = enc.encode(imgs, key=jax.random.PRNGKey(3))
    assert not np.allclose(np.asarray(lat), np.asarray(lat_s))


def test_vit_tensor_parallel_matches_unsharded():
    """TP over heads/hidden: jit with sharded params == replicated params
    (XLA inserts the all-reduces; numerics identical to ~1e-5)."""
    if jax.device_count() < 2:
        pytest.skip("needs the multi-device virtual mesh")
    from jax.sharding import Mesh
    # heads must divide the TP axis: use 4 devices with 4 heads
    n_dev = 4 if jax.device_count() >= 4 else 2
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("env",))
    model, params = _init_model(heads=4)
    x = jax.random.uniform(jax.random.PRNGKey(2), (4,) + HW + (1,))

    def encode(p, x):
        return model.apply(p, x, method=DepthViT.encode)[0]

    ref = jax.jit(encode)(params, x)
    sharded_params = jax.device_put(params, vit_tp_shardings(params, mesh))
    out = jax.jit(encode)(sharded_params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # the map actually shards: a qkv kernel must live on >1 device
    qkv = sharded_params["params"]["encoder"]["block_0"]["attn"]["query"]["kernel"]
    assert len(qkv.sharding.device_set) == n_dev


def test_navigation_task_accepts_vit_params(tmp_path):
    """An arch-tagged ViT pickle routes the navigation task to the
    ViTImageEncoder and the fused step runs."""
    import aerial_gym_simulator_tpu as ag

    cfg = ag.task_registry.get_task_config("navigation_task")
    cfg.num_envs = 2
    model = DepthViT(latent_dim=cfg.latent_dim, out_hw=HW, dim=32, depth=1)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1,) + HW + (1,)), key)
    path = str(tmp_path / "vit.pkl")
    with open(path, "wb") as f:
        pickle.dump({"arch": "vit", "params": jax.device_get(params),
                     "patch": (9, 16), "dim": 32, "depth": 1,
                     "num_heads": 4}, f)
    cfg.vae_params_path = path
    task = ag.task_registry.make_task("navigation_task", num_envs=2,
                                      task_config=cfg)
    from aerial_gym_simulator_tpu.models.vit import ViTImageEncoder as VIE
    assert isinstance(task.vae, VIE)
    task.reset()
    obs, r, term, trunc, info = task.step(jnp.zeros((2, 4), jnp.float32))
    assert obs["observations"].shape == (2, cfg.observation_space_dim)
    assert np.isfinite(np.asarray(obs["observations"])).all()


def test_fused_attention_matches_flax_mha():
    """FusedAttention (flash-attention path, VERDICT r3 #6) with the
    CPU-runnable 'reference' impl — identical padding/segment handling as
    the TPU kernel — must match flax's nn.MultiHeadDotProductAttention on
    the SAME params (the param trees are bit-compatible by construction),
    including a seq length (225) that pads to the kernel's 128 block."""
    import flax.linen as nn

    from aerial_gym_simulator_tpu.models.vit import FusedAttention

    B, S, D, H = 2, 225, 64, 4
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (B, S, D), jnp.float32)

    flax_mha = nn.MultiHeadDotProductAttention(num_heads=H, qkv_features=D)
    params = flax_mha.init(jax.random.PRNGKey(4), x, x)
    ref = flax_mha.apply(params, x, x)

    fused = FusedAttention(dim=D, num_heads=H, impl="reference")
    out = fused.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_depth_vit_attn_impl_interchangeable():
    """A DepthViT checkpoint runs under either attention implementation
    with matching latents (attn_impl is a compute-path choice, not an
    architecture change)."""
    model, params = _init_model()
    model_ref = DepthViT(latent_dim=16, out_hw=HW, dim=32, depth=2,
                         num_heads=4, attn_impl="reference")
    x = jax.random.uniform(jax.random.PRNGKey(5), (2,) + HW + (1,))
    mean_a, logvar_a = model.apply(params, x, method=DepthViT.encode)
    mean_b, logvar_b = model_ref.apply(params, x, method=DepthViT.encode)
    np.testing.assert_allclose(np.asarray(mean_b), np.asarray(mean_a),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(logvar_b), np.asarray(logvar_a),
                               atol=5e-5)


def test_vit_remat_is_numerically_transparent():
    """remat=True (jax.checkpoint over transformer blocks — the memory
    lever that makes dim-512/depth-12 batch-1024 training fit, 5.17 GB
    vs OOM, PERF.md r5) must not change outputs, gradients, or the param
    tree."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from aerial_gym_simulator_tpu.models.vit import DepthViT

    kw = dict(latent_dim=8, out_hw=(36, 48), patch=(9, 16), dim=32,
              depth=2, num_heads=2)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (2, 36, 48, 1), jnp.float32)
    m_plain = DepthViT(remat=False, **kw)
    m_remat = DepthViT(remat=True, **kw)
    params = m_plain.init(key, x[:1], key)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(m_remat.init(key, x[:1], key)))

    def loss(model, p):
        mean, logvar = model.apply(p, x, method=DepthViT.encode)
        return jnp.sum(mean ** 2) + jnp.sum(logvar ** 2)

    l0, g0 = jax.value_and_grad(lambda p: loss(m_plain, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(m_remat, p))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
