"""Depth-image VAE — frozen perception backbone for the navigation task.

Capability parity with the reference's ResNet8-style depth VAE
(aerial_gym/utils/vae/VAE.py: conv encoder with skip connections -> 64-d
latent, deconv decoder; VAEImageEncoder wrapper with resolution
interpolation, vae_image_encoder.py:18-77). TPU-first: NHWC layout, conv
stacks sized to keep the MXU busy, bf16-friendly. Weights are trained with
rl/train_vae.py on rendered depth images from the randomized obstacle envs
(the reference ships a .pth trained exactly that way).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class Encoder(nn.Module):
    latent_dim: int = 64

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, 1) in [0, 1]
        act = nn.elu
        x0 = act(nn.Conv(32, (5, 5), strides=2, padding="SAME")(x))
        x1 = act(nn.Conv(32, (3, 3), strides=2, padding="SAME")(x0))
        # residual block 1
        y = act(nn.Conv(32, (5, 5), strides=2, padding="SAME")(x1))
        y = nn.Conv(64, (3, 3), strides=1, padding="SAME")(y)
        skip = nn.Conv(64, (4, 4), strides=2, padding="SAME")(x1)
        x2 = act(y + skip)
        # residual block 2
        y = act(nn.Conv(64, (5, 5), strides=2, padding="SAME")(x2))
        y = nn.Conv(128, (3, 3), strides=2, padding="SAME")(y)
        skip = nn.Conv(128, (5, 5), strides=4, padding="SAME")(x2)
        x3 = act(y + skip)
        x4 = act(nn.Conv(128, (5, 5), strides=2, padding="SAME")(x3))
        flat = x4.reshape((x4.shape[0], -1))
        h = act(nn.Dense(512)(flat))
        out = nn.Dense(2 * self.latent_dim)(h)
        mean, logvar = jnp.split(out, 2, axis=-1)
        return mean, jnp.clip(logvar, -10.0, 10.0)


class Decoder(nn.Module):
    latent_dim: int = 64
    out_hw: Tuple[int, int] = (270, 480)

    @nn.compact
    def __call__(self, z):
        act = nn.relu
        h0, w0 = 9, 15
        x = act(nn.Dense(512)(z))
        x = nn.Dense(h0 * w0 * 128)(x)
        x = x.reshape((-1, h0, w0, 128))
        x = act(nn.ConvTranspose(128, (3, 3), strides=(1, 1), padding="SAME")(x))
        x = act(nn.ConvTranspose(64, (5, 5), strides=(2, 2), padding="SAME")(x))
        x = act(nn.ConvTranspose(32, (6, 6), strides=(4, 4), padding="SAME")(x))
        x = act(nn.ConvTranspose(16, (6, 6), strides=(2, 2), padding="SAME")(x))
        x = nn.ConvTranspose(1, (4, 4), strides=(2, 2), padding="SAME")(x)
        x = jax.image.resize(x, (x.shape[0],) + self.out_hw + (1,), "bilinear")
        return nn.sigmoid(x)


class DepthVAE(nn.Module):
    latent_dim: int = 64
    out_hw: Tuple[int, int] = (270, 480)

    def setup(self):
        self.encoder = Encoder(self.latent_dim)
        self.decoder = Decoder(self.latent_dim, self.out_hw)

    def __call__(self, x, key):
        mean, logvar = self.encoder(x)
        std = jnp.exp(0.5 * logvar)
        z = mean + std * jax.random.normal(key, mean.shape, mean.dtype)
        recon = self.decoder(z)
        return recon, mean, logvar

    def encode(self, x):
        return self.encoder(x)

    def decode(self, z):
        return self.decoder(z)


class VAEImageEncoder:
    """Frozen-weights inference wrapper (reference VAEImageEncoder).

    Resizes input depth images to the VAE training resolution and returns a
    (sampled or mean) latent. ``params=None`` => randomly initialized
    weights (useful for pipeline tests; train real ones with rl/train_vae).
    """

    def __init__(self, latent_dim: int = 64, image_res: Tuple[int, int] = (270, 480),
                 params=None, return_sampled_latent: bool = True, seed: int = 0,
                 compute_dtype=jnp.bfloat16):
        self.latent_dim = latent_dim
        self.image_res = image_res
        self.return_sampled_latent = return_sampled_latent
        self.model = DepthVAE(latent_dim=latent_dim, out_hw=image_res)
        if params is None:
            key = jax.random.PRNGKey(seed)
            dummy = jnp.zeros((1,) + image_res + (1,), jnp.float32)
            params = self.model.init(key, dummy, key)
        self.params = params
        # bf16 conv stack keeps the MXU busy (~3x encode throughput on TPU);
        # the frozen perception features feed an RL policy, which is robust
        # to bf16 feature noise. Pass compute_dtype=jnp.float32 to disable.
        # Only the ENCODER subtree is cast — decode() keeps using the f32
        # master params, and the decoder is the bulk of the model.
        self.compute_dtype = compute_dtype

        def cast_encoder(path, leaf):
            in_encoder = any(getattr(k, "key", None) == "encoder"
                             for k in path)
            return leaf.astype(compute_dtype) if in_encoder else leaf

        self._compute_params = jax.tree_util.tree_map_with_path(
            cast_encoder, params)

    def encode(self, images, key=None):
        """images (B, H, W) or (B, H, W, 1) -> latents (B, latent_dim) f32."""
        if images.ndim == 3:
            images = images[..., None]
        if images.shape[1:3] != self.image_res:
            images = jax.image.resize(
                images, (images.shape[0],) + self.image_res + (1,), "nearest")
        images = images.astype(self.compute_dtype)
        mean, logvar = self.model.apply(self._compute_params, images,
                                        method=DepthVAE.encode)
        mean = mean.astype(jnp.float32)
        logvar = logvar.astype(jnp.float32)
        if self.return_sampled_latent and key is not None:
            std = jnp.exp(0.5 * logvar)
            return mean + std * jax.random.normal(key, mean.shape, mean.dtype)
        return mean

    def decode(self, latents):
        return self.model.apply(self.params, latents, method=DepthVAE.decode)

    def get_latent_dims_size(self):
        return self.latent_dim


def vae_loss(model: DepthVAE, params, batch, key, kld_beta: float = 3.0,
             targets=None):
    """Reconstruction (BCE) + beta-weighted KLD (reference training recipe:
    'kld_beta_3' in the shipped checkpoint name).

    `targets` defaults to the inputs; pass robot-radius-inflated depth
    images to train a deep collision encoder (the latent predicts free
    space for the robot, not raw geometry)."""
    if targets is None:
        targets = batch
    recon, mean, logvar = model.apply(params, batch, key)
    eps = 1e-6
    bce = -jnp.mean(targets * jnp.log(recon + eps)
                    + (1.0 - targets) * jnp.log(1.0 - recon + eps))
    kld = -0.5 * jnp.mean(1.0 + logvar - mean**2 - jnp.exp(logvar))
    return bce + kld_beta * kld / np.prod(batch.shape[1:3]), (bce, kld)
