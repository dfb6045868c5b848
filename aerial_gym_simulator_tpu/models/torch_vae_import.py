"""Import reference-framework torch VAE weights for the navigation stack.

The reference trains its depth-image VAE in torch
(reference utils/vae/VAE.py: ``ImgEncoder``/``ImgDecoder`` — a skip-
connected conv encoder to a 64-d latent and a deconv decoder) and ships
the class plus user-trained ``.pth`` weights. Users switching to this
framework can bring those weights: this module defines flax modules with
the EXACT layer geometry of the torch classes (same kernel sizes, strides
and asymmetric paddings, same channel-major flatten order) plus a
state-dict converter, so a converted encoder reproduces the torch forward
pass to float32 precision.

The native flax VAE in models/vae.py remains the default (its SAME-padded
stack is friendlier to XLA); use this importer only to carry over trained
reference weights:

    from aerial_gym_simulator_tpu.models.torch_vae_import import (
        TorchVAEImageEncoder)
    vae = TorchVAEImageEncoder("my_vae_weights.pth")   # drop-in for
    # VAEImageEncoder: .encode(images, key), .decode(z), latent_dim
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..utils.logging import CustomLogger

logger = CustomLogger("torch_vae_import")


def _conv(features, k, s, p):
    """torch Conv2d(k, stride=s, padding=p) geometry; p = int or (pH, pW)."""
    if isinstance(p, int):
        p = (p, p)
    return nn.Conv(features, (k, k), strides=(s, s),
                   padding=((p[0], p[0]), (p[1], p[1])))


class TorchParityEncoder(nn.Module):
    """reference utils/vae/VAE.py ImgEncoder, geometry-exact."""
    latent_dim: int = 64

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, 1), H,W = 270,480
        elu = nn.elu
        # one statement per layer: flax names submodules in construction
        # order, and the converter relies on Conv_0..Conv_8 matching the
        # torch layer sequence
        x0_0 = _conv(32, 5, 2, 2)(x)
        x0_1 = elu(_conv(32, 3, 2, 2)(x0_0))
        x1_0 = _conv(32, 5, 2, 1)(x0_1)
        x1_1 = _conv(64, 3, 1, 1)(x1_0)
        x1_1 = elu(x1_1 + _conv(64, 4, 2, 1)(x0_1))
        x2_0 = _conv(64, 5, 2, 2)(x1_1)
        x2_1 = _conv(128, 3, 2, 1)(x2_0)
        x2_1 = elu(x2_1 + _conv(128, 5, 4, (2, 1))(x1_1))
        x3_0 = nn.Conv(128, (5, 5), strides=(2, 2), padding="VALID")(x2_1)
        # torch flattens channel-major: (B, C, H, W) -> (B, C*H*W)
        flat = jnp.transpose(x3_0, (0, 3, 1, 2)).reshape(x3_0.shape[0], -1)
        h = elu(nn.Dense(512)(flat))
        return nn.Dense(2 * self.latent_dim)(h)


class _Deconv(nn.Module):
    """torch ConvTranspose2d(k, stride=s, padding=p, output_padding=op) as
    an lhs-dilated lax convolution (the numerically identical formulation:
    out = (H-1)s - 2p + k + op)."""
    features: int
    k: int
    s: int
    p: Tuple[int, int]
    op: Tuple[int, int]

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.k, self.k, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        pads = tuple((self.k - 1 - pi, self.k - 1 - pi + opi)
                     for pi, opi in zip(self.p, self.op))
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1), padding=pads,
            lhs_dilation=(self.s, self.s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias


class TorchParityDecoder(nn.Module):
    """reference utils/vae/VAE.py ImgDecoder, geometry-exact (270x480)."""
    out_channels: int = 1
    with_logits: bool = False

    @nn.compact
    def __call__(self, z):
        x = nn.relu(nn.Dense(512)(z))
        x = nn.Dense(9 * 15 * 128)(x)
        # torch reshapes channel-major to (B, 128, 9, 15)
        x = jnp.transpose(x.reshape(-1, 128, 9, 15), (0, 2, 3, 1))
        x = nn.relu(_Deconv(128, 3, 1, (1, 1), (0, 0))(x))
        x = nn.relu(_Deconv(64, 5, 2, (2, 2), (0, 1))(x))
        x = nn.relu(_Deconv(32, 6, 4, (2, 2), (0, 0))(x))
        x = nn.relu(_Deconv(16, 6, 2, (0, 0), (0, 1))(x))
        x = _Deconv(self.out_channels, 4, 2, (2, 2), (0, 0))(x)
        return x if self.with_logits else jax.nn.sigmoid(x)


# torch state-dict name -> (flax param path, kind)
_ENC_CONVS = [
    ("conv0", "Conv_0"), ("conv0_1", "Conv_1"),
    ("conv1_0", "Conv_2"), ("conv1_1", "Conv_3"),
    ("conv0_jump_2", "Conv_4"),
    ("conv2_0", "Conv_5"), ("conv2_1", "Conv_6"),
    ("conv1_jump_3", "Conv_7"), ("conv3_0", "Conv_8"),
]
_ENC_DENSE = [("dense0", "Dense_0"), ("dense1", "Dense_1")]
_DEC_DENSE = [("dense", "Dense_0"), ("dense1", "Dense_1")]
_DEC_DECONVS = [
    ("deconv1", "_Deconv_0"), ("deconv2", "_Deconv_1"),
    ("deconv4", "_Deconv_2"), ("deconv6", "_Deconv_3"),
    ("deconv7", "_Deconv_4"),
]


def _t2n(t):
    return np.asarray(t.detach().cpu().numpy(), np.float32)


def convert_torch_vae_state_dict(sd: dict):
    """torch VAE state dict -> (encoder_params, decoder_params) pytrees.

    Accepts the full VAE state dict (keys ``img_encoder.*`` /
    ``img_decoder.*``, optionally prefixed ``vae.``) or a bare
    encoder/decoder dict.
    """
    # normalize key prefixes: raw training checkpoints may be wrapped
    # ("module."), use the backbone name ("dronet." -> encoder, mirroring
    # the reference's clean_state_dict, vae_image_encoder.py:7-13), or use
    # either attribute name pair (VAE.py:177-178 names them self.encoder /
    # self.img_decoder)
    flat = {}
    for k, v in sd.items():
        k = k.replace("module.", "").replace("vae.", "")
        k = k.replace("dronet.", "encoder.")
        flat[k] = v

    def pick(prefixes, name):
        for prefix in prefixes:
            cand = f"{prefix}.{name}" if prefix else name
            if cand + ".weight" in flat:
                return flat[cand + ".weight"], flat[cand + ".bias"]
        raise KeyError(f"{name} not found in state dict "
                       f"(tried prefixes {prefixes})")

    _ENC_PRE = ("encoder", "img_encoder", "")
    _DEC_PRE = ("img_decoder", "decoder", "")

    enc = {}
    for tname, fname in _ENC_CONVS:
        w, b = pick(_ENC_PRE, tname)
        # torch conv weight (O, I, kH, kW) -> flax HWIO (lax conv is
        # cross-correlation in both frameworks: no flip)
        enc[fname] = {"kernel": jnp.asarray(_t2n(w).transpose(2, 3, 1, 0)),
                      "bias": jnp.asarray(_t2n(b))}
    for tname, fname in _ENC_DENSE:
        w, b = pick(_ENC_PRE, tname)
        enc[fname] = {"kernel": jnp.asarray(_t2n(w).T),
                      "bias": jnp.asarray(_t2n(b))}

    dec = {}
    for tname, fname in _DEC_DENSE:
        w, b = pick(_DEC_PRE, tname)
        dec[fname] = {"kernel": jnp.asarray(_t2n(w).T),
                      "bias": jnp.asarray(_t2n(b))}
    for tname, fname in _DEC_DECONVS:
        w, b = pick(_DEC_PRE, tname)
        # torch convtranspose weight (I, O, kH, kW); the lhs-dilated-conv
        # formulation needs the spatially FLIPPED kernel in HWIO
        wn = _t2n(w)[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
        dec[fname] = {"kernel": jnp.asarray(np.ascontiguousarray(wn)),
                      "bias": jnp.asarray(_t2n(b))}

    return {"params": enc}, {"params": dec}


def load_torch_vae(pth_path: str):
    """Load a reference VAE ``.pth`` (state dict or full checkpoint)."""
    import torch

    blob = torch.load(pth_path, map_location="cpu", weights_only=False)
    if hasattr(blob, "state_dict"):
        blob = blob.state_dict()
    if isinstance(blob, dict) and "state_dict" in blob:
        blob = blob["state_dict"]
    if isinstance(blob, dict) and "model" in blob and all(
            not hasattr(v, "detach") for v in blob.values()
            if not isinstance(v, dict)):
        blob = blob["model"]
    return convert_torch_vae_state_dict(blob)


class TorchVAEImageEncoder:
    """Drop-in for models.vae.VAEImageEncoder backed by imported torch
    weights (reference utils/vae/vae_image_encoder.py behavior: resize to
    the training resolution, return mean or sampled latent)."""

    def __init__(self, pth_path: str, latent_dim: int = 64,
                 image_res: Tuple[int, int] = (270, 480),
                 return_sampled_latent: bool = True,
                 compute_dtype=jnp.float32):
        self.latent_dim = latent_dim
        self.image_res = image_res
        self.return_sampled_latent = return_sampled_latent
        self.compute_dtype = compute_dtype
        self.encoder = TorchParityEncoder(latent_dim=latent_dim)
        self.decoder = TorchParityDecoder()
        self.enc_params, self.dec_params = load_torch_vae(pth_path)
        if compute_dtype != jnp.float32:
            self.enc_params = jax.tree.map(
                lambda x: x.astype(compute_dtype), self.enc_params)
        logger.info(f"imported torch VAE weights from {pth_path}")

    def encode(self, images, key=None):
        if images.ndim == 3:
            images = images[..., None]
        if images.shape[1:3] != self.image_res:
            images = jax.image.resize(
                images, (images.shape[0],) + self.image_res + (1,),
                "nearest")
        out = self.encoder.apply(self.enc_params,
                                 images.astype(self.compute_dtype))
        out = out.astype(jnp.float32)
        mean, logvar = out[:, :self.latent_dim], out[:, self.latent_dim:]
        if self.return_sampled_latent and key is not None:
            std = jnp.exp(0.5 * logvar)
            return mean + std * jax.random.normal(key, mean.shape)
        return mean

    def decode(self, latents):
        return self.decoder.apply(self.dec_params, latents)

    def get_latent_dims_size(self):
        return self.latent_dim
