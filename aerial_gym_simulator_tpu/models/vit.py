"""ViT depth encoder — transformer perception backbone (beyond-reference).

The reference's only perception model is the ResNet8-style conv VAE
(utils/vae/VAE.py); this module adds a Vision-Transformer alternative with
the SAME training and inference contracts as models/vae.py, so it drops
into the existing pipeline unchanged:

  * :class:`DepthViT` mirrors ``DepthVAE`` (``__call__(x, key)`` /
    ``encode`` / ``decode``) — train it with the existing ``vae_loss`` via
    ``train_vae --arch vit``;
  * :class:`ViTImageEncoder` mirrors ``VAEImageEncoder`` — the navigation
    task uses it automatically when the params pickle carries
    ``{"arch": "vit", ...}``.

TPU-first: the patch embedding and attention/MLP matmuls are exactly the
large batched GEMMs the MXU wants (the conv VAE is mostly small
convolutions), and the parameters carry a documented TENSOR-PARALLEL
sharding map (:func:`vit_tp_shardings`): attention heads and the MLP
hidden dimension shard across the mesh, XLA inserting the all-reduces —
the standard megatron-style TP layout expressed as pjit shardings
(SURVEY.md section 5.7's "if a transformer is added" path, made concrete).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .vae import Decoder


class FusedAttention(nn.Module):
    """Self-attention through the Pallas TPU flash-attention kernel
    (jax.experimental.pallas.ops.tpu.flash_attention) — never materializes
    the (S, S) logits in HBM. PERF.md round 3 measured the dim-512/
    depth-12 ViT step attention-HBM-bound (4.9 GB/iter at batch 1024 x
    seq 225); this is the fused path that removes that traffic
    (VERDICT r3 next #6).

    Param layout is BIT-COMPATIBLE with flax's
    nn.MultiHeadDotProductAttention (submodules query/key/value with
    (D, H, hd) kernels, out with (H, hd, D)): checkpoints trained on
    either path load on the other, and vit_tp_shardings' head-sharded TP
    map applies unchanged.

    impl: 'fused'     — the in-repo short-seq kernel
                        (ops/attention_pallas.py): packed (B, S, D) HBM
                        layout, head split in VMEM, whole-(S,S) softmax
                        on-chip, bf16 MXU operands, recompute-in-backward.
                        The round-5 default for training — jax's flash
                        kernel measured 3-4x slower than XLA at S=225 AND
                        OOMed at batch 1024 from its (B, H, S, 32) f32
                        layout (ROOFLINE.jsonl vit_attention_* r5);
          'flash'     — jax's Pallas flash-attention kernel (TPU only),
                        kept for comparison benchmarks;
          'reference' — that kernel's own mha_reference (CPU-runnable
                        oracle with identical padding/segment handling;
                        tests/test_vit.py proves it matches flax MHA).
    Sequences pad to the kernel block size; padding keys are masked (via
    segment ids for 'flash'/'reference', in-kernel for 'fused'), so real
    tokens never attend to them.
    """
    dim: int
    num_heads: int
    impl: str = "fused"

    @nn.compact
    def __call__(self, x):
        from jax.experimental.pallas.ops.tpu import flash_attention as fa

        B, S, D = x.shape
        H = self.num_heads
        hd = self.dim // H
        dense = functools.partial(nn.DenseGeneral, features=(H, hd),
                                  axis=-1, dtype=x.dtype)
        q = dense(name="query")(x)                       # (B, S, H, hd)
        k = dense(name="key")(x)
        v = dense(name="value")(x)
        if self.impl == "fused":
            from ..ops.attention_pallas import fused_attention
            # free reshape to the packed layout the kernel wants; the
            # DenseGeneral param tree stays bit-compatible with flax MHA
            o = fused_attention(q.reshape(B, S, H * hd),
                                k.reshape(B, S, H * hd),
                                v.reshape(B, S, H * hd), H,
                                sm_scale=1.0 / math.sqrt(hd))
            o = o.reshape(B, S, H, hd)
            return nn.DenseGeneral(features=D, axis=(-2, -1), dtype=x.dtype,
                                   name="out")(o)
        qt = jnp.transpose(q, (0, 2, 1, 3))              # (B, H, S, hd)
        kt = jnp.transpose(k, (0, 2, 1, 3))
        vt = jnp.transpose(v, (0, 2, 1, 3))
        Sp = -(-S // fa.MIN_BLOCK_SIZE) * fa.MIN_BLOCK_SIZE
        pad = Sp - S
        if pad:
            qt = jnp.pad(qt, ((0, 0), (0, 0), (0, pad), (0, 0)))
            kt = jnp.pad(kt, ((0, 0), (0, 0), (0, pad), (0, 0)))
            vt = jnp.pad(vt, ((0, 0), (0, 0), (0, pad), (0, 0)))
        # real tokens segment 1, padding segment 0: only same-id pairs
        # attend, so padding never leaks into real softmax rows
        seg = jnp.concatenate(
            [jnp.ones((B, S), jnp.int32), jnp.zeros((B, pad), jnp.int32)],
            axis=1)
        sm_scale = 1.0 / math.sqrt(hd)
        if self.impl == "flash":
            # this Mosaic backend rejects bf16 matmul operands inside the
            # kernel ("Bad lhs type", measured on v5e via the AOT compile
            # path) — run the kernel in f32 and cast back. The win is
            # avoiding the (S, S) logits materialization in HBM, which
            # f32 q/k/v does not give back.
            o = fa.flash_attention(qt.astype(jnp.float32),
                                   kt.astype(jnp.float32),
                                   vt.astype(jnp.float32),
                                   segment_ids=fa.SegmentIds(seg, seg),
                                   sm_scale=sm_scale).astype(x.dtype)
        elif self.impl == "reference":
            o = fa.mha_reference(qt, kt, vt, None,
                                 segment_ids=fa.SegmentIds(seg, seg),
                                 sm_scale=sm_scale)
        else:  # pragma: no cover - guarded at construction
            raise ValueError(f"unknown attention impl {self.impl!r}")
        o = jnp.transpose(o[:, :, :S, :], (0, 2, 1, 3))  # (B, S, H, hd)
        return nn.DenseGeneral(features=D, axis=(-2, -1), dtype=x.dtype,
                               name="out")(o)


class TransformerBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: int = 4
    attn_impl: str = "xla"   # 'xla' | 'fused' | 'flash' | 'reference'

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm()(x)
        if self.attn_impl == "xla":
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, qkv_features=self.dim,
                name="attn")(y, y)
        else:
            # identical param tree — checkpoints interchange freely
            y = FusedAttention(self.dim, self.num_heads,
                               impl=self.attn_impl, name="attn")(y)
        x = x + y
        y = nn.LayerNorm()(x)
        y = nn.Dense(self.mlp_ratio * self.dim, name="mlp_in")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, name="mlp_out")(y)
        return x + y


class ViTEncoder(nn.Module):
    """Patchify -> transformer -> mean-pool -> (mean, logvar) latent head
    (same output contract as models/vae.py Encoder).

    remat=True rematerializes each transformer block in the backward
    (nn.remat = jax.checkpoint): saved activations drop from
    O(depth x B x S x 4*dim) to one block's worth, trading ~1 extra
    forward of FLOPs. This is the binding constraint at large configs —
    dim-512/depth-12 at batch 1024 OOMs under EVERY attention impl
    without it (ROOFLINE.jsonl vit_attention_large_dim512_b1024, r5) and
    compiles with it. Param tree is unchanged (checkpoints interchange)."""
    latent_dim: int = 64
    patch: Tuple[int, int] = (9, 16)
    dim: int = 128
    depth: int = 4
    num_heads: int = 4
    attn_impl: str = "xla"
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, 1) in [0, 1]; H, W must be multiples of patch
        x = nn.Conv(self.dim, self.patch, strides=self.patch,
                    padding="VALID", name="patch_embed")(x)
        B, h, w, d = x.shape
        x = x.reshape(B, h * w, d)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, h * w, d))
        x = x + pos
        block_cls = (nn.remat(TransformerBlock) if self.remat
                     else TransformerBlock)
        for i in range(self.depth):
            x = block_cls(self.dim, self.num_heads,
                          attn_impl=self.attn_impl,
                          name=f"block_{i}")(x)
        x = nn.LayerNorm()(x)
        x = x.mean(axis=1)  # token mean-pool
        out = nn.Dense(2 * self.latent_dim, name="latent_head")(x)
        mean, logvar = jnp.split(out, 2, axis=-1)
        return mean, jnp.clip(logvar, -10.0, 10.0)


class DepthViT(nn.Module):
    """ViT-encoder autoencoder with the conv decoder from models/vae.py —
    API-compatible with DepthVAE so vae_loss / train_vae / the navigation
    task work unchanged."""
    latent_dim: int = 64
    out_hw: Tuple[int, int] = (270, 480)
    patch: Tuple[int, int] = (9, 16)
    dim: int = 128
    depth: int = 4
    num_heads: int = 4
    attn_impl: str = "xla"
    remat: bool = False   # see ViTEncoder.remat (training-memory lever)

    def setup(self):
        self.encoder = ViTEncoder(self.latent_dim, self.patch, self.dim,
                                  self.depth, self.num_heads,
                                  self.attn_impl, self.remat)
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


def _vit_input_hw(image_res: Tuple[int, int],
                  patch: Tuple[int, int]) -> Tuple[int, int]:
    """Nearest patch-multiple resolution the encoder actually consumes."""
    return (max(round(image_res[0] / patch[0]), 1) * patch[0],
            max(round(image_res[1] / patch[1]), 1) * patch[1])


class ViTImageEncoder:
    """Frozen-weights inference wrapper — the ViT counterpart of
    VAEImageEncoder (same encode() contract: resize, bf16 compute, f32
    latents; the navigation task treats the two interchangeably)."""

    def __init__(self, latent_dim: int = 64,
                 image_res: Tuple[int, int] = (270, 480), params=None,
                 return_sampled_latent: bool = True, seed: int = 0,
                 compute_dtype=jnp.bfloat16, patch: Tuple[int, int] = (9, 16),
                 dim: int = 128, depth: int = 4, num_heads: int = 4,
                 attn_impl: str = "xla"):
        self.latent_dim = latent_dim
        self.image_res = image_res
        self.input_hw = _vit_input_hw(image_res, patch)
        self.return_sampled_latent = return_sampled_latent
        if attn_impl in ("flash", "fused") and jax.default_backend() != "tpu":
            # kernel-trained checkpoints replay on CPU through the XLA
            # attention (bit-compatible params; the Pallas kernels need
            # real TPU hardware — interpret mode is for tests only)
            attn_impl = "xla"
        self.model = DepthViT(latent_dim=latent_dim, out_hw=image_res,
                              patch=patch, dim=dim, depth=depth,
                              num_heads=num_heads, attn_impl=attn_impl)
        if params is None:
            key = jax.random.PRNGKey(seed)
            dummy = jnp.zeros((1,) + self.input_hw + (1,), jnp.float32)
            params = self.model.init(key, dummy, key)
        self.params = params
        self.compute_dtype = compute_dtype

        def cast_encoder(path, leaf):
            in_encoder = any(getattr(k, "key", None) == "encoder"
                             for k in path)
            return leaf.astype(compute_dtype) if in_encoder else leaf

        self._compute_params = jax.tree_util.tree_map_with_path(
            cast_encoder, params)

    def encode(self, images, key=None):
        if images.ndim == 3:
            images = images[..., None]
        if images.shape[1:3] != self.input_hw:
            images = jax.image.resize(
                images, (images.shape[0],) + self.input_hw + (1,), "nearest")
        images = images.astype(self.compute_dtype)
        mean, logvar = self.model.apply(self._compute_params, images,
                                        method=DepthViT.encode)
        mean = mean.astype(jnp.float32)
        logvar = logvar.astype(jnp.float32)
        if self.return_sampled_latent and key is not None:
            std = jnp.exp(0.5 * logvar)
            return mean + std * jax.random.normal(key, mean.shape, mean.dtype)
        return mean

    def decode(self, latents):
        return self.model.apply(self.params, latents, method=DepthViT.decode)

    def get_latent_dims_size(self):
        return self.latent_dim


# ---------------------------------------------------------------------------
# tensor parallelism: megatron-style shardings over a 1-D mesh
# ---------------------------------------------------------------------------


def vit_tp_shardings(params, mesh, axis: str = "env"):
    """Return a pytree of NamedShardings implementing tensor parallelism
    for the ViT encoder over `mesh`:

      * attention q/k/v kernels (embed, heads, head_dim) shard on HEADS —
        each device computes its own attention heads (no communication
        inside attention);
      * the attention output kernel (heads, head_dim, embed) contracts the
        sharded heads axis -> XLA inserts the row-parallel all-reduce;
      * MLP: mlp_in (embed, hidden) shards column-parallel on hidden,
        mlp_out (hidden, embed) row-parallel -> one all-reduce per block;
      * everything else (LayerNorms, patch embed, latent head, decoder)
        replicated.

    Apply with ``jax.device_put(params, vit_tp_shardings(params, mesh))``;
    jit then propagates the layouts (tests/test_vit.py proves sharded ==
    unsharded on the virtual 8-device mesh).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    def spec_for(path, leaf):
        names = [str(getattr(k, "key", "")) for k in path]
        joined = "/".join(names)
        nd = np.ndim(leaf)
        if "attn" in names:
            if names[-2] in ("query", "key", "value") and nd == 3:
                return P(None, axis, None)      # heads axis
            if names[-2] == "out" and names[-1] == "kernel" and nd == 3:
                return P(axis, None, None)      # contract sharded heads
            return P()
        if "mlp_in" in joined:
            return P(None, axis) if nd == 2 else P(axis)
        if "mlp_out" in joined and names[-1] == "kernel":
            return P(axis, None)                # row-parallel
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for(path, leaf)), params)
