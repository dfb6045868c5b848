"""Short-sequence fused multi-head attention — in-repo Pallas TPU kernel.

Why this exists (round-5 finding, PERF.md "Flash attention revisited"):
the ViT perception encoder runs at seq ~225 tokens. At that length the
(S, S) attention matrix fits ENTIRELY in VMEM, so true flash blocking
(online softmax over key blocks) is pure overhead — and jax's shipped
flash kernel is actively hostile to this workload on two counts, both
measured on the v5e:

  * it wants q/k/v as (B, H, S, head_dim) HBM arrays; head_dim = 32 pads
    to the 128-lane tile => 4x HBM expansion, and with the f32 operand
    cast (Mosaic rejected bf16 there) a batch-1024 dim-256 encoder asks
    for 48.91 GB of a 15.75 GB chip — it OOMs exactly like the XLA path
    it was meant to replace (ROOFLINE.jsonl vit_attention_* r5);
  * at batch 128 it is 3-4x SLOWER than XLA's materialized attention
    (speedup 0.24-0.36), because S=225 makes block bookkeeping dominate.

This kernel is built for the shape the simulator actually has:

  * HBM layout is the PACKED (B, S, D=H*hd) activation layout — minor dim
    D is a lane multiple, so there is NO padding blowup and no XLA-side
    transpose/reshape traffic; the head split happens on the VMEM block,
    where a 32-lane slice costs nothing observable.
  * one grid step per batch element; q/k/v/o blocks (1, Sp, D) stream
    through VMEM double-buffered by the Pallas pipeline; the whole
    (Sp, Sp) softmax lives in registers/VMEM and never touches HBM.
  * operands stay bf16 on the MXU (preferred_element_type=f32 for the
    accumulate); softmax runs in f32.
  * backward pass = same-shape kernel that recomputes P and emits
    dq/dk/dv — standard recompute-in-bwd, so residuals are just q/k/v
    (no logits stored, which is the whole point).

HBM bytes per layer at (B=1024, S=225->256, D=256) bf16: fwd reads 3*128
MB + writes 128 MB; XLA's path additionally materializes the f32 logits
(B*H*S*S*4 = 2.1 GB) at least once. That missing traffic is the speedup;
the missing allocation is what lets batch-1024 dim-256/512 train at all.

The pure-XLA oracle (attention_oracle) is the correctness anchor;
tests/test_attention_pallas.py runs the kernel in interpret mode against
it, values AND gradients. models/vit.py routes attn_impl='fused' here.

Reference note: the reference has no transformer at all — this backs the
beyond-reference ViT encoder (SURVEY.md 5.7 sequence-parallel analog).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_LANE = 128
_NEG_BIG = -1e30  # finite "minus infinity": keeps padded softmax rows
#                   finite so zero cotangents stay zero in the backward
#                   (a true -inf row maxes to -inf and births NaNs that
#                   0 * NaN would then propagate into dV)

# Mosaic on the tunneled v5e backend rejects bf16 matmul operands
# outright — AOT compile fails with 'Bad lhs type' on
#   tpu.matmul(vector<256x128xbf16>, vector<128x128xbf16>) -> f32
# (pinned r5; same root cause as the r4 finding in jax's flash kernel).
# The cast happens HERE, on the VMEM tile, so HBM traffic stays bf16 —
# unlike the XLA-level cast jax's flash path forced, which materialized
# f32 (B, H, S, 32) arrays in HBM and OOMed the training batch. Flip to
# jnp.bfloat16 when a backend accepts bf16 operands to reclaim the MXU
# rate discount.
_MATMUL_DTYPE = jnp.float32


def _pad_len(s: int) -> int:
    return -(-s // _LANE) * _LANE


def _mask_logits(logits, s_real: int, sp: int):
    if s_real == sp:
        return logits
    key_ok = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 1) < s_real
    return jnp.where(key_ok, logits, _NEG_BIG)


def _head_attn_fwd(qh, kh, vh, s_real: int, scale: float):
    """One head, whole sequence in VMEM: (Sp, hd) x 3 -> (Sp, hd), P."""
    sp = qh.shape[0]
    cd = _MATMUL_DTYPE
    logits = jax.lax.dot_general(
        qh.astype(cd), kh.astype(cd), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    logits = _mask_logits(logits, s_real, sp)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)          # (Sp, Sp) f32
    oh = jax.lax.dot_general(
        p.astype(cd), vh.astype(cd), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return oh, p


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, num_heads: int, s_real: int,
                scale: float):
    d = q_ref.shape[-1]
    hd = d // num_heads
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        oh, _ = _head_attn_fwd(q_ref[0, :, sl], k_ref[0, :, sl],
                               v_ref[0, :, sl], s_real, scale)
        o_ref[0, :, sl] = oh.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                num_heads: int, s_real: int, scale: float):
    d = q_ref.shape[-1]
    hd = d // num_heads
    cd = _MATMUL_DTYPE  # in-kernel operand cast (see _MATMUL_DTYPE note)
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        qh = q_ref[0, :, sl].astype(cd)
        kh = k_ref[0, :, sl].astype(cd)
        vh = v_ref[0, :, sl].astype(cd)
        doh = do_ref[0, :, sl].astype(cd)
        _, p = _head_attn_fwd(qh, kh, vh, s_real, scale)
        pc = p.astype(cd)
        # dV = P^T dO           (contract the query axis)
        dvh = jax.lax.dot_general(pc, doh, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        # dP = dO V^T           (contract head_dim)
        dp = jax.lax.dot_general(doh, vh, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # softmax backward: dS = P o (dP - rowsum(P o dP)); dlogits scale
        ds = (p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
              * scale).astype(cd)
        dqh = jax.lax.dot_general(ds, kh, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dkh = jax.lax.dot_general(ds, qh, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dq_ref[0, :, sl] = dqh.astype(dq_ref.dtype)
        dk_ref[0, :, sl] = dkh.astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dvh.astype(dv_ref.dtype)


def _block_specs(b, sp, d):
    spec = pl.BlockSpec((1, sp, d), lambda i: (i, 0, 0))
    return spec


def _fwd_call(q, k, v, num_heads, s_real, scale, interpret):
    b, sp, d = q.shape
    spec = _block_specs(b, sp, d)
    kern = functools.partial(_fwd_kernel, num_heads=num_heads,
                             s_real=s_real, scale=scale)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, sp, d), q.dtype),
        interpret=interpret,
    )(q, k, v)


def _bwd_call(q, k, v, do, num_heads, s_real, scale, interpret):
    b, sp, d = q.shape
    spec = _block_specs(b, sp, d)
    kern = functools.partial(_bwd_kernel, num_heads=num_heads,
                             s_real=s_real, scale=scale)
    shape = jax.ShapeDtypeStruct((b, sp, d), q.dtype)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(shape, shape, shape),
        interpret=interpret,
    )(q, k, v, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _fused_attention_padded(q, k, v, num_heads, s_real, scale, interpret):
    return _fwd_call(q, k, v, num_heads, s_real, scale, interpret)


def _fused_fwd(q, k, v, num_heads, s_real, scale, interpret):
    o = _fwd_call(q, k, v, num_heads, s_real, scale, interpret)
    return o, (q, k, v)


def _fused_bwd(num_heads, s_real, scale, interpret, res, do):
    q, k, v = res
    dq, dk, dv = _bwd_call(q, k, v, do.astype(q.dtype), num_heads, s_real,
                           scale, interpret)
    return dq, dk, dv


_fused_attention_padded.defvjp(_fused_fwd, _fused_bwd)


def fused_attention(q, k, v, num_heads: int, sm_scale: float | None = None,
                    interpret: bool | None = None):
    """Fused short-sequence multi-head attention.

    q, k, v: (B, S, D) with D = num_heads * head_dim — the PACKED
    activation layout (no per-head HBM arrays). Any S; padded internally
    to a lane multiple with masked keys. Returns (B, S, D) in q's dtype.

    Gradients flow through a recompute-in-backward kernel (custom_vjp);
    nothing sequence-quadratic ever lands in HBM in either direction.
    interpret=None auto-selects interpret mode off-TPU (CPU tests).
    """
    b, s, d = q.shape
    if d % num_heads:
        raise ValueError(f"model dim {d} not divisible by heads {num_heads}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d // num_heads)
    sp = _pad_len(s)
    pad = sp - s
    if pad:
        cfg = ((0, 0), (0, pad), (0, 0))
        q = jnp.pad(q, cfg)
        k = jnp.pad(k, cfg)
        v = jnp.pad(v, cfg)
    o = _fused_attention_padded(q, k, v, num_heads, s, float(sm_scale),
                                interpret)
    return o[:, :s, :] if pad else o


def attention_oracle(q, k, v, num_heads: int, sm_scale: float | None = None):
    """Pure-XLA reference: identical math, materialized softmax. The
    correctness anchor for the kernel (values and gradients)."""
    b, s, d = q.shape
    hd = d // num_heads
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(hd)
    qh = q.reshape(b, s, num_heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(b, s, num_heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(b, s, num_heads, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * sm_scale
    p = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), vh,
                   preferred_element_type=jnp.float32)
    return o.transpose(0, 2, 1, 3).reshape(b, s, d).astype(q.dtype)
