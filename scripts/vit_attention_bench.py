#!/usr/bin/env python
"""Fused (flash) vs XLA attention for the ViT encoder — the round-4
before/after measurement (VERDICT r3 #6).

PERF.md round 3 measured the dim-512/depth-12 ViT step attention-HBM-bound
(4.9 GB/iter at batch 1024 x seq 225, 0.57% MXU). models/vit.py now routes
attention through the Pallas TPU flash-attention kernel when
attn_impl='flash'; this script times the encoder forward+backward (the
training hot path — vae_loss gradients) at the configs a nav user would
run, for both implementations, and emits one ROOFLINE.jsonl-style line per
config. Run ALONE on the chip (TPU exclusivity).

Timing is completion-anchored with a host fetch (CLAUDE.md tunneled-backend
rule). Numerics: flash vs xla encoder outputs are compared at every config
before timing (bf16 tolerance).

Usage: python scripts/vit_attention_bench.py [--out ROOFLINE.jsonl]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def bench_config(tag, dim, depth, heads, batch, hw=(135, 240),
                 patch=(9, 16), iters=20, impls=("xla", "flash"),
                 extra=None):
    """Time encoder fwd+bwd for each impl. impls=("flash",) runs a
    flash-only probe — used where the xla impl's materialized (S, S)
    logits OOM HBM (measured: dim-256/depth-8 at batch 1024 asks for
    48.91G of the chip's 15.75G); `extra` merges literal fields into the
    emitted record (e.g. the xla OOM annotation)."""
    from aerial_gym_simulator_tpu.models.vit import DepthViT

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (batch,) + hw + (1,), jnp.float32)

    results = {}
    outs = {}
    params = None
    for impl in impls:
        model = DepthViT(latent_dim=64, out_hw=hw, patch=patch, dim=dim,
                         depth=depth, num_heads=heads, attn_impl=impl)
        if params is None:
            params = model.init(key, x[:1], key)
        # bf16 compute like ViTImageEncoder / training
        cparams = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16), params)
        xb = x.astype(jnp.bfloat16)

        def loss_fn(p, model=model):
            mean, logvar = model.apply(p, xb, method=DepthViT.encode)
            return (jnp.sum(mean.astype(jnp.float32) ** 2)
                    + jnp.sum(logvar.astype(jnp.float32) ** 2)) / batch

        step = jax.jit(jax.value_and_grad(loss_fn))
        loss, grads = step(cparams)
        # completion anchor: host fetch, not block_until_ready
        _ = float(loss) + float(jnp.sum(
            jax.tree_util.tree_leaves(grads)[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(iters):
            loss, grads = step(cparams)
        anchor = float(loss) + float(jnp.sum(
            jax.tree_util.tree_leaves(grads)[0].astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / iters
        results[impl] = dt
        # numerics capture (forward only, same params both impls)
        fwd = jax.jit(lambda p, model=model: model.apply(
            p, xb, method=DepthViT.encode)[0])
        outs[impl] = np.asarray(fwd(cparams), np.float32)
        assert np.isfinite(anchor)

    rec = {
        "study": f"vit_attention_{tag}",
        "dim": dim, "depth": depth, "heads": heads, "batch": batch,
        "seq": (hw[0] // patch[0]) * (hw[1] // patch[1]),
    }
    for impl in impls:
        rec[f"{impl}_ms"] = round(results[impl] * 1e3, 3)
    if "flash" in impls:
        rec["fwd_bwd_steps_per_s_flash"] = round(batch / results["flash"], 1)
    if "xla" in impls and "flash" in impls:
        # flash and xla must agree on the same checkpoint (bf16 tolerance:
        # different softmax/accumulation orders)
        diff = float(np.max(np.abs(outs["flash"] - outs["xla"])))
        scale = float(np.max(np.abs(outs["xla"])) + 1e-6)
        rec["speedup"] = round(results["xla"] / results["flash"], 3)
        rec["max_abs_diff"] = round(diff, 5)
        rec["rel_diff"] = round(diff / scale, 5)
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="append result lines to this jsonl file")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    recs = []
    # nav-user configs: the shipped small encoder at the training batch,
    # then the mid/large configs. At batch 1024 the xla impl's
    # materialized (S, S) f32 logits OOM the 15.75G chip from dim 256 up
    # (measured: 48.91G requested) — so the paired xla-vs-flash timing
    # runs at batch 128, and a flash-ONLY probe runs the full
    # training batch the xla impl cannot fit at all.
    recs.append(bench_config("small_dim128", dim=128, depth=4, heads=4,
                             batch=1024, iters=args.iters))
    recs.append(bench_config("mid_dim256_b128", dim=256, depth=8, heads=8,
                             batch=128, iters=args.iters))
    recs.append(bench_config("large_dim512_b128", dim=512, depth=12,
                             heads=8, batch=128, iters=args.iters))
    recs.append(bench_config(
        "mid_dim256_b1024_flashonly", dim=256, depth=8, heads=8,
        batch=1024, iters=args.iters, impls=("flash",),
        extra={"xla_oom": True,
               "xla_oom_hbm_requested_gb": 48.91, "hbm_gb": 15.75}))
    recs.append(bench_config(
        "large_dim512_b1024_flashonly", dim=512, depth=12, heads=8,
        batch=1024, iters=args.iters, impls=("flash",),
        extra={"xla_oom": True, "hbm_gb": 15.75}))
    if args.out:
        with open(args.out, "a") as f:
            for r in recs:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
