#!/usr/bin/env python
"""ViT encoder attention implementations benchmarked on chip: XLA
materialized attention vs jax's Pallas flash kernel vs the in-repo
short-seq fused kernel (ops/attention_pallas.py).

History: PERF.md round 3 measured the dim-512/depth-12 ViT step
attention-HBM-bound (4.9 GB/iter at batch 1024 x seq 225). Round 4 wired
jax's flash kernel ('flash'); the round-5 measurement (this script) found
it 3-4x SLOWER than XLA at seq 225 and OOMing at batch 1024 just like
XLA (48.91G requested: its (B, H, S, 32) layout pads 4x in HBM and the
forced f32 operand cast doubles that). The round-5 'fused' kernel keeps
the packed (B, S, D) layout and bf16 operands — this script is the
before/after evidence for all three.

Each config emits one ROOFLINE.jsonl-style line, written to --out
INCREMENTALLY (a crash or OOM cannot destroy earlier measurements —
the round-4 lesson). Per-impl OOM/compile errors are recorded as
structured fields, not crashes.

Timing is completion-anchored with a host fetch (CLAUDE.md tunneled-
backend rule). Numerics: every successful impl is compared against the
config's first successful impl before timing (bf16 tolerance).

Run ALONE on the chip (TPU exclusivity).
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


def _emit(rec, out):
    print(json.dumps(rec), flush=True)
    if out:
        with open(out, "a") as f:
            f.write(json.dumps(rec) + "\n")


def bench_config(tag, dim, depth, heads, batch, out=None, hw=(135, 240),
                 patch=(9, 16), iters=20, impls=("xla", "flash", "fused"),
                 extra=None):
    """Time encoder fwd+bwd for each impl; OOM/compile failures per impl
    are recorded as `<impl>_error` fields instead of aborting the run."""
    from aerial_gym_simulator_tpu.models.vit import DepthViT

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (batch,) + hw + (1,), jnp.float32)

    results = {}
    errors = {}
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
        try:
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
            assert np.isfinite(anchor)
            results[impl] = dt
            # numerics capture (forward only, same params all impls)
            fwd = jax.jit(lambda p, model=model: model.apply(
                p, xb[:min(batch, 64)], method=DepthViT.encode)[0])
            outs[impl] = np.asarray(fwd(cparams), np.float32)
        except Exception as e:  # noqa: BLE001 - OOM/Mosaic errors vary
            msg = str(e)
            if "hbm" in msg.lower() and "out of memory" in msg.lower():
                short = "OOM: " + msg.split("\n")[0][:160]
            else:
                short = msg.split("\n")[0][:200]
            errors[impl] = short

    rec = {
        "study": f"vit_attention_{tag}",
        "dim": dim, "depth": depth, "heads": heads, "batch": batch,
        "seq": (hw[0] // patch[0]) * (hw[1] // patch[1]),
    }
    for impl in impls:
        if impl in results:
            rec[f"{impl}_ms"] = round(results[impl] * 1e3, 3)
            rec[f"{impl}_steps_per_s"] = round(batch / results[impl], 1)
        elif impl in errors:
            rec[f"{impl}_error"] = errors[impl]
    ok = [i for i in impls if i in results]
    if len(ok) >= 2:
        base = ok[0]
        scale = float(np.max(np.abs(outs[base])) + 1e-6)
        for other in ok[1:]:
            diff = float(np.max(np.abs(outs[other] - outs[base])))
            rec[f"speedup_{other}_vs_{base}"] = round(
                results[base] / results[other], 3)
            rec[f"max_abs_diff_{other}_vs_{base}"] = round(diff, 5)
            rec[f"rel_diff_{other}_vs_{base}"] = round(diff / scale, 5)
    if extra:
        rec.update(extra)
    _emit(rec, out)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="append result lines to this jsonl file")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--impls", nargs="+",
                    default=["xla", "flash", "fused"])
    args = ap.parse_args()
    impls = tuple(args.impls)

    # nav-user configs: the shipped small encoder at the training batch,
    # then the mid/large configs at batch 128 (where all impls can run)
    # and at the FULL training batch 1024 (where only layouts that avoid
    # the (S, S)-in-HBM materialization and the head_dim-32 padding can
    # exist at all — the capacity axis).
    bench_config("small_dim128", dim=128, depth=4, heads=4,
                 batch=1024, iters=args.iters, impls=impls, out=args.out)
    bench_config("mid_dim256_b128", dim=256, depth=8, heads=8,
                 batch=128, iters=args.iters, impls=impls, out=args.out)
    bench_config("large_dim512_b128", dim=512, depth=12,
                 heads=8, batch=128, iters=args.iters, impls=impls,
                 out=args.out)
    bench_config("mid_dim256_b1024", dim=256, depth=8, heads=8,
                 batch=1024, iters=args.iters, impls=impls, out=args.out)
    bench_config("large_dim512_b1024", dim=512, depth=12, heads=8,
                 batch=1024, iters=args.iters, impls=impls, out=args.out)


if __name__ == "__main__":
    main()
