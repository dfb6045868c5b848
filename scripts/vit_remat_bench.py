#!/usr/bin/env python
"""Time the remat-enabled large-ViT config on chip — the follow-up to the
r5 finding that dim-512/depth-12 at batch 1024 OOMs under EVERY attention
impl (ROOFLINE.jsonl vit_attention_large_dim512_b1024) because saved MLP
activations bind. --vit_remat/DepthViT(remat=True) trades one recompute
forward for O(depth) activation memory; this emits one ROOFLINE-style
line per (impl, remat) pairing that fits, completion-anchored.

Run ALONE on the chip. Usage: python scripts/vit_remat_bench.py [--out F]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    from aerial_gym_simulator_tpu.models.vit import DepthViT

    key = jax.random.PRNGKey(0)
    batch, hw = 1024, (135, 240)
    x = jax.random.uniform(key, (batch,) + hw + (1,), jnp.float32)
    params = None
    for impl in ("fused", "xla"):
        model = DepthViT(latent_dim=64, out_hw=hw, patch=(9, 16), dim=512,
                         depth=12, num_heads=8, attn_impl=impl, remat=True)
        if params is None:
            params = model.init(key, x[:1], key)
        cparams = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16), params)
        xb = x.astype(jnp.bfloat16)

        def loss_fn(p, model=model):
            mean, logvar = model.apply(p, xb, method=DepthViT.encode)
            return (jnp.sum(mean.astype(jnp.float32) ** 2)
                    + jnp.sum(logvar.astype(jnp.float32) ** 2)) / batch

        step = jax.jit(jax.value_and_grad(loss_fn))
        rec = {"study": f"vit_remat_dim512_b1024_{impl}", "dim": 512,
               "depth": 12, "heads": 8, "batch": batch, "seq": 225,
               "remat": True, "attn": impl, "round": 5}
        try:
            loss, grads = step(cparams)
            _ = float(loss) + float(jnp.sum(
                jax.tree_util.tree_leaves(grads)[0].astype(jnp.float32)))
            t0 = time.perf_counter()
            for _ in range(args.iters):
                loss, grads = step(cparams)
            anchor = float(loss) + float(jnp.sum(
                jax.tree_util.tree_leaves(grads)[0].astype(jnp.float32)))
            assert np.isfinite(anchor)
            dt = (time.perf_counter() - t0) / args.iters
            rec["ms"] = round(dt * 1e3, 3)
            rec["steps_per_s"] = round(batch / dt, 1)
        except Exception as e:  # noqa: BLE001
            rec["error"] = str(e).split("\n")[0][:200]
        print(json.dumps(rec), flush=True)
        if args.out:
            with open(args.out, "a") as f:
                f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
