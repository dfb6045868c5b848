#!/usr/bin/env bash
# Round-5 ViT campaign (VERDICT r4 next #1/#4/#7, folded):
#   0. scripts/vit_attention_bench.py — the xla/flash/fused on-chip
#      measurement, written INCREMENTALLY to ROOFLINE.jsonl (the r4 crash
#      lesson); this is the first shipped evidence for the in-repo fused
#      kernel (ops/attention_pallas.py) and the flash retraction.
#   A. dim-256/depth-8 ViT nav e2e with --vit_attn fused — the config the
#      (B,H,S,32)-layout kernels could not fit at batch 1024; answers
#      whether capacity closes the 81%-vs-89% conv gap.
#   B. depth ablation at the shipped budget: dim-256/depth-4 fused —
#      separates "needs more capacity" from "tokenization loses geometry".
# Ships the policy if it beats the committed 81% dim-128 artifact;
# otherwise records the numbers for PERF.md.
#
# Run ALONE on the chip. Usage: bash scripts/train_vit_nav_r5.sh [out.jsonl]

set -u
set -o pipefail
cd "$(dirname "$0")/.."
OUT="${1:-VIT_R5.jsonl}"
: > "$OUT"
DCE=examples/dce_rl_navigation/selected_network
note() { echo "== $*" >&2; }

note "0/3 attention bench (xla/flash/fused) -> ROOFLINE.jsonl"
timeout 3600 python scripts/vit_attention_bench.py --out ROOFLINE.jsonl \
  2>&1 | tail -8

run_arm() {  # run_arm <tag> <dim> <depth> <heads>
  local TAG="$1" DIM="$2" DEPTH="$3" HEADS="$4"
  note "ViT $TAG: VAE (dim $DIM depth $DEPTH heads $HEADS, fused attn)"
  local T0=$SECONDS
  timeout 5400 python -m aerial_gym_simulator_tpu.models.train_vae \
    --arch vit --vit_attn fused --vit_dim "$DIM" --vit_depth "$DEPTH" \
    --vit_heads "$HEADS" --out "/tmp/vit_${TAG}.pkl" || return 1
  local VAE_S=$((SECONDS - T0))
  note "ViT $TAG: navigation PPO 35M steps (frozen fused-ViT encoder)"
  T0=$SECONDS
  timeout 7200 python -m aerial_gym_simulator_tpu.rl.ppo \
    --task navigation_task --num_envs 1024 --total_steps 35000000 \
    --vae_params "/tmp/vit_${TAG}.pkl" --save "/tmp/vit_${TAG}_nav.ckpt" \
    2>&1 | tee "/tmp/vit_${TAG}_nav.log" | tail -2 || return 1
  local NAV_S=$((SECONDS - T0))
  note "ViT $TAG: eval 64 envs x 800 steps"
  timeout 1800 python examples/dce_rl_navigation/run_trained_navigation_policy.py \
    --checkpoint "/tmp/vit_${TAG}_nav.ckpt" --vae_params "/tmp/vit_${TAG}.pkl" \
    --num_envs 64 --steps 800 2>&1 | tee "/tmp/vit_${TAG}_eval.log" | tail -2
  python - "$OUT" "$TAG" "$VAE_S" "$NAV_S" "$DIM" "$DEPTH" "$HEADS" <<'PYEOF'
import json, re, sys
out, tag, vae_s, nav_s, dim, depth, heads = sys.argv[1:8]
txt = open(f"/tmp/vit_{tag}_eval.log").read()
m = re.findall(r"success (\d+) \((\d+)%\) crash (\d+) timeout (\d+)", txt)
sps = [int(x) for x in re.findall(r"sps (\d+)",
                                  open(f"/tmp/vit_{tag}_nav.log").read())]
rec = {"metric": f"navigation_e2e_vit_{tag}", "attn": "fused",
       "dim": int(dim), "depth": int(depth), "heads": int(heads),
       "vae_s": int(vae_s), "ppo_s": int(nav_s),
       "ppo_steps_per_s": sps[-1] if sps else None}
if m:
    s, pct, c, t = m[-1]
    rec.update(success=int(s), success_pct=int(pct), crash=int(c),
               timeout=int(t))
open(out, "a").write(json.dumps(rec) + "\n")
print(json.dumps(rec))
PYEOF
}

note "A/3 dim-256/depth-8 fused (the capacity the old layouts couldn't fit)"
run_arm dim256d8 256 8 8

note "B/3 depth ablation: dim-256/depth-4 fused at the same budget"
run_arm dim256d4 256 4 8

note "ship: replace the committed ViT artifact iff a fused arm beats 81%"
timeout 900 python - "$OUT" <<'PYEOF'
import json, shutil, sys
lines = [json.loads(l) for l in open(sys.argv[1])]
arms = [r for r in lines if r.get("success_pct") is not None]
if not arms:
    print("no completed arms; committed dim-128 artifact stands")
    raise SystemExit(0)
best = max(arms, key=lambda r: r["success_pct"])
if best["success_pct"] <= 81:
    print(f"best fused arm {best['metric']}={best['success_pct']}% <= 81%; "
          "committed dim-128 artifact stands")
    raise SystemExit(0)
tag = best["metric"].replace("navigation_e2e_vit_", "")
from aerial_gym_simulator_tpu.sim2real.numpy_policy import export_policy_npz
dst = "examples/dce_rl_navigation/selected_network/vit_navigation_policy.npz"
export_policy_npz(f"/tmp/vit_{tag}_nav.ckpt", dst)
shutil.copy(f"/tmp/vit_{tag}.pkl",
            "examples/dce_rl_navigation/selected_network/vit_depth_encoder.pkl")
ev = dict(best)
ev["metric"] = "navigation_e2e_vit_encoder"
ev["training_script"] = "scripts/train_vit_nav_r5.sh"
ev["seed"] = 42
ev["recipe"] = (f"dim-{best['dim']}/depth-{best['depth']} fused-attention "
                "ViT encoder (train_vae --arch vit --vit_attn fused, seed "
                "0), 35M-step navigation PPO at 1024 envs (rl/ppo.py seed "
                "42)")
ev["source_artifact"] = f"VIT_R5.jsonl metric={best['metric']}"
ev["shipped_from"] = dst
with open("examples/dce_rl_navigation/selected_network/vit_eval.json",
          "w") as f:
    json.dump(ev, f, indent=1)
    f.write("\n")
print(f"shipped {dst} from /tmp/vit_{tag}_nav.ckpt -> "
      f"{best['success_pct']}%")
PYEOF

note "done -> $OUT (fold into PERF.md; commit artifacts if shipped)"
cat "$OUT"
