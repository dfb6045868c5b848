#!/usr/bin/env bash
# Recovery continuation of scripts/train_vit_nav_r5.sh after a TPU-tunnel
# stall wedged the arm-A PPO at 10.5M/35M steps (the known axon futex
# wedge: fresh clients work, the stuck process never recovers — verify
# SKILL.md gotcha). Stage 0 (attention bench) completed and is committed;
# the dim-256 fused VAE survives in /tmp/vit_dim256d8.pkl. This script
# re-runs the arm-A PPO WITH elastic checkpoints + resume retries (the
# hardening the radar r5 script already had), then eval, then the
# depth-4 ablation arm, then the ship-if-better step.
# Usage: bash scripts/train_vit_nav_r5b.sh [out.jsonl]

set -u
set -o pipefail
cd "$(dirname "$0")/.."
OUT="${1:-VIT_R5.jsonl}"
DCE=examples/dce_rl_navigation/selected_network
note() { echo "== $*" >&2; }

ppo_with_retry() {  # ppo_with_retry <vae_pkl> <ckpt_out> <ckdir> <log>
  local VAE="$1" CKPT="$2" CKDIR="$3" LOG="$4"
  mkdir -p "$CKDIR"
  local ATTEMPT=0
  while [ $ATTEMPT -lt 3 ]; do
    local RESUME=""
    # resume on retries AND on a fresh launch over surviving elastic
    # checkpoints (a previous driver's wedge must not discard progress)
    { [ $ATTEMPT -gt 0 ] || [ -n "$(ls -A "$CKDIR" 2>/dev/null)" ]; } \
      && RESUME="--resume"
    timeout 7200 python -m aerial_gym_simulator_tpu.rl.ppo \
      --task navigation_task --num_envs 1024 --total_steps 35000000 \
      --vae_params "$VAE" --save "$CKPT" \
      --ckpt_dir "$CKDIR" --save_every 100 $RESUME \
      2>&1 | tee -a "$LOG" | tail -2 && return 0
    ATTEMPT=$((ATTEMPT + 1))
    note "PPO attempt $ATTEMPT failed — retrying with --resume"
    sleep 60
  done
  return 1
}

eval_and_log() {  # eval_and_log <tag> <dim> <depth> <heads> <vae_s> <nav_s>
  local TAG="$1" DIM="$2" DEPTH="$3" HEADS="$4" VAE_S="$5" NAV_S="$6"
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

note "A(resume)/2 dim-256/depth-8 fused: PPO 35M (VAE reused from the stalled run; VAE_S=400 from its log)"
T0=$SECONDS
ppo_with_retry /tmp/vit_dim256d8.pkl /tmp/vit_dim256d8_nav.ckpt \
  /tmp/vit_r5_a_ckpt /tmp/vit_dim256d8_nav.log || exit 1
A_S=$((SECONDS - T0))
eval_and_log dim256d8 256 8 8 400 "$A_S"

note "B/2 depth ablation: dim-256/depth-4 fused at the same budget"
T0=$SECONDS
timeout 5400 python -m aerial_gym_simulator_tpu.models.train_vae \
  --arch vit --vit_attn fused --vit_dim 256 --vit_depth 4 --vit_heads 8 \
  --out /tmp/vit_dim256d4.pkl || exit 1
BV_S=$((SECONDS - T0))
T0=$SECONDS
ppo_with_retry /tmp/vit_dim256d4.pkl /tmp/vit_dim256d4_nav.ckpt \
  /tmp/vit_r5_b_ckpt /tmp/vit_dim256d4_nav.log || exit 1
B_S=$((SECONDS - T0))
eval_and_log dim256d4 256 4 8 "$BV_S" "$B_S"

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
ev["training_script"] = "scripts/train_vit_nav_r5b.sh"
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

note "done -> $OUT"
cat "$OUT"
