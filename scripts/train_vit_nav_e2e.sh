#!/usr/bin/env bash
# ViT-encoder navigation end-to-end + SHIPPED artifacts (VERDICT r3 #4:
# the 81%-success ViT policy from round 3 was trained in /tmp and only its
# metrics were committed; this run re-trains it and commits the policy npz
# + encoder pickle + eval JSON, with a replay test in
# tests/test_shipped_policies.py).
#
# Mirrors scripts/revalidate_nav_e2e.sh stages with --arch vit (the
# transformer perception backbone, models/vit.py).
#
# Run ALONE on the chip (TPU exclusivity). Usage:
#   bash scripts/train_vit_nav_e2e.sh [outfile.jsonl]

set -u
cd "$(dirname "$0")/.."
OUT="${1:-VIT_TRAIN.jsonl}"
DCE=examples/dce_rl_navigation/selected_network
note() { echo "== $*" >&2; }

note "1/3 ViT depth encoder (train_vae --arch vit)"
T0=$SECONDS
timeout 1800 python -m aerial_gym_simulator_tpu.models.train_vae \
  --arch vit --out /tmp/vit_vae.pkl || exit 1
VAE_S=$((SECONDS - T0))

note "2/3 navigation PPO 35M steps with the frozen ViT encoder"
T0=$SECONDS
timeout 3600 python -m aerial_gym_simulator_tpu.rl.ppo \
  --task navigation_task --num_envs 1024 --total_steps 35000000 \
  --vae_params /tmp/vit_vae.pkl --save /tmp/vit_nav.ckpt \
  2>&1 | tee /tmp/vit_nav.log | tail -3 || exit 1
NAV_S=$((SECONDS - T0))

note "3/3 eval + ship"
timeout 1800 python examples/dce_rl_navigation/run_trained_navigation_policy.py \
  --checkpoint /tmp/vit_nav.ckpt --vae_params /tmp/vit_vae.pkl \
  --num_envs 64 --steps 800 2>&1 | tee /tmp/vit_nav_eval.log | tail -2
python - "$OUT" <<EOF
import json, re, shutil
txt = open("/tmp/vit_nav_eval.log").read()
m = re.findall(r"success (\d+) \((\d+)%\) crash (\d+) timeout (\d+)", txt)
sps = [int(x) for x in re.findall(r"sps (\d+)", open("/tmp/vit_nav.log").read())]
rec = {"metric": "navigation_e2e_vit_encoder", "vae_s": $VAE_S,
       "ppo_s": $NAV_S, "ppo_steps_per_s": sps[-1] if sps else None}
if m:
    s, pct, c, t = m[-1]
    rec.update(success=int(s), success_pct=int(pct), crash=int(c),
               timeout=int(t))
open("$OUT", "a").write(json.dumps(rec) + "\n")
print(json.dumps(rec))

from aerial_gym_simulator_tpu.sim2real.numpy_policy import export_policy_npz
export_policy_npz("/tmp/vit_nav.ckpt", "$DCE/vit_navigation_policy.npz")
shutil.copy("/tmp/vit_vae.pkl", "$DCE/vit_depth_encoder.pkl")
json.dump(rec, open("$DCE/vit_eval.json", "w"), indent=1)
print("shipped -> $DCE/vit_navigation_policy.npz + vit_depth_encoder.pkl")
EOF

note "done -> $OUT (commit $DCE artifacts)"
tail -1 "$OUT"
