#!/usr/bin/env bash
# End-to-end re-validation of the navigation pipelines on the real chip
# (PERF.md pending list: the 77% / 63.7% success numbers predate the
# reference-parity sweep — lmf2 robot, dense lidar-nav catalog, learner
# value_bootstrap/normalize_value/bounds_loss).
#
# Run ALONE (TPU exclusivity — see .claude/skills/verify/SKILL.md).
# Usage: bash scripts/revalidate_nav_e2e.sh [outfile.jsonl]
# Total chip time: roughly 25 min vision + 10 min lidar.

set -u
cd "$(dirname "$0")/.."
OUT="${1:-NAV_REVALIDATE.jsonl}"
: > "$OUT"
note() { echo "== $*" >&2; }

note "0/4 TPU visible?"
timeout 300 python -c "import jax; print(jax.devices())" || {
  echo "TPU backend unreachable — aborting" >&2; exit 1; }

note "1/4 depth VAE (reference: frozen perception backbone)"
T0=$SECONDS
timeout 1800 python -m aerial_gym_simulator_tpu.models.train_vae \
  --out /tmp/reval_vae.pkl || exit 1
VAE_S=$((SECONDS - T0))

note "2/4 navigation PPO 35M steps (1024 envs, lmf2 + depth camera)"
T0=$SECONDS
timeout 3600 python -m aerial_gym_simulator_tpu.rl.ppo \
  --task navigation_task --num_envs 1024 --total_steps 35000000 \
  --vae_params /tmp/reval_vae.pkl --save /tmp/reval_nav.ckpt \
  2>&1 | tee /tmp/reval_nav.log | tail -3 || exit 1
NAV_S=$((SECONDS - T0))

note "3/4 navigation eval (success / crash / timeout)"
timeout 1800 python examples/dce_rl_navigation/run_trained_navigation_policy.py \
  --checkpoint /tmp/reval_nav.ckpt --vae_params /tmp/reval_vae.pkl \
  --num_envs 64 --steps 800 2>&1 | tee /tmp/reval_nav_eval.log | tail -2
python - "$OUT" <<EOF
import json, re
txt = open("/tmp/reval_nav_eval.log").read()
m = re.findall(r"success (\d+) \((\d+)%\) crash (\d+) timeout (\d+)", txt)
sps = [int(x) for x in re.findall(r"sps (\d+)", open("/tmp/reval_nav.log").read())]
rec = {"metric": "navigation_e2e", "vae_s": $VAE_S, "ppo_s": $NAV_S,
       "ppo_steps_per_s": sps[-1]  if sps else None}
if m:
    s, pct, c, t = m[-1]
    rec.update(success=int(s), success_pct=int(pct), crash=int(c),
               timeout=int(t))
open("$OUT", "a").write(json.dumps(rec) + "\n")
EOF

note "4/4 lidar navigation PPO 50M steps + eval (512 envs)"
T0=$SECONDS
timeout 3600 python -m aerial_gym_simulator_tpu.rl.ppo \
  --task lidar_navigation_task --num_envs 512 --total_steps 50000000 \
  --save /tmp/reval_lidar.ckpt \
  2>&1 | tee /tmp/reval_lidar.log | tail -3 || exit 1
LIDAR_S=$((SECONDS - T0))
timeout 1800 python - "$OUT" <<EOF
import json, re
import numpy as np
import jax; import jax.numpy as jnp
import aerial_gym_simulator_tpu as ag
from aerial_gym_simulator_tpu.rl.ppo import PPOConfig, PPOTrainer, enable_compilation_cache
enable_compilation_cache()
task = ag.task_registry.make_task("lidar_navigation_task", num_envs=64, seed=1)
trainer = PPOTrainer(task, PPOConfig(num_envs=64, horizon=8, minibatch_size=256))
trainer.load_checkpoint("/tmp/reval_lidar.ckpt")
obs, *_ = task.reset()
succ = crash = timo = 0
for i in range(800):
    a = trainer.act(obs["observations"], deterministic=True)
    obs, r, term, trunc, infos = task.step(a)
    succ += int(np.asarray(infos["successes"]).sum())
    crash += int(np.asarray(infos["crashes"]).sum())
    timo += int(np.asarray(infos["timeouts"]).sum())
tot = max(succ + crash + timo, 1)
sps = [int(x) for x in re.findall(r"sps (\d+)", open("/tmp/reval_lidar.log").read())]
rec = {"metric": "lidar_navigation_e2e", "ppo_s": $LIDAR_S,
       "ppo_steps_per_s": sps[-1]  if sps else None,
       "success": succ, "success_pct": round(100.0 * succ / tot, 1),
       "crash": crash, "timeout": timo}
open("$OUT", "a").write(json.dumps(rec) + "\n")
EOF

note "5/5 export shipped deployment artifacts (policy-regression anchors)"
# the repo's own trained-policy anchors (VERDICT r1 item 4): nav policy npz
# + frozen VAE + eval JSON committed under examples/dce_rl_navigation/
# (mirrors the reference's shipped selected_network/), consumed by
# run_trained_navigation_policy.py with NO flags and by
# tests/test_shipped_policies.py with NO reference checkout.
DCE=examples/dce_rl_navigation/selected_network
mkdir -p "$DCE"
timeout 600 python - <<EOF
from aerial_gym_simulator_tpu.sim2real.numpy_policy import export_policy_npz
export_policy_npz("/tmp/reval_nav.ckpt", "$DCE/navigation_policy.npz")
export_policy_npz("/tmp/reval_lidar.ckpt", "$DCE/lidar_navigation_policy.npz")
import shutil, json
shutil.copy("/tmp/reval_vae.pkl", "$DCE/depth_vae.pkl")
recs = [json.loads(l) for l in open("$OUT")]
json.dump(recs, open("$DCE/eval_results.json", "w"), indent=1)
print("shipped ->", "$DCE")
EOF

note "done -> $OUT (update PERF.md / PARITY.md / README.md; commit $DCE)"
cat "$OUT"
