#!/usr/bin/env bash
# Round-5 radar budget axis + ablation hardening (VERDICT r4 next #2):
#   A. the 1B-step parity run (the decisive budget axis; the reference's own
#      answer to this task is a 131B-step sample-factory budget,
#      train_aerialgym.py:223-245). Elastic-checkpointed and retried with
#      --resume so a chip-link outage (which killed both r4 attempts,
#      PERF.md r4) resumes instead of destroying the run.
#   B. oracle ablation (radar_mode=False, clean cone ranges) at the MATCHED
#      300M budget — the r4 arm ran 150M and the judge correctly flagged the
#      half-budget comparison.
#   C. parity recipe at a SECOND seed (8) — every r4 arm was single-seed 7.
# Eval is always 64 envs x 800 steps at the parity observation distribution
# (stage B evals on its own clean obs — that is the point of the ablation).
#
# Run ALONE on the chip (TPU exclusivity). Usage:
#   bash scripts/train_radar_r5.sh [outfile.jsonl]

set -u
set -o pipefail
cd "$(dirname "$0")/.."
OUT="${1:-RADAR_R5.jsonl}"
: > "$OUT"
note() { echo "== $*" >&2; }

eval_ckpt() {  # eval_ckpt <ckpt> <rnn_hidden> <metric_name> <extra_task_kv...>
  local CKPT="$1" HID="$2" NAME="$3"; shift 3
  timeout 2400 python - "$OUT" "$CKPT" "$HID" "$NAME" "$@" <<'PYEOF'
import json, sys
import numpy as np
import aerial_gym_simulator_tpu as ag
from aerial_gym_simulator_tpu.rl.ppo import (PPOConfig, PPOTrainer,
                                             enable_compilation_cache)
out, ckpt, hid, name = sys.argv[1:5]
kvs = sys.argv[5:]
enable_compilation_cache()
import ast
cfg = ag.task_registry.get_task_config("radar_navigation_task")
for kv in kvs:
    k, _, v = kv.partition("=")
    try:
        v = ast.literal_eval(v)
    except (ValueError, SyntaxError):
        pass
    setattr(cfg, k, v)
task = ag.task_registry.make_task("radar_navigation_task", num_envs=64,
                                  seed=1, task_config=cfg)
trainer = PPOTrainer(task, PPOConfig(num_envs=64, horizon=8,
                                     minibatch_size=256, rnn="gru",
                                     rnn_hidden=int(hid)))
trainer.load_checkpoint(ckpt)
obs, *_ = task.reset()
succ = crash = timo = 0
done_prev = None
for i in range(800):
    a = trainer.act(obs["observations"], deterministic=True,
                    done_prev=done_prev)
    obs, r, term, trunc, infos = task.step(a)
    done_prev = (np.asarray(term) > 0) | (np.asarray(trunc) > 0)
    succ += int(np.asarray(infos["successes"]).sum())
    crash += int(np.asarray(infos["crashes"]).sum())
    timo += int(np.asarray(infos["timeouts"]).sum())
tot = max(succ + crash + timo, 1)
rec = {"metric": name, "success": succ,
       "success_pct": round(100.0 * succ / tot, 1),
       "crash": crash, "timeout": timo, "rnn_hidden": int(hid),
       "eval_task_kv": kvs}
open(out, "a").write(json.dumps(rec) + "\n")
print(json.dumps(rec))
PYEOF
}

note "A/3 parity radar 1B steps, GRU-128, seed 7 (elastic ckpts, resume-on-failure)"
CKDIR=/tmp/radar_r5_1b_ckpt
mkdir -p "$CKDIR"
T0=$SECONDS
ATTEMPT=0
while [ $ATTEMPT -lt 3 ]; do
  RESUME=""
  [ $ATTEMPT -gt 0 ] && RESUME="--resume"
  timeout 10800 python -m aerial_gym_simulator_tpu.rl.ppo \
    --task radar_navigation_task \
    --num_envs 512 --total_steps 1000000000 \
    --rnn gru --rnn_hidden 128 --entropy_coef 0.001 --seed 7 \
    --ckpt_dir "$CKDIR" --save_every 400 $RESUME \
    --save /tmp/radar_1b.ckpt 2>&1 | tee -a /tmp/radar_1b.log | tail -2 \
    && break
  ATTEMPT=$((ATTEMPT + 1))
  note "stage A attempt $ATTEMPT failed — retrying with --resume"
  sleep 60
done
A_S=$((SECONDS - T0))
echo "{\"metric\": \"radar_1b_train_wall\", \"s\": $A_S, \"attempts\": $((ATTEMPT + 1))}" >> "$OUT"
[ -f /tmp/radar_1b.ckpt ] && eval_ckpt /tmp/radar_1b.ckpt 128 radar_1b_parity_eval

note "B/3 oracle ablation at MATCHED budget: clean cone (radar_mode=False), 300M, seed 7"
T0=$SECONDS
timeout 5400 python -m aerial_gym_simulator_tpu.rl.ppo \
  --task radar_navigation_task --task_kv radar_mode=False \
  --num_envs 512 --total_steps 300000000 \
  --rnn gru --rnn_hidden 128 --entropy_coef 0.001 --seed 7 \
  --save /tmp/radar_oracle300.ckpt 2>&1 | tee /tmp/radar_oracle300.log | tail -2
B_S=$((SECONDS - T0))
echo "{\"metric\": \"radar_oracle300_train_wall\", \"s\": $B_S}" >> "$OUT"
[ -f /tmp/radar_oracle300.ckpt ] && \
  eval_ckpt /tmp/radar_oracle300.ckpt 128 radar_oracle300_clean_cone_eval \
    radar_mode=False

note "C/3 parity recipe, second seed (8), 300M"
T0=$SECONDS
timeout 5400 python -m aerial_gym_simulator_tpu.rl.ppo \
  --task radar_navigation_task \
  --num_envs 512 --total_steps 300000000 \
  --rnn gru --rnn_hidden 128 --entropy_coef 0.001 --seed 8 \
  --save /tmp/radar_seed8.ckpt 2>&1 | tee /tmp/radar_seed8.log | tail -2
C_S=$((SECONDS - T0))
echo "{\"metric\": \"radar_seed8_train_wall\", \"s\": $C_S}" >> "$OUT"
[ -f /tmp/radar_seed8.ckpt ] && \
  eval_ckpt /tmp/radar_seed8.ckpt 128 radar_seed8_parity_eval

note "done -> $OUT (fold into PERF.md; ship the 1B policy if it beats 17.9%)"
cat "$OUT"
