#!/usr/bin/env bash
# On-chip re-measurement after hot-path / config changes (PERF.md pending
# list). Run ALONE — TPU jobs must be exclusive (see
# .claude/skills/verify/SKILL.md): kill/await all other python/jax
# processes first or the new process can wedge on a futex.
#
# Usage:  bash scripts/remeasure_tpu.sh [outfile.json]
# Writes one JSON object per line per measurement.

set -u
cd "$(dirname "$0")/.."
OUT="${1:-PERF_REMEASURE.jsonl}"
: > "$OUT"

note() { echo "== $*" >&2; }

note "0/5 TPU visible?"
timeout 300 python -c "import jax; print(jax.devices())" || {
  echo "TPU backend unreachable — aborting" >&2; exit 1; }

note "1/5 canonical bench (position task + render-in-loop, 16k envs)"
timeout 1200 python bench.py | tail -2 >> "$OUT"

note "2/5 position PPO incl. learner (reference hyperparameters)"
timeout 1800 python -m aerial_gym_simulator_tpu.rl.ppo \
  --num_envs 8192 --total_steps 30000000 2>&1 | tee /tmp/remeasure_ppo.log \
  | tail -3
python - "$OUT" <<'EOF'
import json, re, sys
txt = open("/tmp/remeasure_ppo.log").read()
sps = [int(m) for m in re.findall(r"sps (\d+)", txt)]
rew = re.findall(r"reward\s+([-\d.]+)", txt)
if sps:
    json.dump({"metric": "position_ppo_env_steps_per_s", "value": sps[-1],
               "unit": "steps/s", "final_reward": float(rew[-1]) if rew else None},
              open(sys.argv[1], "a")); open(sys.argv[1], "a").write("\n")
EOF

note "3/5 navigation PPO throughput (lmf2 + GRU-free fused path, 1024 envs)"
timeout 2400 python -m aerial_gym_simulator_tpu.rl.ppo \
  --task navigation_task --num_envs 1024 --total_steps 3000000 \
  2>&1 | tee /tmp/remeasure_nav.log | tail -3
python - "$OUT" nav_ppo_env_steps_per_s /tmp/remeasure_nav.log <<'EOF'
import json, re, sys
txt = open(sys.argv[3]).read()
sps = [int(m) for m in re.findall(r"sps (\d+)", txt)]
if sps:
    json.dump({"metric": sys.argv[2], "value": sps[-1], "unit": "steps/s"},
              open(sys.argv[1], "a")); open(sys.argv[1], "a").write("\n")
EOF

note "4/5 lidar navigation PPO throughput (512 envs)"
timeout 2400 python -m aerial_gym_simulator_tpu.rl.ppo \
  --task lidar_navigation_task --num_envs 512 --total_steps 3000000 \
  2>&1 | tee /tmp/remeasure_lidar.log | tail -3
python - "$OUT" lidar_nav_ppo_env_steps_per_s /tmp/remeasure_lidar.log <<'EOF'
import json, re, sys
txt = open(sys.argv[3]).read()
sps = [int(m) for m in re.findall(r"sps (\d+)", txt)]
if sps:
    json.dump({"metric": sys.argv[2], "value": sps[-1], "unit": "steps/s"},
              open(sys.argv[1], "a")); open(sys.argv[1], "a").write("\n")
EOF

note "5/5 render throughput (270x480 depth, 16 envs)"
timeout 1200 python examples/benchmark.py --mode render 2>&1 | tail -2 \
  | tee /tmp/remeasure_render.log
python - "$OUT" <<'EOF'
import json, re, sys
txt = open("/tmp/remeasure_render.log").read()
fps = re.findall(r"([\d,]+)\s*frames/s", txt)
rays = re.findall(r"\(([\d.]+)\s*M rays/s\)", txt)
if fps:
    json.dump({"metric": "render_frames_per_s",
               "value": float(fps[-1].replace(",", "")), "unit": "frames/s",
               "m_rays_per_s": float(rays[-1]) if rays else None},
              open(sys.argv[1], "a")); open(sys.argv[1], "a").write("\n")
EOF

note "done -> $OUT  (update CLAUDE.md / PERF.md / README.md with these)"
cat "$OUT"
