#!/bin/bash
# The 5-stage self-play curriculum (RESULTS.md runs C->E->F->G->H recipe),
# end-to-end on whatever accelerator JAX sees.  Hyperparameters match the
# round-2 CPU curriculum: 600-iteration stages, E=256 envs, horizon 64,
# shaping 0.1, suite-matched pool (side 4.0), stage order 2->4->4->6->10
# agents, each stage warm-started from the previous stage's net with a
# fresh optimizer (train_ppo.py --init-params).
#
# Measured (PERF.md): full curriculum = 49M env-steps, ~8 min wall on one
# TPU v5e chip (~4.5 h on this machine's CPU).  The shipped
# models/weights/ppo_selfplay_10agent_tpu.npz is the stage-5 output of
# this exact script on the chip.
set -e
cd "$( dirname "${BASH_SOURCE[0]}" )/.."
D=${1:-results/tpu_curriculum}
mkdir -p "$D"
COMMON="--arch ga3c --self-play --envs 256 --horizon 64 --iters 600 --shaping 0.1 --pool-side 4.0"
T0=$(date +%s)
for spec in "1 2 " "2 4 $D/stage1_2ag.npz" "3 4 $D/stage2_4ag.npz" "4 6 $D/stage3_4ag.npz" "5 10 $D/stage4_6ag.npz"; do
  set -- $spec; N=$1; A=$2; INIT=$3
  if [ -f "$D/stage${N}_${A}ag.npz" ]; then echo "STAGE $N done, skip"; continue; fi
  S0=$(date +%s)
  if [ -n "$INIT" ]; then IP="--init-params $INIT"; else IP=""; fi
  python scripts/train_ppo.py $COMMON --agents $A $IP \
      --export-params "$D/stage${N}_${A}ag.npz"
  echo "STAGE $N (${A}ag) wall: $(( $(date +%s) - S0 ))s"
done
echo "TOTAL curriculum wall: $(( $(date +%s) - T0 ))s"
