#!/bin/bash
# Round-5 confirmation pair for the part-seg oscillation diagnosis
# (STATUS.md "the part-seg GAN oscillation diagnosed"): same matched
# 60-epoch hard-protocol pair as run_hard_pairs_r4.sh part_*, but with the
# schedule annealed TO the 60-epoch budget (sched=cosine) instead of
# truncating the 300-epoch multistep recipe before its first decay.
# Prediction: final-state sweep lands within ~2 pts of best-state in both
# arms (the +/-8-10 pt final-epoch lottery at constant lr=0.002 closes).
set -e
cd "$(dirname "$0")/.."
SEED=2768
if [ ! -d data_hard_part/ShapeNetPart ]; then
  python scripts/make_synthetic_scanobjectnn.py --protocol hard \
    --benchmark shapenetpart --root data_hard_part --train 2048 --test 256
fi
PART_COMMON="epochs=60 sched=cosine batch_size=32 val_batch_size=32 \
  dataloader.num_workers=2 \
  dataset.common.data_root=data_hard_part/ShapeNetPart \
  shapenet_c_dir=data_hard_part/shapenet_c eval_shapenet_c=True seed=$SEED"

stage="${1:-all}"
run_base() {
  python examples/shapenetpart/main.py --cfg cfgs/shapenetpart/pointnext-s.yaml \
    $PART_COMMON root_dir=log_tpu_part_cos_base
}
run_adapt() {
  python examples/shapenetpart/main.py \
    --cfg cfgs/shapenetpart/pointnext-s_adaptpoint.yaml \
    $PART_COMMON root_dir=log_tpu_part_cos_adapt
}
case "$stage" in
  base) run_base ;;
  adapt) run_adapt ;;
  all) run_base; run_adapt ;;
  *) echo "unknown stage $stage"; exit 1 ;;
esac
