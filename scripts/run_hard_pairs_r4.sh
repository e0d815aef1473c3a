#!/bin/bash
# Round-4 evidence runs (VERDICT r3 item 4): matched hard-protocol pairs on
# the real TPU for ModelNet-C and ShapeNetPart-C — same discipline as the
# round-3 ScanObjectNN pairs (log_tpu_hard_{base,adapt}_r3/).
#
# Data: scripts/make_synthetic_scanobjectnn.py --protocol hard
#   --benchmark modelnet   --root data_hard_mn   --train 2048 --test 256
#   --benchmark shapenetpart --root data_hard_part --train 2048 --test 256
#
# Usage: bash scripts/run_hard_pairs_r4.sh [stage]
#   stage: mn_base | mn_adapt | part_base | part_adapt | all
set -e
cd "$(dirname "$0")/.."
SEED=2768
MN_COMMON="epochs=90 batch_size=32 val_batch_size=64 dataloader.num_workers=2 \
  dataset.common.data_dir=data_hard_mn/ModelNet40Ply2048 \
  modelnet_c_dir=data_hard_mn/ModelNetC/modelnet_c seed=$SEED"
PART_COMMON="epochs=60 batch_size=32 val_batch_size=32 dataloader.num_workers=2 \
  dataset.common.data_root=data_hard_part/ShapeNetPart \
  shapenet_c_dir=data_hard_part/shapenet_c eval_shapenet_c=True seed=$SEED"

stage="${1:-all}"

run_mn_base() {
  python examples/classification/main.py --cfg cfgs/modelnetc/pointnext-s.yaml \
    $MN_COMMON root_dir=log_tpu_hard_mn_base
}
run_mn_adapt() {
  python examples/classification/main.py --cfg cfgs/modelnetc/pointnext-s_adaptpoint.yaml \
    $MN_COMMON root_dir=log_tpu_hard_mn_adapt
}
run_part_base() {
  python examples/shapenetpart/main.py --cfg cfgs/shapenetpart/pointnext-s.yaml \
    $PART_COMMON root_dir=log_tpu_hard_part_base
}
run_part_adapt() {
  python examples/shapenetpart/main.py --cfg cfgs/shapenetpart/pointnext-s_adaptpoint.yaml \
    $PART_COMMON root_dir=log_tpu_hard_part_adapt
}

case "$stage" in
  mn_base) run_mn_base ;;
  mn_adapt) run_mn_adapt ;;
  part_base) run_part_base ;;
  part_adapt) run_part_adapt ;;
  all) run_mn_base; run_mn_adapt; run_part_base; run_part_adapt ;;
  *) echo "unknown stage $stage"; exit 1 ;;
esac
