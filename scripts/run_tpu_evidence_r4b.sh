#!/bin/bash
# Round-4 evidence re-runs (supersedes run_tpu_queue_r4.sh part_best /
# mn_extend): the machine swap during the axon outage dropped the run-dir
# checkpoints (only cfg/log/outcorruption/scalars are committed), so the
# best-ckpt sweeps and the 90->210-epoch resume extension are impossible.
# Instead, re-run both matched pairs from scratch with the CURRENT code:
#   part pair : 60 epochs as before — partseg_main now sweeps ShapeNet-C on
#               BOTH the final state and the best checkpoint at the end, so
#               one run per arm yields the best-vs-best comparison the old
#               pair is missing.
#   mn pair   : 210 epochs (the old 90-epoch adapt arm was visibly
#               undertrained, train_oa 45 vs 77); fresh matched pair, same
#               seed/data, cosine schedule computed for 210 in both arms.
# Data: regenerate first if absent (deterministic crc32-seeded generator):
#   python scripts/make_synthetic_scanobjectnn.py --protocol hard \
#     --benchmark modelnet --root data_hard_mn --train 2048 --test 256
#   python scripts/make_synthetic_scanobjectnn.py --protocol hard \
#     --benchmark shapenetpart --root data_hard_part --train 2048 --test 256
# Usage: bash scripts/run_tpu_evidence_r4b.sh [stage]
#   stage: part_base | part_adapt | mn_base | mn_adapt | part | mn | all
set -e
cd "$(dirname "$0")/.."
SEED=2768
MN_COMMON="epochs=210 batch_size=32 val_batch_size=64 dataloader.num_workers=2 \
  dataset.common.data_dir=data_hard_mn/ModelNet40Ply2048 \
  modelnet_c_dir=data_hard_mn/ModelNetC/modelnet_c seed=$SEED"
PART_COMMON="epochs=60 batch_size=32 val_batch_size=32 dataloader.num_workers=2 \
  dataset.common.data_root=data_hard_part/ShapeNetPart \
  shapenet_c_dir=data_hard_part/shapenet_c eval_shapenet_c=True seed=$SEED"

run_part_base() {
  python examples/shapenetpart/main.py --cfg cfgs/shapenetpart/pointnext-s.yaml \
    $PART_COMMON root_dir=log_tpu_hard_part_base
}
run_part_adapt() {
  python examples/shapenetpart/main.py --cfg cfgs/shapenetpart/pointnext-s_adaptpoint.yaml \
    $PART_COMMON root_dir=log_tpu_hard_part_adapt
}
run_mn_base() {
  python examples/classification/main.py --cfg cfgs/modelnetc/pointnext-s.yaml \
    $MN_COMMON root_dir=log_tpu_hard_mn_base
}
run_mn_adapt() {
  python examples/classification/main.py --cfg cfgs/modelnetc/pointnext-s_adaptpoint.yaml \
    $MN_COMMON root_dir=log_tpu_hard_mn_adapt
}

stage="${1:-all}"
case "$stage" in
  part_base) run_part_base ;;
  part_adapt) run_part_adapt ;;
  mn_base) run_mn_base ;;
  mn_adapt) run_mn_adapt ;;
  part) run_part_base; run_part_adapt ;;
  mn) run_mn_base; run_mn_adapt ;;
  all) run_part_base; run_part_adapt; run_mn_base; run_mn_adapt ;;
  *) echo "unknown stage $stage"; exit 1 ;;
esac
