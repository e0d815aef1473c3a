#!/bin/bash
# Round-4 TPU-blocked work queue — run (serially!) as soon as the axon
# relay is back. Stages, in order:
#   part_best : ShapeNet-C sweeps on the BEST checkpoints of the matched
#               hard-protocol part-seg pair (the adapt run's final epoch
#               was a GAN trough; best-vs-best is the fair comparison).
#   mn_extend : extend the matched ModelNet-C pair 90 -> 210 epochs via
#               mode=resume (VERDICT item 4: the 90-epoch adapt arm was
#               visibly undertrained, train_oa 45 vs 77). Same budget both
#               arms; cosine schedule recomputed for epochs=210 in both.
#   goldens   : TPU kernel-golden tier.
#   bench     : headline BENCH (expect ~358 clouds/s after the
#               frozen-cotangent skip).
# Usage: bash scripts/run_tpu_queue_r4.sh [stage]   (default: all)
set -e
cd "$(dirname "$0")/.."
SEED=2768

PART_BASE_DIR=log_tpu_hard_part_base/shapenetpart/shapenetpart-pointnext-s-20260818-105448-f1123032
PART_ADAPT_DIR=log_tpu_hard_part_adapt/shapenetpart/shapenetpart-pointnext-s_adaptpoint-20260818-124419-ae1ba8bb
PART_COMMON="batch_size=32 val_batch_size=32 dataloader.num_workers=2 \
  dataset.common.data_root=data_hard_part/ShapeNetPart \
  shapenet_c_dir=data_hard_part/shapenet_c eval_shapenet_c=True seed=$SEED"

MN_COMMON="epochs=210 batch_size=32 val_batch_size=64 dataloader.num_workers=2 \
  dataset.common.data_dir=data_hard_mn/ModelNet40Ply2048 \
  modelnet_c_dir=data_hard_mn/ModelNetC/modelnet_c seed=$SEED resume=True"

run_part_best() {
  python examples/shapenetpart/main.py --cfg cfgs/shapenetpart/pointnext-s.yaml \
    $PART_COMMON mode=test \
    pretrained_path=$PART_BASE_DIR/checkpoint/$(basename $PART_BASE_DIR)_ckpt_best.msgpack
  python examples/shapenetpart/main.py --cfg cfgs/shapenetpart/pointnext-s_adaptpoint.yaml \
    $PART_COMMON mode=test \
    pretrained_path=$PART_ADAPT_DIR/checkpoint/$(basename $PART_ADAPT_DIR)_ckpt_best.msgpack
}

run_mn_extend() {
  local MN_BASE_DIR MN_ADAPT_DIR
  MN_BASE_DIR=$(ls -d log_tpu_hard_mn_base/modelnetc/* | head -1)
  MN_ADAPT_DIR=$(ls -d log_tpu_hard_mn_adapt/modelnetc/* | head -1)
  python examples/classification/main.py --cfg cfgs/modelnetc/pointnext-s.yaml \
    $MN_COMMON root_dir=log_tpu_hard_mn_base \
    pretrained_path=$MN_BASE_DIR/checkpoint/$(basename $MN_BASE_DIR)_ckpt_latest.msgpack
  python examples/classification/main.py --cfg cfgs/modelnetc/pointnext-s_adaptpoint.yaml \
    $MN_COMMON root_dir=log_tpu_hard_mn_adapt \
    pretrained_path=$MN_ADAPT_DIR/checkpoint/$(basename $MN_ADAPT_DIR)_ckpt_latest.msgpack
}

run_goldens() {
  ADAPTPOINT_TPU_TESTS=1 python -m pytest tests/ -q -m tpu
}

run_bench() {
  python bench.py
}

stage="${1:-all}"
case "$stage" in
  part_best) run_part_best ;;
  mn_extend) run_mn_extend ;;
  goldens) run_goldens ;;
  bench) run_bench ;;
  all) run_part_best; run_goldens; run_bench; run_mn_extend ;;
  *) echo "unknown stage $stage"; exit 1 ;;
esac
