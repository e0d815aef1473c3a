#!/bin/bash
# Round-5 evidence queue (VERDICT r4 items 3 + 8): multi-seed matched
# hard-protocol ScanObjectNN-C pairs + the phase-B bf16 matched arm.
#
#   seeds 3047, 1222 : fresh matched base/adapt pairs (same data, same
#                      schedule as the committed seed-2768 r3 pair) so the
#                      method-margin tables get n=3 mean +/- std.
#   bf16 arm         : seed 2768 adapt with cfg.cls_precision=bf16 — the
#                      matched pair vs the committed seed-2768 f32 run
#                      (exact reproduction of that trajectory from the
#                      same data/seed was demonstrated in round 4).
#
# Data: deterministic crc32-seeded generator; regenerated if absent.
# Usage: bash scripts/run_seed_pairs_r5.sh [stage]
#   stage: s3047 | s1222 | bf16 | all (default)
set -e
cd "$(dirname "$0")/.."

if [ ! -d data_hard/ScanObjectNN ]; then
  python scripts/make_synthetic_scanobjectnn.py --protocol hard \
    --root data_hard --train 2048 --test 256
fi

COMMON="epochs=90 batch_size=32 val_batch_size=64 dataloader.num_workers=2 \
  dataset.common.data_dir=./data_hard/ScanObjectNN/h5_files/main_split \
  scanobjectnn_c_dir=./data_hard/ScanObjectNN_C/scanobjectnn_c"

run_base() {  # $1 = seed
  python examples/classification/main.py \
    --cfg cfgs/scanobjectnn/pointnext-s_valcorruption.yaml \
    $COMMON seed=$1 root_dir=log_tpu_hard_s$1_base
}
run_adapt() {  # $1 = seed
  python examples/classification/main.py \
    --cfg cfgs/scanobjectnn/pointnext-s_adaptpoint_1.yaml \
    $COMMON seed=$1 root_dir=log_tpu_hard_s$1_adapt
}
run_bf16() {
  python examples/classification/main.py \
    --cfg cfgs/scanobjectnn/pointnext-s_adaptpoint_1.yaml \
    $COMMON seed=2768 cls_precision=bf16 root_dir=log_tpu_hard_bf16_adapt
}

stage="${1:-all}"
case "$stage" in
  s3047) run_base 3047; run_adapt 3047 ;;
  s1222) run_base 1222; run_adapt 1222 ;;
  bf16) run_bf16 ;;
  all) run_base 3047; run_adapt 3047; run_base 1222; run_adapt 1222; run_bf16 ;;
  *) echo "unknown stage $stage"; exit 1 ;;
esac
