#!/usr/bin/env bash
# Parity with reference script/test_all_in_one.sh: replay mode=test for saved
# checkpoints. Pass ckpt paths as env or edit below.
set -e
for cfg in cfgs/scanobjectnn/pointnext-s.yaml cfgs/scanobjectnn/dgcnn.yaml; do
  name=$(basename "$cfg" .yaml)
  ckpt=${CKPT_DIR:-log/scanobjectnn}/$name/checkpoint/*_ckpt_best.msgpack
  if ls $ckpt >/dev/null 2>&1; then
    python examples/classification/main.py --cfg "$cfg" mode=test pretrained_path=$(ls $ckpt | head -1)
  else
    echo "skip $name (no checkpoint at $ckpt)"
  fi
done
