#!/usr/bin/env bash
# Parity wrapper (reference script/main_classification.sh): launch a
# classification experiment. TPU mesh replaces multi-GPU spawn.
# usage: bash script/main_classification.sh cfgs/scanobjectnn/pointnext-s.yaml [k=v ...]
cfg=$1; shift
python examples/classification/main.py --cfg "$cfg" "$@"
