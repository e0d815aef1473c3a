#!/usr/bin/env bash
# Parity wrapper (reference script/profile_flops.sh): params/FLOPs/throughput.
cfg=${1:-cfgs/scanobjectnn/pointnext-s.yaml}; shift || true
python examples/classification/main.py --cfg "$cfg" --profile "$@"
