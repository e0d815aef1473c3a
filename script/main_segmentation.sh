#!/usr/bin/env bash
cfg=$1; shift
python examples/segmentation/main.py --cfg "$cfg" "$@"
