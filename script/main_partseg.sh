#!/usr/bin/env bash
cfg=$1; shift
python examples/shapenetpart/main.py --cfg "$cfg" "$@"
