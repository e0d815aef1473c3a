#!/bin/bash
# TPU bench prewarm + compile-cache capture (VERDICT r4 #1c).
#
# Run at the end of every builder session:
#   1. executes bench.py against a dedicated cache dir (cold entries get
#      compiled once and persisted),
#   2. repacks the committed tarball .jax_cache_bench.tar.gz from that dir
#      so the NEXT cold machine (driver bench after a swap) seeds the
#      cache from the repo instead of paying the ~9-min axon compile wall.
#
# Usage: bash scripts/ci_tpu.sh [--no-bench]   (--no-bench: repack only)
set -e
cd "$(dirname "$0")/.."
CACHE=${ADAPTPOINT_TPU_CACHE_DIR:-$PWD/.jax_cache_bench}

if [ "${1:-}" != "--no-bench" ]; then
  ADAPTPOINT_TPU_CACHE_DIR="$CACHE" timeout 900 python bench.py
fi

if [ -d "$CACHE" ] && [ -n "$(ls -A "$CACHE" 2>/dev/null)" ]; then
  tar -czf .jax_cache_bench.tar.gz -C "$CACHE" .
  echo "repacked .jax_cache_bench.tar.gz: $(du -h .jax_cache_bench.tar.gz | cut -f1)," \
       "$(ls "$CACHE" | wc -l) entries"
else
  echo "cache dir $CACHE empty — nothing to repack" >&2
fi
