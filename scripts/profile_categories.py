"""Summarize an existing jax.profiler device trace by HLO category.

Complements profile_trace.py / profile_phaseb.py (which print per-op
device times): this groups the same "XLA Ops" device events by their
``hlo_category`` metadata and separately totals pure data-movement ops
(copy / convert / broadcast / transpose / reshape / slice), which is the
fastest way to see how much of a step is Pallas custom-calls vs XLA
fusions vs eliminable movement.

Round-4 reading at the bench protocol (3 gan_steps + 1 phase-B step,
v5e-1): custom-call (Pallas kernels) 59.2 ms/step = 84% of phase A;
loop+convolution fusions ~11.3 ms; data formatting 3.6 ms; total pure
data movement 7.2 ms/step of which ~1 ms is unattributed large policy
converts — i.e. the former "XLA tail" is no longer the lever, the Pallas
kernels (at their measured structural floor, STATUS.md) are the step.

Usage: python scripts/profile_categories.py [trace_dir]
  trace_dir defaults to /tmp/jax_trace_r3 (profile_trace.py's output).
  Pass the number of traced steps via --steps N (default 3) to get
  per-step numbers.
"""
import argparse
import glob
import gzip
import json
import re
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir", nargs="?", default="/tmp/jax_trace_r3")
    ap.add_argument("--steps", type=int, default=3,
                    help="traced step count to divide totals by")
    args = ap.parse_args()

    files = glob.glob(f"{args.trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print(f"no trace under {args.trace_dir} — run scripts/"
              f"profile_trace.py first", file=sys.stderr)
        return 1
    with gzip.open(sorted(files)[-1], "rt") as f:
        data = json.load(f)

    tidname = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tidname[(e.get("pid"), e.get("tid"))] = e["args"].get("name")

    agg, cat = {}, {}
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        if tidname.get((e.get("pid"), e.get("tid"))) != "XLA Ops":
            continue
        n = e.get("name", "?")
        agg[n] = agg.get(n, 0.0) + e.get("dur", 0)
        c = (e.get("args") or {}).get("hlo_category", "?")
        cat[c] = cat.get(c, 0.0) + e.get("dur", 0)

    k = max(args.steps, 1)
    print(f"device XLA-op total: {sum(agg.values()) / 1e3:.1f} ms "
          f"({k} steps)")
    print("\nby hlo_category (us/step):")
    for name, v in sorted(cat.items(), key=lambda kv: -kv[1]):
        print(f"  {v / k:9.0f}  {name}")

    move = re.compile(r"(copy|convert_element_type|broadcast|transpose"
                      r"|reshape|bitcast|slice|concatenate|dynamic)")
    total = 0.0
    rows = []
    for name, v in sorted(agg.items(), key=lambda kv: -kv[1]):
        if move.match(name):
            total += v
            if v / k > 100:
                rows.append(f"  {v / k:8.0f}  {name}")
    print("\npure data-movement ops > 100 us/step:")
    print("\n".join(rows))
    print(f"  TOTAL data movement: {total / k / 1e3:.2f} ms/step")
    return 0


if __name__ == "__main__":
    sys.exit(main())
