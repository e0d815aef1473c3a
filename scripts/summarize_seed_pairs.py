"""Summarize the multi-seed ScanObjectNN-C hard-protocol evidence
(VERDICT r4 #3): for each seed's matched base/adapt pair, pull best val
OA + the final-state (latest) and best-ckpt corruption sweeps from the
committed run dirs, and print per-seed rows plus mean +/- std margins.

Run dirs: log_tpu_hard_{base,adapt}_r3 (seed 2768, round 3) and
log_tpu_hard_s{SEED}_{base,adapt} (round 5); the bf16 arm
(log_tpu_hard_bf16_adapt) is compared against the seed-2768 f32 run.
"""
import ast
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _sweeps(run_dir):
    """outcorruption.txt holds one sweep per eval (epoch blocks + the
    final_latest/final_best pair); return the list of summary dicts in
    file order."""
    path = os.path.join(run_dir, "outcorruption.txt")
    out = []
    if not os.path.exists(path):
        return out
    for line in open(path):
        line = line.strip()
        if line.startswith("{") and "mCE" in line:
            try:
                out.append(ast.literal_eval(line))
            except (ValueError, SyntaxError):
                pass
    return out


def _best_oa(run_dir):
    best = None
    logf = os.path.join(run_dir, "log.txt")
    if os.path.exists(logf):
        for line in open(logf):
            m = re.search(r"best (\d+\.\d+)", line)
            if m:
                best = float(m.group(1))
    return best


def _run_dir(root):
    cands = sorted(glob.glob(os.path.join(REPO, root, "scanobjectnn", "*")))
    return cands[-1] if cands else None


def collect(root):
    d = _run_dir(root)
    if d is None:
        return None
    sweeps = _sweeps(d)
    # the final two sweeps are latest-state then best-ckpt (corrupt_main /
    # adapt_main end-of-training order); earlier entries are cadence evals
    latest = sweeps[-2] if len(sweeps) >= 2 else (sweeps[-1] if sweeps else None)
    best = sweeps[-1] if len(sweeps) >= 2 else None
    return {"dir": os.path.basename(d), "best_oa": _best_oa(d),
            "latest": latest, "best": best}


def main():
    pairs = [("2768", "log_tpu_hard_base_r3", "log_tpu_hard_adapt_r3"),
             ("3047", "log_tpu_hard_s3047_base", "log_tpu_hard_s3047_adapt"),
             ("1222", "log_tpu_hard_s1222_base", "log_tpu_hard_s1222_adapt")]
    rows = []
    for seed, b, a in pairs:
        rb, ra = collect(b), collect(a)
        if not (rb and ra and rb["latest"] and ra["latest"]):
            print(f"seed {seed}: incomplete ({b}: {bool(rb)}, {a}: {bool(ra)})")
            continue
        row = {"seed": seed,
               "base_best_oa": rb["best_oa"], "adapt_best_oa": ra["best_oa"],
               "base_mce": rb["latest"]["mCE"], "adapt_mce": ra["latest"]["mCE"],
               "base_moa": rb["latest"]["mOA"], "adapt_moa": ra["latest"]["mOA"],
               "base_clean": rb["latest"]["OA_clean"],
               "adapt_clean": ra["latest"]["OA_clean"]}
        if rb["best"] and ra["best"]:
            row["base_mce_best"] = rb["best"]["mCE"]
            row["adapt_mce_best"] = ra["best"]["mCE"]
        rows.append(row)
        print(json.dumps(row))

    if len(rows) >= 2:
        import numpy as np
        for metric, lo_better in (("mce", True), ("moa", False),
                                  ("clean", False), ("best_oa", False)):
            d = np.array([r[f"base_{metric}"] - r[f"adapt_{metric}"]
                          if lo_better else
                          r[f"adapt_{metric}"] - r[f"base_{metric}"]
                          for r in rows], float)
            print(f"margin {metric:8s} (adapt better > 0): "
                  f"mean {d.mean():+.3f} std {d.std(ddof=1):.3f} n={len(d)}")

    bf = collect("log_tpu_hard_bf16_adapt")
    f32 = collect("log_tpu_hard_adapt_r3")
    if bf and bf["latest"] and f32 and f32["latest"]:
        print(json.dumps({"bf16_vs_f32_seed2768": {
            "bf16_best_oa": bf["best_oa"], "f32_best_oa": f32["best_oa"],
            "bf16_mce": bf["latest"]["mCE"], "f32_mce": f32["latest"]["mCE"],
            "bf16_moa": bf["latest"]["mOA"], "f32_moa": f32["latest"]["mOA"],
            "bf16_clean": bf["latest"]["OA_clean"],
            "f32_clean": f32["latest"]["OA_clean"]}}))


if __name__ == "__main__":
    main()
