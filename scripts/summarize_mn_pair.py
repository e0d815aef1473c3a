"""Summarize the matched ModelNet-C pair: final_latest + final_best aggregate
lines from both arms' outcorruption.txt (newest run dir per arm)."""
import ast
import glob
import os
import re
import sys


def newest(pattern):
    dirs = sorted(glob.glob(pattern), key=os.path.getmtime)
    return dirs[-1] if dirs else None


def main():
    for arm in ("base", "adapt"):
        d = newest(f"log_tpu_hard_mn_{arm}/modelnetc/*")
        if not d:
            print(f"{arm}: no run dir")
            continue
        txt = open(os.path.join(d, "outcorruption.txt")).read()
        aggs = re.findall(r"^(?:(final_\w+|E\d+).*?)?(\{'mCE'.*\})$", txt,
                          re.M)
        # aggregate lines appear in sweep order; tag them by the preceding
        # sweep header if present, else by position
        headers = re.findall(r"^== (.*) ==$", txt, re.M)
        lines = [ast.literal_eval(m[1]) for m in aggs]
        log = open(os.path.join(d, "log.txt")).read()
        best = re.findall(r"best (\d+\.\d+)", log)
        print(f"\n{arm}: {os.path.basename(d)}")
        print(f"  best val OA: {best[-1] if best else '?'}")
        tags = headers if len(headers) == len(lines) else \
            [f"sweep{i}" for i in range(len(lines))]
        for tag, agg in zip(tags, lines):
            print(f"  {tag}: mCE {agg['mCE']} RmCE {agg['RmCE']} "
                  f"mOA {agg['mOA']} clean {agg['OA_clean']}")


if __name__ == "__main__":
    sys.exit(main())
