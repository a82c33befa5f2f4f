"""Merge sweep JSONs: later files override earlier rows with the same
(problem, N). Usage: python benchmarks/merge_sweeps.py out.json in1.json in2.json ..."""

import json
import sys


def main():
    out, files = sys.argv[1], sys.argv[2:]
    rows = {}
    for f in files:
        for r in json.load(open(f)):
            rows[(r["problem"], r["N"])] = r
    merged = sorted(rows.values(), key=lambda r: (r["problem"], r["N"]))
    json.dump(merged, open(out, "w"), indent=1)
    print(f"wrote {out}: {len(merged)} rows from {len(files)} files")


if __name__ == "__main__":
    main()
