#!/usr/bin/env python3
"""Join APPROX_QUALITY.json's per-query floor evidence into a
CORRECTNESS_r{N}.json: every row the driver marked `err: "no_oracle"`
gains `approx_floor_ok` (did the measured quality clear its pinned
bound?) plus the measured metric values, so the one correctness artifact
carries the whole story — hash-oracled rows AND floor-checked rows.

Usage: python3 tools/merge_floors.py CORRECTNESS_rN.json [APPROX_QUALITY.json] [-o out.json]
Default quality file: APPROX_QUALITY.json next to this repo's root.
Default output: stdout.
"""
import argparse
import json
import sys
from pathlib import Path


def merge(correctness: dict, quality: dict) -> dict:
    per_query = quality.get("per_query", {})
    merged = {}
    for name, row in correctness.items():
        row = dict(row)
        if row.get("err") == "no_oracle":
            ev = per_query.get(name)
            if ev is not None:
                row["approx_floor_ok"] = ev["approx_floor_ok"]
                row["floor_metrics"] = {
                    k: v for k, v in ev.items() if k != "approx_floor_ok"}
            else:
                row["approx_floor_ok"] = None  # no evidence mapped — loud
        merged[name] = row
    return merged


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("correctness")
    ap.add_argument("quality", nargs="?",
                    default=str(Path(__file__).resolve().parent.parent
                                / "APPROX_QUALITY.json"))
    ap.add_argument("-o", "--out", default=None)
    args = ap.parse_args()
    merged = merge(json.loads(Path(args.correctness).read_text()),
                   json.loads(Path(args.quality).read_text()))
    text = json.dumps(merged, indent=2) + "\n"
    if args.out:
        Path(args.out).write_text(text)
        no_oracle = [n for n, r in merged.items() if r.get("err") == "no_oracle"]
        ok = sum(1 for n in no_oracle if merged[n].get("approx_floor_ok"))
        print(f"merged {len(no_oracle)} no-oracle rows "
              f"({ok} floor-ok) -> {args.out}")
    else:
        sys.stdout.write(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
