#!/usr/bin/env python3
"""Join APPROX_QUALITY.json's per-query floor evidence into a
CORRECTNESS_r{N}.json: every row the driver marked `err: "no_oracle"`
gains `approx_floor_ok` (did the measured quality clear its pinned
bound?) plus the measured metric values, so the one correctness artifact
carries the whole story — hash-oracled rows AND floor-checked rows.

Zero-arg mode (the per-round ritual): discovers the HIGHEST-numbered
CORRECTNESS_r{N}.json in the repo root and writes
CORRECTNESS_r{N}_merged.json next to it — the merged artifact tracks the
round number automatically instead of being hand-assembled once.

Usage: python3 tools/merge_floors.py [CORRECTNESS_rN.json] [APPROX_QUALITY.json] [-o out.json]
Default correctness file: latest CORRECTNESS_r*.json in the repo root.
Default quality file: APPROX_QUALITY.json in the repo root.
Default output: <correctness>_merged.json in zero-arg mode, else stdout.
"""
import argparse
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def latest_correctness() -> Path:
    rounds = {}
    for p in REPO.glob("CORRECTNESS_r*.json"):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", p.name)
        if m:
            rounds[int(m.group(1))] = p
    if not rounds:
        raise SystemExit("no CORRECTNESS_r{N}.json found in " + str(REPO))
    return rounds[max(rounds)]


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
    ap.add_argument("correctness", nargs="?", default=None)
    ap.add_argument("quality", nargs="?",
                    default=str(REPO / "APPROX_QUALITY.json"))
    ap.add_argument("-o", "--out", default=None)
    args = ap.parse_args()
    auto = args.correctness is None
    src = latest_correctness() if auto else Path(args.correctness)
    out = args.out
    if auto and out is None:
        out = str(src.with_name(src.stem + "_merged.json"))
    merged = merge(json.loads(src.read_text()),
                   json.loads(Path(args.quality).read_text()))
    text = json.dumps(merged, indent=2) + "\n"
    if out:
        Path(out).write_text(text)
        no_oracle = [n for n, r in merged.items() if r.get("err") == "no_oracle"]
        ok = sum(1 for n in no_oracle if merged[n].get("approx_floor_ok"))
        print(f"merged {src.name}: {len(no_oracle)} no-oracle rows "
              f"({ok} floor-ok) -> {out}")
    else:
        sys.stdout.write(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
