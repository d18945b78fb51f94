#!/usr/bin/env python3
"""Regenerate bench/floors.json from bench probe DETAIL files.

Floor = the minimum run time per query across every detail file given on
the command line (each detail file's "runs" map holds all recorded runs,
including rerun triples). Only same-bytecode captures should be mixed —
pass the current round's probe details, not historical ones, after a plan
change (see docs/BENCH_NOTES.md r12).

Usage: python3 tools/gen_floors.py OUT detail1.json [detail2.json ...]
"""
import json
import sys


def main() -> None:
    out, details = sys.argv[1], sys.argv[2:]
    floors: dict[str, float] = {}
    for path in details:
        with open(path) as f:
            d = json.load(f)
        for name, runs in d["runs"].items():
            valid = [r for r in runs if r >= 0]
            if not valid:
                continue
            m = min(valid)
            floors[name] = min(floors.get(name, m), m)
    with open(out, "w") as f:
        f.write("{\n")
        f.write(",\n".join(f' "{k}": {round(v, 3)}'
                           for k, v in sorted(floors.items())))
        f.write("\n}\n")
    print(f"wrote {len(floors)} floors to {out} from {len(details)} captures")


if __name__ == "__main__":
    main()
