#!/usr/bin/env python3
"""Regenerate bench/floors.json from bench probe DETAIL files.

Floor = the minimum run time per query across every detail file given on
the command line (each detail file's "runs" map holds all recorded runs,
including rerun triples). Only same-bytecode captures should be mixed —
pass the current round's probe details, not historical ones, after a plan
change (see docs/BENCH_NOTES.md r12).

STALENESS RULE (r14 verdict item 8): a floor is evidence about what the
CURRENT bytecode can reach, so it is valid only while the query's physical
plan is the one the floor was captured under. The golden plan fingerprint
(src/test/resources/plans/<query>.txt, PlanSnapshotSpec) is the canonical
plan identity: this script records each floor's fingerprint hash into
bench/floor_plans.json at generation time, and `--check` compares the
recorded hashes against the current fingerprints — any mismatch names a
STALE floor that the current bytecode may be unable to reach (or may beat),
and the fix is always the same: re-probe on current bytecode and regenerate.
Floors are advisory (they trigger re-measurement, never replace a number),
so a stale floor costs extra re-runs, not artifact correctness — but the 2x
re-measure gate reads cleanest when every floor is current.

Usage:
    python3 tools/gen_floors.py OUT detail1.json [detail2.json ...]
    python3 tools/gen_floors.py --check [FLOORS]      # default bench/floors.json
"""
import hashlib
import json
import os
import sys

PLANS_DIR = "src/test/resources/plans"


def plan_hash(query: str) -> str | None:
    path = os.path.join(PLANS_DIR, f"{query}.txt")
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:16]


def plans_path(floors_path: str) -> str:
    return os.path.join(os.path.dirname(floors_path) or ".", "floor_plans.json")


def cpu_path(floors_path: str) -> str:
    return os.path.join(os.path.dirname(floors_path) or ".", "floor_cpu.json")


def check(floors_path: str) -> None:
    with open(floors_path) as f:
        floors = json.load(f)
    pp = plans_path(floors_path)
    if not os.path.exists(pp):
        print(f"no {pp} — regenerate floors to record plan fingerprints")
        sys.exit(1)
    with open(pp) as f:
        recorded = json.load(f)
    stale = []
    for q in sorted(floors):
        cur = plan_hash(q)
        rec = recorded.get(q)
        if rec is None:
            stale.append((q, "no recorded fingerprint"))
        elif cur is None:
            stale.append((q, "golden plan file missing"))
        elif cur != rec:
            stale.append((q, f"plan changed ({rec} -> {cur})"))
    if stale:
        print(f"{len(stale)} STALE floors (plan changed since capture — "
              "re-probe on current bytecode and regenerate):")
        for q, why in stale:
            print(f"  {q}: {why}")
        sys.exit(1)
    print(f"all {len(floors)} floors current (plan fingerprints match)")


def main() -> None:
    if sys.argv[1] == "--check":
        check(sys.argv[2] if len(sys.argv) > 2 else "bench/floors.json")
        return
    out, details = sys.argv[1], sys.argv[2:]
    floors: dict[str, float] = {}
    # Per-floor CPU stamp (r15 verdict item 1): each detail file records the
    # kept triple's process-CPU seconds per query; CPU time is nearly
    # load-invariant (a co-tenant burst inflates wall, not our JVM's CPU),
    # so the MIN cpu_sec across same-bytecode captures is the clean triple's
    # CPU cost. Bench compares a >2x-floor row's own cpu_sec against this
    # stamp to classify it load_noise vs plan_change mechanically — no quiet
    # window needed.
    cpus: dict[str, float] = {}
    for path in details:
        with open(path) as f:
            d = json.load(f)
        for name, runs in d["runs"].items():
            valid = [r for r in runs if r >= 0]
            if not valid:
                continue
            m = min(valid)
            floors[name] = min(floors.get(name, m), m)
        for name, c in d.get("cpu_sec", {}).items():
            if c is not None and c >= 0:
                cpus[name] = min(cpus.get(name, c), c)
    with open(out, "w") as f:
        f.write("{\n")
        f.write(",\n".join(f' "{k}": {round(v, 3)}'
                           for k, v in sorted(floors.items())))
        f.write("\n}\n")
    hashes = {q: plan_hash(q) for q in sorted(floors)}
    missing = [q for q, h in hashes.items() if h is None]
    with open(plans_path(out), "w") as f:
        json.dump({q: h for q, h in hashes.items() if h is not None},
                  f, indent=1, sort_keys=True)
    with open(cpu_path(out), "w") as f:
        json.dump({q: round(c, 3) for q, c in sorted(cpus.items())},
                  f, indent=1, sort_keys=True)
    print(f"wrote {len(floors)} floors to {out} from {len(details)} captures")
    print(f"recorded {len(cpus)} floor cpu_sec stamps to {cpu_path(out)}")
    print(f"recorded {len(hashes) - len(missing)} plan fingerprints to "
          f"{plans_path(out)}" +
          (f" ({len(missing)} queries have no golden plan: {missing})"
           if missing else ""))


if __name__ == "__main__":
    main()
