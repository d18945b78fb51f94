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
Since r16 the fingerprint's last line is `prequery_jobs: N` — the number of
Spark jobs the query's CONSTRUCTION runs (geometry scalar reads, family
gates, fixture builds) — closing the r15 blind spot where an aux-job-only
bytecode change left floors unreachable while the plan shape read green.
Captures that predate a KNOWN aux-job change are excluded per-query via
bench/floor_exclusions.json (basename globs; see load_exclusions).
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


def exclusions_path(floors_path: str) -> str:
    return os.path.join(os.path.dirname(floors_path) or ".",
                        "floor_exclusions.json")


def load_exclusions(floors_path: str) -> dict:
    """Per-query capture exclusions (r15 verdict item 5): a bytecode change
    can add construction-time jobs to a query WITHOUT moving its plan shape
    (the r15 family gate did this to five queries), making older captures'
    floors unreachable. The golden fingerprint now embeds `prequery_jobs`,
    so FUTURE instances flip the hash and --check names them; captures
    taken before a known aux-job change are excluded here explicitly.
    Format: {"_reason_<tag>": "...", "<query>": ["<detail-basename-glob>", ...]}
    """
    p = exclusions_path(floors_path)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return {k: v for k, v in json.load(f).items()
                if not k.startswith("_")}


def excluded(excl: dict, query: str, detail_path: str) -> bool:
    import fnmatch
    base = os.path.basename(detail_path)
    return any(fnmatch.fnmatch(base, pat) for pat in excl.get(query, []))


def cal_history_path(floors_path: str) -> str:
    return os.path.join(os.path.dirname(floors_path) or ".",
                        "floor_cal_history.json")


def check_cal_trend(floors_path: str) -> None:
    """Calibration TREND verdict (r16 verdict item 7): the host-change
    detector is a 3x step gate — a slow 1.5-2x drift across successive
    regens would erode floor validity silently. Every regen appends its
    task_cal_cpu to floor_cal_history.json; this prints a warning when the
    trailing strictly-monotonic run of regens drifts >= 1.5x in one
    direction (same-host window noise is ~0.74-1.2 cpu-s and not
    monotonic across several regens)."""
    p = cal_history_path(floors_path)
    if not os.path.exists(p):
        print("calibration trend: no history recorded yet")
        return
    with open(p) as f:
        hist = json.load(f)
    vals = [h["task_cal_cpu"] for h in hist
            if isinstance(h, dict) and h.get("task_cal_cpu")]
    if len(vals) < 2:
        print(f"calibration trend: {len(vals)} regen(s) recorded — no trend yet")
        return
    i = len(vals) - 1
    direction = 0
    while i > 0:
        d = vals[i] - vals[i - 1]
        if d == 0:
            break
        nd = 1 if d > 0 else -1
        if direction == 0:
            direction = nd
        elif nd != direction:
            break
        i -= 1
    run = vals[i:]
    lo, hi = min(run[0], run[-1]), max(run[0], run[-1])
    ratio = (hi / lo) if lo > 0 else 0.0
    if len(run) >= 2 and ratio >= 1.5:
        print(f"calibration trend: WARNING — task_cal_cpu drifted "
              f"monotonically {'up' if direction > 0 else 'down'} "
              f"{ratio:.2f}x over the last {len(run)} regens "
              f"({run[0]} -> {run[-1]}); a slow host drift below the 3x "
              f"step gate erodes floor validity — re-base floors from "
              f"fresh same-host captures")
    else:
        print(f"calibration trend: ok ({len(vals)} regens recorded, "
              f"last {vals[-1]}, trailing monotonic ratio "
              f"{ratio:.2f}x < 1.5x)")


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
        check_cal_trend(floors_path)
        sys.exit(1)
    print(f"all {len(floors)} floors current (plan fingerprints match)")
    check_cal_trend(floors_path)


def main() -> None:
    if sys.argv[1] == "--check":
        check(sys.argv[2] if len(sys.argv) > 2 else "bench/floors.json")
        return
    out, details = sys.argv[1], sys.argv[2:]
    allow_mixed = "--allow-mixed-epochs" in details
    details = [d for d in details if d != "--allow-mixed-epochs"]
    # HOST-EPOCH guard (r17 verdict item 7): floors are only meaningful
    # within one host state, and the r16->r17 drift showed captures from
    # different states mixing silently (the old set blended 0.63- and
    # 1.0-cpu-s-calibration windows, quietly inflating every ratio read
    # against it). Refuse to mix detail files whose task-overhead
    # calibrations spread >= 2x -- that is two epochs, and a floor set
    # built across them is neither's truth. Override (rare, deliberate):
    # --allow-mixed-epochs.
    cals = []
    for path in details:
        with open(path) as f:
            tc = json.load(f).get("task_cal_cpu")
        if tc is not None and tc > 0:
            cals.append((os.path.basename(path), tc))
    if cals:
        lo = min(c for _, c in cals)
        hi = max(c for _, c in cals)
        if hi / lo >= 2.0 and not allow_mixed:
            print("REFUSING to mix host epochs: task_cal_cpu spreads "
                  f"{lo} .. {hi} (>= 2x) across the given captures:")
            for b, c in sorted(cals, key=lambda x: x[1]):
                print(f"  {c:6.2f}  {b}")
            print("pass only one epoch's captures (or --allow-mixed-epochs)")
            sys.exit(1)
    floors: dict[str, float] = {}
    # Per-floor CPU stamp (r15 verdict item 1): each detail file records the
    # kept triple's process-CPU seconds per query; CPU time is nearly
    # load-invariant (a co-tenant burst inflates wall, not our JVM's CPU),
    # so the MIN cpu_sec across same-bytecode captures is the clean triple's
    # CPU cost. Bench compares a >2x-floor row's own cpu_sec against this
    # stamp to classify it load_noise vs plan_change mechanically — no quiet
    # window needed.
    cpus: dict[str, float] = {}
    excl = load_exclusions(out)
    n_excluded = 0
    # task-overhead calibration stamp (r16): min of the captures' fixed
    # 256-empty-task calibration CPU — Bench compares its own calibration
    # against this to detect a HOST change (floors don't transfer across
    # hosts; per-query CPU verdicts would mislabel unchanged queries)
    task_cal: float | None = None
    for path in details:
        with open(path) as f:
            d = json.load(f)
        tc = d.get("task_cal_cpu")
        if tc is not None and tc > 0:
            task_cal = tc if task_cal is None else min(task_cal, tc)
        for name, runs in d["runs"].items():
            if excluded(excl, name, path):
                n_excluded += 1
                continue
            valid = [r for r in runs if r >= 0]
            if not valid:
                continue
            m = min(valid)
            floors[name] = min(floors.get(name, m), m)
        for name, c in d.get("cpu_sec", {}).items():
            if excluded(excl, name, path):
                continue
            if c is not None and c >= 0:
                cpus[name] = min(cpus.get(name, c), c)
    if n_excluded:
        print(f"excluded {n_excluded} (query, capture) pairs per "
              f"{exclusions_path(out)}")
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
    cpu_out = {q: round(c, 3) for q, c in sorted(cpus.items())}
    if task_cal is not None:
        cpu_out["_task_cal_cpu"] = round(task_cal, 3)
    # the epoch stamp: the calibration band this floor set was built in --
    # a future regen mixing a different band refuses above, and a reader
    # of the artifact sees which host state the floors describe
    if cals:
        cpu_out["_epoch_cal_min"] = round(min(c for _, c in cals), 3)
        cpu_out["_epoch_cal_max"] = round(max(c for _, c in cals), 3)
    with open(cpu_path(out), "w") as f:
        json.dump(cpu_out, f, indent=1, sort_keys=True)
    if task_cal is not None:
        hp = cal_history_path(out)
        hist = []
        if os.path.exists(hp):
            with open(hp) as f:
                hist = json.load(f)
        hist.append({"task_cal_cpu": round(task_cal, 3),
                     "captures": [os.path.basename(p) for p in details]})
        with open(hp, "w") as f:
            json.dump(hist, f, indent=1)
        print(f"appended calibration {round(task_cal, 3)} to {hp} "
              f"({len(hist)} regens recorded)")
        check_cal_trend(out)
    print(f"wrote {len(floors)} floors to {out} from {len(details)} captures")
    print(f"recorded {len(cpus)} floor cpu_sec stamps to {cpu_path(out)}")
    print(f"recorded {len(hashes) - len(missing)} plan fingerprints to "
          f"{plans_path(out)}" +
          (f" ({len(missing)} queries have no golden plan: {missing})"
           if missing else ""))


if __name__ == "__main__":
    main()
