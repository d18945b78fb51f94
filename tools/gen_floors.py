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

FLOOR-TAIL RULE (r18 verdict item 3): a floor no current-round capture
approaches within 1.4x (>= 5 capture minima, >= 3 from the newest round)
is retired to the current-round min; independent of rounds, a single
lucky capture min that the second-lowest exceeds by > 1.4x is retired to
the second-lowest. Retirements stamp floor_cpu.json's _floor_tail meta.

Usage:
    python3 tools/gen_floors.py OUT detail1.json [detail2.json ...]
    python3 tools/gen_floors.py --check [FLOORS]      # default bench/floors.json
    python3 tools/gen_floors.py --selftest            # incl. the tail rule
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


def selftest() -> None:
    """Synthetic-fixture exercise of the floor-tail retirement rule:
    q_lucky has one 0.30 outlier min among five captures bottoming at
    0.45+ (retire to 2nd-lowest), q_tight spreads < 1.4x (keep min),
    q_thin has the same spread on only 4 captures (thin evidence — keep
    min). Run: python3 tools/gen_floors.py --selftest
    """
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        caps = []
        # the s02 shape: an OLD round reached 0.30/0.38, the current round
        # bottoms at 0.44+ — current-round rule retires to 0.44 (note the
        # 2nd-lowest 0.38 is ALSO old-round, so the outlier rule alone
        # would under-retire)
        stale = [0.30, 0.38, 0.41, 0.50, 0.47, 0.44, 0.46, 0.49, 0.45, 0.52]
        # one lucky min inside an otherwise-flat field, IN the current
        # round: the current-round rule cannot fire (the round's own min IS
        # the outlier), the outlier rule retires to the 2nd-lowest
        lucky = [0.47, 0.49, 0.46, 0.50, 0.48, 0.30, 0.45, 0.51, 0.46, 0.52]
        tight = [0.50, 0.55, 0.60, 0.52, 0.58, 0.51, 0.54, 0.57, 0.53, 0.59]
        for i in range(10):
            rnd = 17 if i < 5 else 18
            d = {"task_cal_cpu": 1.0,
                 "alu_cal_cpu": 2.0 + 0.1 * i,
                 "runs": {"q_stale": [stale[i]], "q_lucky": [lucky[i]],
                          "q_tight": [tight[i]]},
                 "cpu_sec": {"q_stale": stale[i], "q_lucky": lucky[i],
                             "q_tight": tight[i]}}
            if i < 4:
                d["runs"]["q_thin"] = [lucky[i]]
                d["cpu_sec"]["q_thin"] = lucky[i]
            p = os.path.join(td, f"bench_r{rnd}_probe{i % 5 + 1}_detail.json")
            with open(p, "w") as f:
                json.dump(d, f)
            caps.append(p)
        out = os.path.join(td, "floors.json")
        sys.argv = ["gen_floors.py", out] + caps
        main()
        with open(out) as f:
            floors = json.load(f)
        assert floors["q_stale"] == 0.44, floors   # current-round (r18) min
        assert floors["q_lucky"] == 0.45, floors   # 2nd-lowest capture min
        assert floors["q_tight"] == 0.50, floors   # spread < 1.4x: plain min
        assert floors["q_thin"] == 0.46, floors    # 4 captures: thin, plain min
        with open(cpu_path(out)) as f:
            cpu = json.load(f)
        assert set(cpu.get("_floor_tail", {})) == {"q_stale", "q_lucky"}, cpu
        ts = cpu["_floor_tail"]["q_stale"]
        assert ts["rule"] == "current_round_r18" and ts["kept"] == 0.44 \
            and ts["n_current"] == 5, ts
        tl = cpu["_floor_tail"]["q_lucky"]
        assert tl["rule"] == "lucky_outlier" and tl["kept"] == 0.45 \
            and tl["n_captures"] == 10, tl
        # ALU-calibration stamp: min across the captures' readings (r19)
        assert cpu["_alu_cal_cpu"] == 2.0, cpu
        # subset-stamped captures (BENCH_ONLY bisect runs) are refused:
        # a lone subset capture with a tempting lower min must not move
        # the floor
        sub = os.path.join(td, "bench_r18_bisect_detail.json")
        with open(sub, "w") as f:
            json.dump({"subset": True, "task_cal_cpu": 1.0,
                       "runs": {"q_tight": [0.10]},
                       "cpu_sec": {"q_tight": 0.10}}, f)
        out2 = os.path.join(td, "floors2.json")
        sys.argv = ["gen_floors.py", out2] + caps + [sub]
        main()
        with open(out2) as f:
            floors2 = json.load(f)
        assert floors2["q_tight"] == 0.50, floors2
    print("selftest ok: stale-epoch tail retired to current-round min, "
          "lucky outlier to 2nd-lowest; tight spread and thin evidence kept")


def main() -> None:
    if sys.argv[1] == "--check":
        check(sys.argv[2] if len(sys.argv) > 2 else "bench/floors.json")
        return
    if sys.argv[1] == "--selftest":
        selftest()
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
    # per-query list of (round, per-CAPTURE minimum) — one entry per detail
    # file that ran the query; the floor-tail rule below needs the
    # distribution AND which round each capture came from, not just the
    # global min. Round parses from the repo's bench_rNN_* naming; files
    # outside the convention get round -1 (never "current").
    import re as _re

    def capture_round(path: str) -> int:
        m = _re.match(r"bench_r(\d+)_", os.path.basename(path))
        return int(m.group(1)) if m else -1
    mins: dict[str, list[tuple[int, float]]] = {}
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
    # ALU-throughput calibration stamp (r19): min of the captures' fixed
    # hash-workload CPU — the host's COMPUTE fingerprint. Bench grants a
    # >2x-floor row host_slow when its own CPU moved no further than this
    # calibration did (compute-dense rows move more than the scan-heavy
    # suite median under frequency loss; the empty-task stamp is blind to
    # that axis).
    alu_cal: float | None = None
    for path in details:
        with open(path) as f:
            d = json.load(f)
        # subset captures (SPARK_GRAFT_BENCH_ONLY bisect runs) are not
        # floor evidence: their suite context differs (no code-cache /
        # GC pressure from the other 140+ rows), so their minima would
        # manufacture unreachable floors for in-suite captures
        if d.get("subset"):
            print(f"refusing subset capture {path} (BENCH_ONLY bisect run)")
            continue
        tc = d.get("task_cal_cpu")
        if tc is not None and tc > 0:
            task_cal = tc if task_cal is None else min(task_cal, tc)
        ac = d.get("alu_cal_cpu")
        if ac is not None and ac > 0:
            alu_cal = ac if alu_cal is None else min(alu_cal, ac)
        for name, runs in d["runs"].items():
            if excluded(excl, name, path):
                n_excluded += 1
                continue
            valid = [r for r in runs if r >= 0]
            if not valid:
                continue
            mins.setdefault(name, []).append(
                (capture_round(path), min(valid)))
        for name, c in d.get("cpu_sec", {}).items():
            if excluded(excl, name, path):
                continue
            if c is not None and c >= 0:
                cpus[name] = min(cpus.get(name, c), c)
    if n_excluded:
        print(f"excluded {n_excluded} (query, capture) pairs per "
              f"{exclusions_path(out)}")
    # FLOOR-TAIL retirement (r18 verdict item 3, the s02 class): a floor no
    # CURRENT-round capture can approach is stale tail, not a target — it
    # manufactures a standing >1.4x advisory ratio on every honest
    # re-measure (s02: a 0.296 r17-epoch min vs five r18 captures bottoming
    # at 0.43-0.49, a permanent 1.5-2.2x label probe 5 had to adjudicate by
    # hand). Two rules, primary first:
    #  1. CURRENT-ROUND rule: with >= TAIL_MIN_CAPTURES capture minima in
    #     total and >= TAIL_EPOCH_MIN of them from the NEWEST round in the
    #     input set, a current-round minimum that exceeds the global min by
    #     > TAIL_RATIO retires the floor to the current-round min — the
    #     value the machine demonstrably reaches TODAY.
    #  2. LUCKY-OUTLIER rule: independent of rounds, a global min that the
    #     SECOND-lowest capture min exceeds by > TAIL_RATIO (>=
    #     TAIL_MIN_CAPTURES capture minima) retires to the second-lowest —
    #     a value two independent captures can defend.
    # Retirements are stamped into floor_cpu.json's _floor_tail meta so a
    # reader can audit what was dropped. Sub-threshold spreads and thin
    # evidence keep the plain min. Floors stay advisory (they trigger
    # re-measurement, never replace a number), so the retirement's failure
    # mode is one extra re-triple, not a hidden regression — and the plan
    # fingerprint staleness check still names real plan changes.
    TAIL_RATIO = 1.4
    TAIL_MIN_CAPTURES = 5
    TAIL_EPOCH_MIN = 3
    cur_round = max((r for ms in mins.values() for r, _ in ms), default=-1)
    floors: dict[str, float] = {}
    tail_retired: dict[str, dict] = {}
    for name, ms in mins.items():
        s = sorted(v for _, v in ms)
        cur = sorted(v for r, v in ms if r == cur_round)
        floors[name] = s[0]
        if len(s) < TAIL_MIN_CAPTURES:
            continue
        if (cur_round >= 0 and len(cur) >= TAIL_EPOCH_MIN
                and cur[0] > TAIL_RATIO * s[0]):
            floors[name] = cur[0]
            tail_retired[name] = {
                "dropped_min": round(s[0], 3), "kept": round(cur[0], 3),
                "rule": f"current_round_r{cur_round}",
                "n_captures": len(s), "n_current": len(cur),
            }
        elif s[1] > TAIL_RATIO * s[0]:
            floors[name] = s[1]
            tail_retired[name] = {
                "dropped_min": round(s[0], 3), "kept": round(s[1], 3),
                "rule": "lucky_outlier", "n_captures": len(s),
            }
    if tail_retired:
        for q, t in sorted(tail_retired.items()):
            print(f"floor tail retired: {q} {t['dropped_min']} -> "
                  f"{t['kept']} ({t['rule']}, {t['n_captures']} capture "
                  f"mins; stale min > {TAIL_RATIO}x below what current "
                  f"captures reach)")
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
    if alu_cal is not None:
        cpu_out["_alu_cal_cpu"] = round(alu_cal, 3)
    # the epoch stamp: the calibration band this floor set was built in --
    # a future regen mixing a different band refuses above, and a reader
    # of the artifact sees which host state the floors describe
    if cals:
        cpu_out["_epoch_cal_min"] = round(min(c for _, c in cals), 3)
        cpu_out["_epoch_cal_max"] = round(max(c for _, c in cals), 3)
    if tail_retired:
        cpu_out["_floor_tail"] = tail_retired
        cpu_out["_reason_floor_tail"] = (
            "stale-tail floors retired (> %.1fx below what current "
            "captures reach, >= %d capture mins of evidence): "
            "current_round_rN = no newest-round capture approaches the "
            "historical min, floor := current-round min; lucky_outlier = "
            "a single capture min no other capture approaches, floor := "
            "2nd-lowest. Honest re-measures stop accruing permanent "
            "advisory labels; plan changes are still named by the "
            "fingerprint staleness check." % (TAIL_RATIO, TAIL_MIN_CAPTURES))
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
