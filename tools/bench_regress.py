#!/usr/bin/env python3
"""Per-query bench regression gate (round-10 verdict ask #5).

Compares a fresh Bench JSON (one line, with per-query seconds and the
host-calibration kernel time `calib_sec`) against the committed
baseline `tools/bench_baseline.json`, whose values are KERNEL UNITS
(seconds / calib_sec) — host-independent, so a run on a 2x-slower host
compares cleanly.

Policy:
  * FAIL when a carried query exceeds max(BAND x baseline,
    baseline + SLACK) kernel units. The ratio band (1.5x) catches real
    work growth on substantial queries; the absolute slack (1.5 units)
    absorbs the fixed per-query job-overhead jitter that dominates
    small queries under a min-of-2 policy — measured same-host
    run-to-run noise reaches 2.4x on ~1-unit baselines (the host
    itself drifts ~15% between runs per the calibration kernel), so a
    pure ratio band false-alarms there. Queries above the ratio band
    but inside the slack are reported informationally.
  * Noise-aware: the baseline records each query's own min..max run
    SPREAD from the capture run. A query whose fresh units stay inside
    spread x baseline has not left its own demonstrated noise envelope
    (scaffold-heavy IVM queries show ~2x intra-run spread under
    min-of-2) and reports instead of failing.
  * New queries (no baseline row) are reported; refresh the baseline
    with --update after a judged round establishes their cost.
  * Improvements are reported so a speedup can be banked with --update.

Baseline locality (measured, round 11): the calibration kernel is
CPU-bound, so it compensates CPU-speed differences but NOT the I/O /
memory-bandwidth mix — comparing a driver-host baseline against a
build-host run showed a +/-2x spread on unrelated carried queries in
BOTH directions despite calibration. The committed baseline is
therefore captured on the BUILD host class (where preflight runs) and
pins run-over-run drift there; cross-host, cross-round comparisons
belong to the judge's calibrated driver artifacts, read with that
wider spread in mind (SCALE.md round-11 section).

Usage:
  python3 tools/bench_regress.py /tmp/preflight_bench.json [--update]
"""
import json
import sys

BAND = 1.5
SLACK_UNITS = 1.5
SPREAD_CAP = 2.5
BASELINE = "tools/bench_baseline.json"


def main() -> int:
    if len(sys.argv) < 2:
        print("usage: bench_regress.py <bench json> [--update]", file=sys.stderr)
        return 2
    bench_path = sys.argv[1]
    update = "--update" in sys.argv[2:]
    # Bench emits two JSON lines (full per-query map + compact summary)
    # and the preflight grep may capture either — pick the one with the
    # per-query map
    lines = [json.loads(l) for l in open(bench_path) if l.strip()]
    bench = next((l for l in lines if "queries" in l), None)
    if bench is None:
        print("[bench-regress] no per-query map in bench output — skipping")
        return 0
    calib = bench.get("calib_sec", -1.0)
    if calib <= 0:
        print("[bench-regress] no calibration in bench output — skipping")
        return 0
    base = json.load(open(BASELINE))
    # baseline rows are {"u": units, "spread": capture-run max/min}
    # (legacy plain-float rows read as spread 1.5)
    def row(v):
        return (v["u"], v.get("spread", 1.5)) if isinstance(v, dict) else (v, 1.5)
    units_base = {k: row(v) for k, v in base["units"].items()}
    now = {k: v / calib for k, v in bench["queries"].items()}

    fails, warns, new, improved = [], [], [], []
    for q, u in sorted(now.items()):
        if q not in units_base:
            new.append(q)
            continue
        b, spread = units_base[q]
        # cap the spread exemption so one noisy capture run cannot
        # permanently widen the gate past SPREAD_CAP x (ADVICE r11)
        spread = min(spread, SPREAD_CAP)
        line = f"{q}: {u:.2f}u vs baseline {b:.2f}u ({u / b:.2f}x, spread {spread:.2f})"
        if u > max(BAND * b, b + SLACK_UNITS, spread * b):
            fails.append(line)
        elif u > BAND * b:
            warns.append(line)
        elif u < b / BAND and b >= 1.0:
            improved.append(f"{q}: {u:.2f}u vs baseline {b:.2f}u")
    gone = sorted(set(units_base) - set(now))

    for tag, rows in (("REGRESSION", fails), ("above-band (within slack)", warns),
                      ("improved", improved)):
        for r in rows:
            print(f"[bench-regress] {tag}: {r}")
    if new:
        print(f"[bench-regress] {len(new)} new (unbaselined): {', '.join(new)}")
    if gone:
        print(f"[bench-regress] {len(gone)} baselined but not run: {', '.join(gone)}")

    if update:
        ranges = bench.get("ranges", {})
        def spread_of(q):
            r = ranges.get(q)
            if not r or not r.get("min"):
                return 1.5
            return round(max(1.0, r["max"] / r["min"]), 3)
        base["units"] = {
            k: {"u": round(v, 4), "spread": spread_of(k)}
            for k, v in now.items()}
        base["calib_sec_at_capture"] = calib
        base["source"] = f"refreshed from {bench_path}"
        json.dump(base, open(BASELINE, "w"), indent=1, sort_keys=True)
        print(f"[bench-regress] baseline refreshed: {len(now)} queries")
        return 0
    if fails:
        print(f"[bench-regress] FAIL: {len(fails)} carried queries regressed "
              f"past {BAND}x after calibration")
        return 1
    print(f"[bench-regress] PASS: {len(now)} queries within band "
          f"(calib {calib:.3f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
