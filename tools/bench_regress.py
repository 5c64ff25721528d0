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
  python3 tools/bench_regress.py /tmp/preflight_bench.json            # gate
  python3 tools/bench_regress.py run1.json run2.json [...] --update   # bank

Banking accepts MULTIPLE cold-run captures (round-12 verdict ask #1:
one capture's in-run min..max understates run-to-run reality). Each
query banks u = min across runs (steady-state cost) and spread =
max(in-run spreads, cross-run max/min) — the gate's noise envelope
then reflects what fresh-JVM runs actually do.

CPU evidence (round-14 verdict ask #1 — the gate must adjudicate its
own failures): the baseline additionally banks each query's per-run
executor CPU seconds in kernel units ("cpu_u", from the bench
artifact's task_metrics). A query whose WALL left the band while its
CPU work stayed inside it did not get more expensive — the host got
slower around it (scheduler contention, page cache, I/O wait under
another process; the r12-r14 pattern where the failing set changes
every run while the r13 verdict's named offenders measure clean).
Those downgrade to a loud HOST-NOISE report instead of a FAIL. A
query whose CPU grew past the band (or that carries no CPU evidence
on either side) still FAILS — real work growth never hides.
"""
import json
import math
import sys

BAND = 1.5
SLACK_UNITS = 1.5
CPU_SLACK_UNITS = 1.0
SPREAD_CAP = 2.5
BASELINE = "tools/bench_baseline.json"


def load_bench(path):
    """The (per-query) bench JSON line of one capture, or None."""
    # Bench emits two JSON lines (full per-query map + compact summary)
    # and the preflight grep may capture either — pick the one with the
    # per-query map
    lines = [json.loads(l) for l in open(path) if l.strip()]
    return next((l for l in lines if "queries" in l), None)


def main() -> int:
    paths = [a for a in sys.argv[1:] if not a.startswith("--")]
    update = "--update" in sys.argv[1:]
    if not paths:
        print("usage: bench_regress.py <bench json>... [--update]", file=sys.stderr)
        return 2
    bench_path = paths[0]
    bench = load_bench(bench_path)
    if bench is None:
        print("[bench-regress] no per-query map in bench output — skipping")
        return 0
    calib = bench.get("calib_sec", -1.0)
    if calib <= 0:
        print("[bench-regress] no calibration in bench output — skipping")
        return 0
    base = json.load(open(BASELINE))
    # baseline rows are {"u": units, "spread": capture-run max/min,
    # "cpu_u": per-run CPU kernel units} (legacy plain-float rows read
    # as spread 1.5, no CPU evidence)
    def row(v):
        if isinstance(v, dict):
            return (v["u"], v.get("spread", 1.5), v.get("cpu_u"))
        return (v, 1.5, None)
    units_base = {k: row(v) for k, v in base["units"].items()}
    now = {k: v / calib for k, v in bench["queries"].items()}

    def cpu_units_of(b):
        """query -> per-run executor CPU seconds / calib, from the
        artifact's task_metrics (None when the artifact predates them)."""
        tm = b.get("task_metrics", {})
        rng = b.get("ranges", {})
        c = b.get("calib_sec", -1.0)
        if not tm or c <= 0:
            return {}
        out = {}
        for q, m in tm.items():
            runs = max(1, rng.get(q, {}).get("runs", 1))
            out[q] = (m.get("cpu_sec", 0.0) / runs) / c
        return out
    cpu_now = cpu_units_of(bench)
    tm_now = bench.get("task_metrics", {})

    fails, warns, noise, new, improved = [], [], [], [], []
    for q, u in sorted(now.items()):
        if q not in units_base:
            new.append(q)
            continue
        b, spread, cpu_b = units_base[q]
        # cap the spread exemption so one noisy capture run cannot
        # permanently widen the gate past SPREAD_CAP x (ADVICE r11)
        spread = min(spread, SPREAD_CAP)
        line = f"{q}: {u:.2f}u vs baseline {b:.2f}u ({u / b:.2f}x, spread {spread:.2f})"
        if u > max(BAND * b, b + SLACK_UNITS, spread * b):
            # wall left the envelope — let the CPU evidence adjudicate:
            # flat CPU work means the host inflated the wall, not the
            # engine (report loudly, don't fail); grown/absent CPU
            # evidence fails as before
            cpu_u = cpu_now.get(q)
            cpu_flat = (cpu_b is not None and cpu_u is not None and
                        cpu_u <= max(BAND * cpu_b, cpu_b + CPU_SLACK_UNITS))
            if cpu_flat:
                load = tm_now.get(q, {}).get("os_load", -1.0)
                noise.append(
                    f"{line} — CPU flat ({cpu_u:.2f}u vs banked {cpu_b:.2f}u"
                    f", os_load {load:.1f})")
            else:
                if cpu_b is not None and cpu_u is not None:
                    line += f" [cpu {cpu_u:.2f}u vs banked {cpu_b:.2f}u]"
                fails.append(line)
        elif u > BAND * b:
            warns.append(line)
        elif u < b / BAND and b >= 1.0:
            improved.append(f"{q}: {u:.2f}u vs baseline {b:.2f}u")
    gone = sorted(set(units_base) - set(now))

    for tag, rows in (("REGRESSION", fails),
                      ("HOST-NOISE (wall out of band, CPU flat)", noise),
                      ("above-band (within slack)", warns),
                      ("improved", improved)):
        for r in rows:
            print(f"[bench-regress] {tag}: {r}")
    if new:
        print(f"[bench-regress] {len(new)} new (unbaselined): {', '.join(new)}")
    if gone:
        print(f"[bench-regress] {len(gone)} baselined but not run: {', '.join(gone)}")

    if update:
        # merge every capture: per query, u = min across runs (steady
        # state), spread = max of the in-run spreads AND the cross-run
        # max/min ratio — the envelope fresh-JVM runs demonstrated
        loaded = []
        for p in paths:
            b = load_bench(p)
            if b is None or b.get("calib_sec", -1.0) <= 0:
                print(f"[bench-regress] skipping capture without map/calib: {p}")
                continue
            loaded.append((p, b))
        # calibration-outlier guard (round 13): one capture whose kernel
        # ran ~2x slower than the host's quiet norm (CPU contention at
        # JVM start) DEFLATES its units; banking its min poisons every
        # query's baseline and later quiet runs "regress" on pure
        # arithmetic. A capture whose calib deviates >40% from the
        # median of the submitted captures is excluded, loudly.
        if len(loaded) >= 3:
            calibs = sorted(b["calib_sec"] for _, b in loaded)
            med = calibs[len(calibs) // 2]
            kept = []
            for p, b in loaded:
                if not (0.6 * med <= b["calib_sec"] <= 1.4 * med):
                    print(f"[bench-regress] excluding calib outlier {p}: "
                          f"calib {b['calib_sec']:.3f}s vs median {med:.3f}s")
                else:
                    kept.append((p, b))
            loaded = kept
        runs = []
        for p, b in loaded:
            c = b["calib_sec"]
            units = {k: v / c for k, v in b["queries"].items()}
            rng = b.get("ranges", {})
            spreads = {
                k: (max(1.0, rng[k]["max"] / rng[k]["min"])
                    if k in rng and rng[k].get("min") else 1.5)
                for k in units}
            runs.append((units, spreads, cpu_units_of(b)))
        if not runs:
            print("[bench-regress] no usable captures — baseline unchanged")
            return 2
        every = sorted(set.intersection(*(set(u) for u, _, _ in runs)))
        merged = {}
        for q in every:
            us = [u[q] for u, _, _ in runs]
            cross = max(us) / min(us) if min(us) > 0 else 1.5
            spread = max([s[q] for _, s, _ in runs] + [cross])
            # round the spread UP with 0.1% headroom: a banked capture
            # must never fail its own gate — round-to-nearest could
            # store a spread a hair below the true cross-run ratio
            # (emb_neardup_exact, round 13: 1.7004x vs stored 1.700)
            spread_up = math.ceil(spread * 1.001 * 1000) / 1000
            merged[q] = {"u": round(min(us), 4), "spread": spread_up}
            # CPU evidence: bank the max across captures — the gate's
            # "CPU flat" test must not false-alarm on listener jitter,
            # and real work growth shows against the largest honest
            # capture just as clearly
            cpus = [cu[q] for _, _, cu in runs if q in cu]
            if cpus:
                merged[q]["cpu_u"] = round(max(cpus), 4)
        base["units"] = merged
        base["calib_sec_at_capture"] = calib
        base["source"] = (f"refreshed from {len(runs)} cold runs: "
                          + ", ".join(paths))
        json.dump(base, open(BASELINE, "w"), indent=1, sort_keys=True)
        print(f"[bench-regress] baseline refreshed: {len(merged)} queries "
              f"from {len(runs)} captures")
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
