#!/usr/bin/env python3
"""Per-query bench regression gate (round-10 verdict ask #5; env- and
evidence-aware since round 15).

Compares a fresh Bench JSON (one line, with per-query seconds and the
host-calibration kernel time `calib_sec`) against the committed
baseline `tools/bench_baseline.json`, whose values are KERNEL UNITS
(seconds / calib_sec) — host-independent, so a run on a 2x-slower host
compares cleanly.

DUAL-MEASURE WALL BAND (round 15): the calibration kernel on this
host class is itself ~1.8x unstable across quiet cold runs (measured:
calib 0.46-0.82 s across four same-HEAD captures) while raw wall
totals move only ~1.2x — dividing by the kernel INJECTS noise into
same-config comparisons. Since the env gate already refuses
cross-config runs, the baseline banks BOTH kernel units (u) and raw
per-run seconds (s), and a wall regression must leave BOTH envelopes:
calib drift alone (u out, s in) or a genuinely slower host (s out, u
in — the case the kernel exists for) each report informationally
instead of failing.

CONFIG AWARENESS (round-15 verdict ask #1 — the r12-r14 gate saga):
kernel units normalize CPU *speed*, not *parallelism*. A baseline
captured at local[4] compared against a local[32] run is structurally
incomparable — per-task scheduling overhead, shared-cache contention
and shuffle-partition counts all move with the core count, in both the
wall AND the CPU evidence. The baseline therefore banks the capture's
`env` block (cpus, heap), and the gate REFUSES per-query adjudication
when the fresh run's env does not match (same `cpus`; heap within
±33%) — refusal is loud with re-banking instructions, never a silent
cross-config FAIL.

Policy:
  * FAIL when a carried query exceeds max(BAND x baseline,
    baseline + SLACK, spread x baseline) kernel units AND the failure
    survives evidence adjudication (below). The ratio band (1.5x)
    catches real work growth on substantial queries; the absolute
    slack (1.5 units) absorbs the fixed per-query job-overhead jitter
    that dominates small queries; the banked per-query SPREAD is the
    run-to-run envelope the capture runs themselves demonstrated
    (capped at SPREAD_CAP so one noisy capture cannot widen the gate
    forever).
  * Evidence adjudication for a wall-out-of-band query (round-14/15:
    the gate must explain its own failures from the artifact alone):
      - byte volumes first (round-14 ADVICE): if the query's
        input+shuffle+spill MiB grew past their own band, the
        regression is real I/O growth (extra spill, lost pruning) no
        matter what the CPU says → FAIL with byte evidence.
      - CPU flat (within its own banked envelope — band, slack, AND
        the banked cross-run cpu_spread): the host inflated the wall
        around unchanged work → loud HOST-NOISE report, not a FAIL.
      - CPU out of its own spread while the 1-minute os_load is
        elevated (≥ 2x the banked capture load AND ≥ 60% of the host's
        cores): CPU seconds themselves inflate under core contention
        (r14: table_diff_versions at os_load 11.5) → loud
        CPU-CONTENTION report citing the banked spread, not a FAIL.
      - otherwise → FAIL (CPU grew past its own demonstrated spread on
        a quiet host: real work growth never hides).
  * New queries (no baseline row) are reported; refresh with --update
    after a judged round establishes their cost.
  * Improvements are reported so a speedup can be banked with --update.

Banking accepts MULTIPLE cold-run captures (round-12 ask #1). Each
query banks its MEDIAN across captures (round 15: min-banking made
every later run race the single luckiest capture — on a host whose
wall AND CPU drift 1.5-2x across hours, the best-ever value is not a
baseline, the typical value is), spread = max of in-run spreads and
the cross-run max/median ratio, cpu_s likewise (median + spread),
io_mb = max across runs (an honest upper bound for byte-growth
detection), load = max capture-time os_load. Captures must agree on
`env.cpus`; a calibration outlier (>40% off the median) is excluded
loudly.

Usage:
  python3 tools/bench_regress.py /tmp/preflight_bench.json            # gate
  python3 tools/bench_regress.py run1.json run2.json [...] --update   # bank
"""
import json
import math
import sys

BAND = 1.5
# absolute slacks absorb the fixed per-query jitter that dominates
# sub-second queries (measured round 15: same-HEAD quiet cold runs put
# ~1.4 s of one-off wall on a 0.2 s query while substantial queries
# moved < 1.2x) — the ratio band still binds above ~4 units / ~3 s
SLACK_UNITS = 2.0
CPU_SLACK_UNITS = 1.0
IO_BAND = 1.5
IO_SLACK_MB = 64.0
SPREAD_CAP = 2.5
# the CPU evidence is an ADJUDICATOR, not the primary gate: its banked
# cross-run spread reflects what the capture runs actually demonstrated
# (doc_fingerprint: 4.7x CPU spread across three quiet cold runs on
# this drifting host), so it gets a generous pathology cap rather than
# the wall band's tight one — a banked capture must never fail its own
# gate, and the wall line + byte volumes still report/bind regardless
CPU_SPREAD_CAP = 6.0
SLACK_SEC = 1.5
CPU_SLACK_SEC = 0.75
HEAP_RATIO_MAX = 1.33
BASELINE = "tools/bench_baseline.json"


def load_bench(path):
    """The (per-query) bench JSON line of one capture, or None."""
    # Bench emits two JSON lines (full per-query map + compact summary)
    # and the preflight grep may capture either — pick the one with the
    # per-query map
    lines = [json.loads(l) for l in open(path) if l.strip()]
    return next((l for l in lines if "queries" in l), None)


def per_run(bench, key):
    """query -> per-run value of task_metrics[key] (averaged over the
    best-of-N runs), or {} when the artifact predates task metrics."""
    tm = bench.get("task_metrics", {})
    rng = bench.get("ranges", {})
    out = {}
    for q, m in tm.items():
        runs = max(1, rng.get(q, {}).get("runs", 1))
        out[q] = m.get(key, 0.0) / runs
    return out


def cpu_units_of(bench):
    """query -> per-run executor CPU seconds / calib (kernel units)."""
    c = bench.get("calib_sec", -1.0)
    if c <= 0:
        return {}
    return {q: v / c for q, v in per_run(bench, "cpu_sec").items()}


def io_mb_of(bench):
    """query -> per-run input+shuffle+spill MiB — the byte-volume
    evidence a CPU-flat downgrade must also clear (round-14 ADVICE:
    I/O-bound regressions inflate wall with near-flat CPU)."""
    tm = bench.get("task_metrics", {})
    rng = bench.get("ranges", {})
    out = {}
    for q, m in tm.items():
        runs = max(1, rng.get(q, {}).get("runs", 1))
        out[q] = (m.get("input_mb", 0.0) + m.get("shuffle_mb", 0.0) +
                  m.get("spill_mb", 0.0)) / runs
    return out


def env_of(bench):
    e = bench.get("env", {})
    return {"cpus": str(e.get("cpus", "")),
            "heap_max_gb": float(e.get("heap_max_gb", -1.0)),
            "host_cores": int(e.get("host_cores", -1))}


def env_mismatch(base_env, run_env):
    """Human-readable mismatch description, or None when comparable."""
    if not base_env or base_env.get("cpus") in (None, ""):
        return None  # legacy baseline without env — cannot adjudicate
    msgs = []
    if str(base_env["cpus"]) != str(run_env["cpus"]):
        msgs.append(f"cpus {base_env['cpus']} (baseline) vs {run_env['cpus']} (run)")
    bh, rh = base_env.get("heap_max_gb", -1.0), run_env.get("heap_max_gb", -1.0)
    if bh > 0 and rh > 0 and max(bh / rh, rh / bh) > HEAP_RATIO_MAX:
        msgs.append(f"heap {bh:.0f}G (baseline) vs {rh:.0f}G (run)")
    return "; ".join(msgs) if msgs else None


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

    if update:
        return bank(base, paths)

    run_env = env_of(bench)
    base_env = base.get("env")
    if base_env is None:
        print("[bench-regress] WARNING: baseline has no banked env — "
              "cannot verify config comparability; re-bank with --update "
              "from captures under the gate's config")
    else:
        mism = env_mismatch(base_env, run_env)
        if mism:
            print(f"[bench-regress] ENV-MISMATCH: {mism}")
            print("[bench-regress] kernel units normalize CPU speed, not "
                  "parallelism — a cross-config per-query comparison "
                  "mis-files config skew as regression (r12-r14). "
                  "REFUSING adjudication; re-bank with >=3 cold captures "
                  "under THIS config: SPARK_GRAFT_CPUS=" +
                  str(run_env["cpus"]) +
                  " sbt 'runMain graft.Bench' x3, then --update")
            return 0

    # baseline rows: {"u", "spread", "cpu_u", "cpu_spread", "io_mb",
    # "load"} (legacy rows read with defaults: spread 1.5, no CPU/IO
    # evidence)
    def row(v):
        if isinstance(v, dict):
            return v
        return {"u": v, "spread": 1.5}
    units_base = {k: row(v) for k, v in base["units"].items()}
    now = {k: v / calib for k, v in bench["queries"].items()}
    cpu_raw_now = per_run(bench, "cpu_sec")
    io_now = io_mb_of(bench)
    load_now = {q: m.get("os_load", -1.0)
                for q, m in bench.get("task_metrics", {}).items()}
    host_cores = run_env.get("host_cores", -1)

    raw_now = dict(bench["queries"])
    fails, warns, noise, contention, skew, new, improved = \
        [], [], [], [], [], [], []
    for q, u in sorted(now.items()):
        if q not in units_base:
            new.append(q)
            continue
        r = units_base[q]
        b = r["u"]
        # cap the spread exemption so one noisy capture run cannot
        # permanently widen the gate past SPREAD_CAP x (ADVICE r11)
        spread = min(r.get("spread", 1.5), SPREAD_CAP)
        line = f"{q}: {u:.2f}u vs baseline {b:.2f}u ({u / b:.2f}x, spread {spread:.2f})"
        u_out = u > max(BAND * b, b + SLACK_UNITS, spread * b)
        # raw-seconds band (same-config runs only reach this code):
        # legacy baselines without raw seconds fall back to units-only
        s_b, s_spread = r.get("s"), min(r.get("s_spread", 1.5), SPREAD_CAP)
        s_now_q = raw_now.get(q)
        if s_b is not None and s_now_q is not None:
            s_out = s_now_q > max(BAND * s_b, s_b + SLACK_SEC, s_spread * s_b)
            line += f" [raw {s_now_q:.2f}s vs {s_b:.2f}s]"
        else:
            s_out = u_out
        if u_out != s_out:
            skew.append(line + (" — units out, raw seconds in (calib "
                "drift)" if u_out else " — raw seconds out, units in "
                "(host speed shift the kernel normalized)"))
        elif u_out and s_out:
            # wall left the envelope — adjudicate from the artifact's
            # own evidence (bytes, CPU, load), most-damning first
            # CPU evidence in RAW seconds (same-config comparisons
            # only): kernel division would re-inject calib noise here
            cpu_b, cpu_spread = r.get("cpu_s"), r.get("cpu_spread", 1.0)
            cpu_u = cpu_raw_now.get(q)
            io_b, io_u = r.get("io_mb"), io_now.get(q)
            load_b, load_u = r.get("load", -1.0), load_now.get(q, -1.0)
            io_flat = (io_b is None or io_u is None or
                       io_u <= max(IO_BAND * io_b, io_b + IO_SLACK_MB))
            cpu_env = None
            if cpu_b is not None:
                cpu_env = max(BAND * cpu_b, cpu_b + CPU_SLACK_SEC,
                              min(cpu_spread, CPU_SPREAD_CAP) * cpu_b)
            cpu_flat = cpu_b is not None and cpu_u is not None and cpu_u <= cpu_env
            if not io_flat:
                fails.append(
                    f"{line} [BYTES GREW: {io_u:.0f}MB vs banked {io_b:.0f}MB"
                    f" — I/O volume regression, CPU evidence overruled]")
            elif cpu_flat:
                noise.append(
                    f"{line} — CPU flat ({cpu_u:.2f}s vs banked {cpu_b:.2f}s"
                    f" spread {cpu_spread:.2f}, os_load {load_u:.1f})")
            elif (cpu_b is not None and cpu_u is not None and
                  load_u > 0 and host_cores > 0 and
                  load_u >= max(2.0 * max(load_b, 0.5), 0.6 * host_cores)):
                contention.append(
                    f"{line} — CPU out of its own spread ({cpu_u:.2f}s vs "
                    f"banked {cpu_b:.2f}s spread {cpu_spread:.2f}) but "
                    f"os_load {load_u:.1f} vs banked {load_b:.1f} on "
                    f"{host_cores} cores: CPU moved with load, not code")
            else:
                if cpu_b is not None and cpu_u is not None:
                    line += (f" [cpu {cpu_u:.2f}s vs banked {cpu_b:.2f}s "
                             f"spread {cpu_spread:.2f}, os_load {load_u:.1f}]")
                fails.append(line)
        elif u > BAND * b:
            warns.append(line)
        elif u < b / BAND and b >= 1.0:
            improved.append(f"{q}: {u:.2f}u vs baseline {b:.2f}u")
    gone = sorted(set(units_base) - set(now))

    for tag, rows in (("REGRESSION", fails),
                      ("HOST-NOISE (wall out of band, CPU+bytes flat)", noise),
                      ("CPU-CONTENTION (CPU moved with os_load)", contention),
                      ("MEASURE-SKEW (one wall measure out, one in)", skew),
                      ("above-band (within slack)", warns),
                      ("improved", improved)):
        for r in rows:
            print(f"[bench-regress] {tag}: {r}")
    if new:
        print(f"[bench-regress] {len(new)} new (unbaselined): {', '.join(new)}")
    if gone:
        print(f"[bench-regress] {len(gone)} baselined but not run: {', '.join(gone)}")

    if fails:
        print(f"[bench-regress] FAIL: {len(fails)} carried queries regressed "
              f"past {BAND}x after calibration")
        return 1
    print(f"[bench-regress] PASS: {len(now)} queries within band "
          f"(calib {calib:.3f}s, env cpus={run_env['cpus']} "
          f"heap={run_env['heap_max_gb']:.0f}G)")
    return 0


def bank(base, paths) -> int:
    """--update: merge every capture into a fresh baseline (per query:
    u = min, spread = max of in-run and cross-run envelopes, cpu_u =
    min with its own cpu_spread, io_mb = max, load = max), and bank the
    captures' env block for the gate's comparability check."""
    loaded = []
    for p in paths:
        b = load_bench(p)
        if b is None or b.get("calib_sec", -1.0) <= 0:
            print(f"[bench-regress] skipping capture without map/calib: {p}")
            continue
        loaded.append((p, b))
    # captures must share a config — banking a mixed set would poison
    # the env comparability check the baseline exists to provide
    envs = {env_of(b)["cpus"] for _, b in loaded}
    if len(envs) > 1:
        print(f"[bench-regress] REFUSING to bank mixed-config captures "
              f"(cpus: {sorted(envs)})")
        return 2
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
        runs.append((units, spreads, per_run(b, "cpu_sec"), io_mb_of(b),
                     {q: m.get("os_load", -1.0)
                      for q, m in b.get("task_metrics", {}).items()},
                     dict(b["queries"])))
    if not runs:
        print("[bench-regress] no usable captures — baseline unchanged")
        return 2
    import statistics
    every = sorted(set.intersection(*(set(r[0]) for r in runs)))
    merged = {}
    for q in every:
        us = [r[0][q] for r in runs]
        med_u = statistics.median(us)
        cross = max(us) / med_u if med_u > 0 else 1.5
        spread = max([r[1][q] for r in runs] + [cross])
        # round the spread UP with 0.1% headroom: a banked capture
        # must never fail its own gate — round-to-nearest could
        # store a spread a hair below the true cross-run ratio
        # (emb_neardup_exact, round 13: 1.7004x vs stored 1.700)
        spread_up = math.ceil(spread * 1.001 * 1000) / 1000
        merged[q] = {"u": round(med_u, 4), "spread": spread_up}
        # raw per-run seconds: the same-config wall measure calib
        # drift cannot touch (in-run spread already folded into ranges)
        ss = [r[5][q] for r in runs]
        med_s = statistics.median(ss)
        s_cross = max(ss) / med_s if med_s > 0 else 1.5
        s_spread = max([r[1][q] for r in runs] + [s_cross])
        merged[q]["s"] = round(med_s, 4)
        merged[q]["s_spread"] = math.ceil(s_spread * 1.001 * 1000) / 1000
        # CPU evidence: min across captures (steady-state CPU cost)
        # plus the cross-run spread — round 15: the old bank-the-max
        # policy let one contaminated capture widen the CPU gate with
        # no record of how noisy CPU actually is run-to-run
        cpus = [r[2][q] for r in runs if q in r[2]]
        if cpus:
            med_c = statistics.median(cpus)
            cs = max(cpus) / med_c if med_c > 0 else 1.5
            merged[q]["cpu_s"] = round(med_c, 4)
            merged[q]["cpu_spread"] = math.ceil(cs * 1.001 * 1000) / 1000
        ios = [r[3][q] for r in runs if q in r[3]]
        if ios:
            merged[q]["io_mb"] = round(max(ios), 2)
        loads = [r[4].get(q, -1.0) for r in runs]
        if any(l > 0 for l in loads):
            merged[q]["load"] = round(max(loads), 2)
    base["units"] = merged
    base["calib_sec_at_capture"] = loaded[0][1]["calib_sec"]
    base["env"] = env_of(loaded[0][1])
    base["source"] = (f"refreshed from {len(runs)} cold runs: "
                      + ", ".join(paths))
    json.dump(base, open(BASELINE, "w"), indent=1, sort_keys=True)
    print(f"[bench-regress] baseline refreshed: {len(merged)} queries "
          f"from {len(runs)} captures, env cpus={base['env']['cpus']} "
          f"heap={base['env']['heap_max_gb']:.0f}G")
    return 0


if __name__ == "__main__":
    sys.exit(main())
