#!/usr/bin/env python3
"""Drift-normalized spark/duck ratios for the sf1 tier (judge r11 #1a).

The DuckDB baseline columns are frozen from the session that produced
`scripts/duck_baseline_sf1.json`; the Spark column is measured fresh
each receipt. On a throttled host every ratio inflates by the host
slowdown, silently. Since round 12 the bench embeds CONTROL CELLS —
five tier queries untouched since round 11, with committed reference
times — and stamps `ctrl_drift` = median(measured/reference) into the
receipt. This script divides each measured Spark time by that drift
before forming the spark/duck ratio, so a receipt measured on a 3×-slow
host reads ≈ the same ratios a healthy host would publish (exactly: to
the extent the slowdown is uniform; the per-query spill/GC columns in
the raws say when it is not).

Usage:
  python3 scripts/bench_normalize.py BENCH_rNN.json [duck_baseline_sf1.json]

Reads the sf1 aux line (or, in a driver-wrapped receipt, the `tail`
text) for per-query times + ctrl_drift, prints raw and normalized
ratios against the DuckDB column.
"""
import json, re, sys


def find_sf1(path):
    text = open(path).read()
    # the sf1 aux line may sit inside a driver-wrapped "tail" string —
    # regex it out rather than depending on the wrapper's shape
    for m in re.finditer(r'\{"aux":"sf1".*?"queries":\{[^}]*\}\}', text):
        try:
            return json.loads(m.group(0))
        except json.JSONDecodeError:
            continue
    # committed raw provenance shape (position:first_in_jvm): a round
    # may commit several tier runs (host weather — see BASELINE's
    # measurement note); the citable receipt is the BEST-MEASURED one,
    # i.e. the line whose control drift sits closest to 1.0, breaking
    # ties toward the latest
    best, best_dist = None, None
    for line in text.splitlines():
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if d.get("position") == "first_in_jvm" and "raw" in d:
            drift = float(d.get("ctrl_drift", 1.0) or 1.0)
            dist = abs(drift - 1.0)
            if best is None or dist <= best_dist:
                best_dist = dist
                best = {"queries": {k: min(v) for k, v in d["raw"].items()},
                        "ctrl_drift": drift,
                        "io_w_mbps": d.get("io_w_mbps"),
                        "io_r_mbps": d.get("io_r_mbps")}
    if best is not None:
        return best
    raise SystemExit(f"no sf1 tier data found in {path}")


def main(bench_path, duck_path="scripts/duck_baseline_sf1.json"):
    sf1 = find_sf1(bench_path)
    duck = json.load(open(duck_path))
    drift = float(sf1.get("ctrl_drift", 1.0) or 1.0)
    q = sf1["queries"]
    print(f"host: io_w={sf1.get('io_w_mbps')} MB/s io_r={sf1.get('io_r_mbps')}"
          f" MB/s ctrl_drift={drift:.2f}"
          + ("  << degraded host, normalized column is the honest one"
             if drift > 1.5 else ""))
    print(f"{'query':32s} {'spark_s':>8s} {'norm_s':>8s} {'duck_s':>8s}"
          f" {'ratio':>7s} {'norm':>7s}")
    win = win_n = within2 = within2_n = n = 0
    for name in sorted(q):
        d = duck.get(name, {})
        ds, sp = d.get("sec"), q[name]
        norm = sp / drift
        if ds is None:
            print(f"{name:32s} {sp:8.2f} {norm:8.2f} {'timeout':>8s}")
            continue
        n += 1
        r, rn = sp / ds, norm / ds
        win += r <= 1.0; win_n += rn <= 1.0
        within2 += r <= 2.0; within2_n += rn <= 2.0
        print(f"{name:32s} {sp:8.2f} {norm:8.2f} {ds:8.2f} {r:7.2f} {rn:7.2f}")
    print(f"\n{n} DuckDB-finishable: raw {win} at-or-faster / {within2} "
          f"within 2x; drift-normalized {win_n} / {within2_n}")


if __name__ == "__main__":
    main(*sys.argv[1:])
