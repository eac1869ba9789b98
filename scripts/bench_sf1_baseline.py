#!/usr/bin/env python3
"""DuckDB wall-time baseline for the sf1 (10x sf0.1) throughput tier.

Same contract as bench_baseline.py, restricted to graft.Bench's Sf1Tier
query list: DuckDB executes each tier query's own oracle SQL (the exact
SQL the correctness gate hash-matches at sf0.01) over the MakeSf1
parquet tables, same machine, same thread count. Driver-side tooling
only -- NOT part of the library.

The sf1 data directory stores each table as a parquet DIRECTORY
(Spark's writer layout), so views glob '<dir>/<t>.parquet/*.parquet'.

Usage:
  python3 scripts/bench_sf1_baseline.py <sf1Dir> <oracleSqlJson> <threads> \
      [sparkSf1AuxJson] > sf1_baseline.json

sparkSf1AuxJson is the {"aux":"sf1",...} line graft.Bench prints; when
given, the script appends/replaces the '## sf1 throughput tier' section
of BASELINE.md with the per-query ratio table.
"""
import sys, json, os, re, time, threading
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# graft.Bench.Sf1Tier, mirrored (the tier is defined once in Scala; this
# list is only used to subset the oracle json and order the table)
TIER = ["pipeline_curation", "q51_calibration", "q54_growth_accounting",
        "q55_pareto", "q57_pr_curve", "q36_quantile_sketch", "ann_pq_rerank",
        "search_rrf_fusion", "q48_rfm", "graph_pagerank", "q34_outliers",
        "dedup_sorted_multi", "dedup_minhash_lsh", "ts_hampel",
        "dedup_survivorship", "q52_basket", "dedup_clusters", "ann_knn_graph",
        "data_split_cluster_safe", "dedup_ngram_capped",
        "dedup_containment_capped", "data_triplets", "pipeline_dedup_cascade",
        "graph_knn_components", "graph_link_predict"]

BUDGET_SEC = 600.0


def _timed(con, sql, budget):
    done = threading.Event()

    def kill():
        if not done.wait(budget):
            try:
                con.interrupt()
            except Exception:  # noqa: BLE001
                pass
    t = threading.Thread(target=kill, daemon=True)
    t.start()
    t0 = time.monotonic()
    try:
        con.execute(sql).arrow()
        return time.monotonic() - t0, None
    except Exception as e:  # noqa: BLE001 - record, keep going
        msg = str(e).splitlines()[0]
        if "INTERRUPT" in msg.upper():
            msg = f"timeout>{int(budget)}s"
        return None, msg
    finally:
        done.set()


def bench(sf1_dir, oracle, threads):
    con = duckdb.connect()
    con.execute(f"PRAGMA threads={threads}")
    for name in TABLES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM "
                    f"'{sf1_dir}/{name}.parquet/*.parquet'")
    out = {}
    for qname in TIER:
        if qname not in oracle:
            out[qname] = {"sec": None, "err": "no_oracle"}
            continue
        sec, err = _timed(con, oracle[qname], BUDGET_SEC)
        out[qname] = {"sec": sec, "err": err}
        print(f"[duck-sf1] {qname}: "
              f"{sec if sec is None else round(sec, 2)}"
              f"{' ' + err if err else ''}", file=sys.stderr)
    return out


SECTION = "## sf1 throughput tier"


def write_md(duck, spark_q, sf1_dir, threads, path="BASELINE.md"):
    lines = [SECTION, "",
             "10x sf0.1 data from `graft.MakeSf1` (the Stress100 "
             "workload-preserving scale-up: token-tagged document "
             "replicas, rotated embedding replicas, key-offset star "
             "replicas), top-25 wall-time oracle-gated queries, "
             f"{threads} threads both engines, one timed run "
             "(variance is proportionally small at this scale), "
             "600 s DuckDB budget.", "",
             "| query | spark s | duckdb s | ratio |",
             "|---|---|---|---|"]
    tot_s = tot_d = 0.0
    n_both = within2 = 0
    for q in TIER:
        s = spark_q.get(q)
        d = duck.get(q, {})
        dsec, derr = d.get("sec"), d.get("err")
        if s is None:
            continue
        if dsec is None:
            lines.append(f"| {q} | {s:.2f} | {derr or 'n/a'} | — |")
        else:
            r = s / dsec if dsec > 0 else float("inf")
            lines.append(f"| {q} | {s:.2f} | {dsec:.2f} | {r:.2f}x |")
            tot_s += s
            tot_d += dsec
            n_both += 1
            within2 += int(r <= 2.0)
    lines += ["",
              f"**Totals over the {n_both} queries DuckDB finished: "
              f"spark {tot_s:.2f}s vs duckdb {tot_d:.2f}s "
              f"(**{(tot_s / tot_d) if tot_d else 0:.2f}x**); "
              f"{within2}/{n_both} within 2x.** DuckDB timeouts count "
              "as evidence for the distributed plan, not against the "
              "comparison.", ""]
    with open(path) as f:
        md = f.read()
    block = "\n".join(lines) + "\n"
    if SECTION in md:
        md = re.sub(re.escape(SECTION) + r".*?(?=\n## |\Z)", block, md,
                    flags=re.S)
    else:
        md = md.rstrip() + "\n\n" + block
    with open(path, "w") as f:
        f.write(md)
    print(f"[duck-sf1] wrote {SECTION!r} section to {path}",
          file=sys.stderr)


def main(argv):
    sf1_dir, oracle_path, threads = argv[0], argv[1], int(argv[2])
    with open(oracle_path) as f:
        oracle = json.load(f)
    duck = bench(sf1_dir, oracle, threads)
    json.dump(duck, sys.stdout, indent=1, sort_keys=True)
    if len(argv) > 3:
        with open(argv[3]) as f:
            spark = json.load(f)
        write_md(duck, spark["queries"], sf1_dir, threads)
    return 0


def regen(argv):
    """--regen <duckJson> <sparkSf1AuxJson> <sf1Dir> <threads>:
    rebuild the md section from saved DuckDB timings (the oracle SQL of
    tier queries did not change) + a fresh spark tier aux line."""
    duck_json, spark_json, sf1_dir, threads = argv[:4]
    with open(duck_json) as f:
        duck = json.load(f)
    with open(spark_json) as f:
        spark = json.load(f)
    write_md(duck, spark["queries"], sf1_dir, int(threads))
    return 0


if __name__ == "__main__":
    if sys.argv[1:2] == ["--regen"]:
        sys.exit(regen(sys.argv[2:]))
    sys.exit(main(sys.argv[1:]))
