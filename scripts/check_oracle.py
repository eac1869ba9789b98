#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs graft.Verify output (parquet per query + oracle_sql.json) against
DuckDB over the same scale-factor tables and reports per-query
row/schema/value match. Driver-side tooling only — NOT part of the
library (see builder notes: duckdb/pyarrow are driver-side).

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

def load_result(path):
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        return None
    # Verify writes coalesce(1), but NEVER trust that silently: read and
    # concat every part-file so a multi-part dump can't truncate the
    # compare (judge r6 hardening note).
    import pyarrow as pa
    return pa.concat_tables([pq.read_table(f) for f in files])

def canon(table):
    """Sort columns by name; return (schema_desc, row tuples)."""
    cols = sorted(table.column_names)
    tbl = table.select(cols)
    rows = list(zip(*[tbl.column(c).to_pylist() for c in cols])) if cols else []
    schema = [(c, str(tbl.schema.field(c).type)) for c in cols]
    return schema, rows

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for name in ["region","nation","customer","supplier","part","orders",
                 "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    failures = 0
    for qname in sorted(oracle):
        got_t = load_result(os.path.join(out_dir, qname))
        if got_t is None:
            print(f"FAIL {qname}: no spark output"); failures += 1; continue
        try:
            exp_t = con.execute(oracle[qname]).arrow()
        except Exception as e:
            print(f"FAIL {qname}: oracle sql error: {e}"); failures += 1; continue
        gs, gr = canon(got_t)
        es, er = canon(exp_t)
        if [c for c,_ in gs] != [c for c,_ in es]:
            print(f"FAIL {qname}: columns {[c for c,_ in gs]} vs {[c for c,_ in es]}")
            failures += 1; continue
        if gs != es:
            print(f"WARN {qname}: dtypes differ {gs} vs {es}")
        if len(gr) != len(er):
            print(f"FAIL {qname}: rows {len(gr)} vs {len(er)}"); failures += 1; continue
        if gr != er:
            bad = [i for i,(a,b) in enumerate(zip(gr,er)) if a != b][:3]
            print(f"FAIL {qname}: value mismatch at rows {bad}")
            for i in bad:
                print(f"  spark={gr[i]}\n  duck ={er[i]}")
            failures += 1; continue
        print(f"OK   {qname}: {len(gr)} rows")
    print(f"\n{'ALL GREEN' if failures == 0 else str(failures) + ' FAILURES'}")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
