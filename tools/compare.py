#!/usr/bin/env python3
"""Driver-strict pre-flight for the DuckDB oracle compare (t2).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Round-1 lesson (CORRECTNESS_r01.json): the previous version of this script
canonicalized Decimal scale and float repr, reporting 88/88 locally while the
driver saw 60/88. The driver loads the Spark result with pandas.read_parquet
and the oracle with duckdb .df(), sorts columns by name, sorts rows with
DataFrame.sort_values, then compares STRINGIFIED cell values with NO numeric
normalization — Decimal('253942.00') != '253942.0', datetime.date(...) !=
Timestamp(...), and array cells crash sort_values outright.

This script reproduces those semantics exactly:
  - Spark side: pandas.read_parquet on the whole query output dir.
  - Oracle side: duckdb con.execute(sql).df().
  - Columns sorted by name; rows sorted by sort_values(all columns)
    (TypeError => FAIL, matching the driver's `err` rows).
  - Cells compared as str(value) — no Decimal.normalize, no float coercion.
  - pandas dtype mismatch is reported as a FAIL even if strings happen to
    match: identical dtypes are the only way to *guarantee* identical
    stringification, so we force canonical output types on every query.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    """Driver-style canonical frame: columns sorted by name, rows sorted by
    all columns, cells stringified. Raises on unsortable cells (arrays)."""
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(list(df.columns), kind="mergesort")
    df = df.reset_index(drop=True)
    return df


def cells(df):
    return [tuple(str(v) for v in row) for row in df.itertuples(index=False, name=None)]


def dtype_class(dt):
    """Stringification-equivalence class of a pandas dtype. The driver
    compares str(value), so dtypes that ALWAYS stringify equal values
    identically (int32 vs int64) are interchangeable; anything else
    (Decimal object vs float64, date object vs datetime64, float32 vs
    float64, int vs float) changes stringification and must match."""
    s = str(dt)
    if s.startswith(("int", "uint")):
        return "int"
    if s.startswith("datetime64"):
        return "datetime"
    return s


def main():
    sf, out = sys.argv[1], sys.argv[2]
    # Optional artifact emission (round 9 — VERDICT r8 "what's wrong" #3:
    # artifact provenance must be MECHANICAL, not a hand-written note):
    #   --artifact <path>   write a CORRECTNESS_*-style JSON, stamped with
    #                       the exact `git rev-parse HEAD` of the sweep
    #   --note <text>       human context prepended to the stamp
    #   --only-present      skip queries with no spark output instead of
    #                       failing them (subset sweeps via SPARK_GRAFT_ONLY)
    artifact = note = jsonl = None
    only_present = False
    skip = set()
    only = None
    args = sys.argv[3:]
    while args:
        a = args.pop(0)
        if a == "--artifact":
            artifact = args.pop(0)
        elif a == "--jsonl":
            # per-query JSON-lines accumulator for the one-query-per-
            # process harness (gate_batch.py): each completed compare
            # appends its full record; tools/assemble_gate.py merges the
            # lines into a CORRECTNESS_* artifact with a mechanical stamp
            jsonl = args.pop(0)
        elif a == "--note":
            note = args.pop(0)
        elif a == "--only-present":
            only_present = True
        elif a == "--skip":
            # defer named queries (e.g. multi-hour DuckDB twins run in
            # their own phase); they are reported as SKIP, never PASS
            skip |= {s for s in args.pop(0).split(",") if s}
        elif a == "--only":
            # restrict to the named queries (per-query harness driving:
            # one twin per process so a spilling monster can be timed
            # out and killed without losing the batch)
            only = {s for s in args.pop(0).split(",") if s}
        else:
            sys.exit(f"unknown arg {a}")
    results = {}
    con = duckdb.connect()
    # let big oracle CTEs (the unrolled k-core peel at sf1+) spill to
    # disk instead of dying at the in-memory ceiling. Resource config
    # only — comparator semantics stay driver-strict.
    # GRAFT_DUCKDB_SPILL lets parallel gate workers (gate_batch.py
    # sharded across processes) give each DuckDB its OWN spill dir —
    # a shared one would be rmtree'd between queries by a sibling
    # worker mid-spill.
    spill_dir = os.environ.get("GRAFT_DUCKDB_SPILL", "/tmp/duckdb_spill")
    con.execute(f"SET temp_directory='{spill_dir}'")
    # overridable for phases that share the box with a live Spark JVM
    # (parallel gate workers + a Verify/Bench run): 90GB × N workers
    # would invite the OOM killer; resource config only, semantics
    # stay driver-strict.
    con.execute("SET memory_limit='"
                + os.environ.get("GRAFT_DUCKDB_MEMLIMIT", "90GB") + "'")
    for t in TABLES:
        # driver fixtures are single files; ScaleUp dirs are
        # <table>.parquet/part-*.parquet — read either layout.
        # (Read-path only: comparator semantics stay driver-strict.)
        p = f"{sf}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0

    def rec(name, rows_match, schema_match, hash_match, rows, err):
        results[name] = {"rows_match": rows_match, "schema_match": schema_match,
                         "hash_match": hash_match, "rows": rows, "err": err}

    for name in sorted(oracle):
        if only is not None and name not in only:
            continue
        if name in skip:
            print(f"SKIP {name} (deferred by --skip)")
            continue
        files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
        if not files:
            if only_present:
                continue
            print(f"FAIL {name}: no spark output")
            rec(name, False, False, False, 0, "no spark output")
            n_fail += 1
            continue
        try:
            sdf = pd.read_parquet(files if len(files) > 1 else files[0])
            odf = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            rec(name, False, False, False, 0, f"exec error: {e}")
            n_fail += 1
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print(f"FAIL {name}: columns spark={sorted(sdf.columns)} "
                  f"oracle={sorted(odf.columns)}")
            rec(name, len(sdf) == len(odf), False, False, len(sdf), None)
            n_fail += 1
            continue
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
            rec(name, False, True, False, len(sdf), None)
            n_fail += 1
            continue
        try:
            sdf, odf = norm(sdf), norm(odf)
        except Exception as e:
            print(f"FAIL {name}: sort error (driver 'err'): {type(e).__name__}: {e}")
            rec(name, True, True, False, len(sdf),
                f"sort error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        sd, od = dict(sdf.dtypes), dict(odf.dtypes)
        dt_bad = [c for c in sd if dtype_class(sd[c]) != dtype_class(od[c])]
        if dt_bad:
            detail = ", ".join(f"{c}: spark={sd[c]} oracle={od[c]}" for c in dt_bad)
            print(f"FAIL {name}: dtype mismatch ({detail})")
            rec(name, True, False, False, len(sdf), None)
            n_fail += 1
            continue
        srows, orows = cells(sdf), cells(odf)
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(srows)} rows differ; first@{i}:")
            print(f"  spark : {a}")
            print(f"  oracle: {b}")
            rec(name, True, True, False, len(srows), None)
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            rec(name, True, True, True, len(srows), None)
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if jsonl:
        with open(jsonl, "a") as f:
            for name in sorted(results):
                f.write(json.dumps({"query": name, **results[name]}) + "\n")
    if artifact:
        import subprocess, datetime
        commit = subprocess.run(
            ["git", "-C", os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
             "rev-parse", "HEAD"],
            capture_output=True, text=True).stdout.strip()
        dirty = subprocess.run(
            ["git", "-C", os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
             "status", "--porcelain", "--", "src", "tools"],
            capture_output=True, text=True).stdout.strip()
        stamp = (f"swept at commit {commit}"
                 + (" (src/tools DIRTY at sweep time)" if dirty else " (clean)")
                 + f" on {datetime.date.today().isoformat()}")
        # Partial sweeps must be distinguishable from full gates (round-10
        # advisory: a subset artifact stamped like a full one is the r8
        # stale-artifact failure mode in new clothes): record the exact
        # invocation flags AND the oracle queries absent from the body.
        absent = sorted(q for q in oracle if q not in results)
        invocation = {
            "only": sorted(only) if only is not None else None,
            "skip": sorted(skip),
            "only_present": only_present,
            "n_oracle_queries": len(oracle),
            "absent_queries": absent,
            "partial": bool(absent),
        }
        body = {"sf_dir": sf,
                "note": ((note + " — ") if note else "") + stamp,
                "invocation": invocation,
                "n_pass": n_pass, "n_fail": n_fail, "queries": results}
        with open(artifact, "w") as f:
            json.dump(body, f, indent=1)
        print(f"artifact -> {artifact} [{stamp}]")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
