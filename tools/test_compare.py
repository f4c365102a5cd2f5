#!/usr/bin/env python3
"""Negative tests for the comparator stack (compare.py + replays.py).

The comparator is load-bearing verification code: the whole oracle
gate's meaning rests on it actually FAILING when outputs diverge.
These tests plant doctored Spark outputs / oracles and assert every
mode reports the diff (VERDICT r11 #2 — the doctored-oracle runs
SCALE.md described, committed as a script):

  - one-cell value diff        -> FAIL in default, --staged, --stream
  - row-count diff             -> FAIL everywhere; --stream's reported
                                  @index is the shorter side's count
                                  (round-12 advisory fix)
  - dtype diff (int vs double) -> schema FAIL in default and --stream
  - NULL-vs-value diff         -> FAIL (float64 'nan' stringification)
  - NULL-ordering divergence   -> --stream FAILs (order is the
                                  contract there); default mode PASSes
                                  (driver resort) — both asserted, so
                                  the semantic difference stays
                                  documented by a running test
  - float columns in --stream  -> the row-wise (non-vectorized) path
                                  still catches a one-cell diff
  - replay md5 stale-guard     -> --staged refuses a replay whose
                                  oracle drifted (exec-error FAIL)
  - WITH RECURSIVE / unparseable CTE under --staged -> falls back to
                                  fused execution and PASSes

Run: python3 tools/test_compare.py   (exit 0 = all scenarios green)
"""
import json
import os
import shutil
import subprocess
import sys
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))
COMPARE = os.path.join(HERE, "compare.py")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def write_sf(root):
    """Minimal fixture dir: every table compare.py views must exist."""
    sf = os.path.join(root, "sf")
    os.makedirs(sf)
    for t in TABLES:
        pq.write_table(pa.table({"dummy": pa.array([1], pa.int64())}),
                       os.path.join(sf, f"{t}.parquet"))
    return sf


def write_out(root, tag, name, table, oracle_sql):
    """A verify-style out dir holding ONE query output + its oracle."""
    out = os.path.join(root, f"out_{tag}")
    qdir = os.path.join(out, name)
    os.makedirs(qdir)
    pq.write_table(table, os.path.join(qdir, "part-00000.parquet"))
    with open(os.path.join(out, "oracle_sql.json"), "w") as f:
        json.dump({name: oracle_sql}, f)
    return out


def run(sf, out, *flags):
    env = dict(os.environ,
               GRAFT_DUCKDB_SPILL=os.path.join(out, "spill"),
               GRAFT_DUCKDB_MEMLIMIT="2GB")
    p = subprocess.run([sys.executable, COMPARE, sf, out, *flags],
                       capture_output=True, text=True, env=env)
    return p.returncode, p.stdout + p.stderr


checks = 0


def expect(cond, label, output=""):
    global checks
    checks += 1
    if not cond:
        sys.exit(f"NEGATIVE-TEST FAIL: {label}\n--- comparator output ---\n"
                 f"{output}")
    print(f"ok {checks:2d}  {label}")


def ints(rows, names=("k", "v")):
    cols = list(zip(*rows)) if rows else [[], []]
    return pa.table({n: pa.array(list(c), pa.int64())
                     for n, c in zip(names, cols)})


def main():
    root = tempfile.mkdtemp(prefix="graft_cmp_test_")
    try:
        sf = write_sf(root)
        base_rows = [(1, 10), (2, 20), (3, 30)]
        base_sql = ("SELECT * FROM (VALUES (1, 10), (2, 20), (3, 30)) "
                    "t(k, v) ORDER BY k")

        # -------- baseline: identical outputs PASS in every mode
        out = write_out(root, "ok", "q_t", ints(base_rows), base_sql)
        for flags in ([], ["--staged"], ["--stream"]):
            rc, o = run(sf, out, *flags)
            expect(rc == 0 and "PASS q_t" in o,
                   f"baseline PASS {flags or ['default']}", o)

        # -------- one-cell diff FAILs in every mode
        out = write_out(root, "cell", "q_t",
                        ints([(1, 10), (2, 21), (3, 30)]), base_sql)
        for flags in ([], ["--staged"], ["--stream"]):
            rc, o = run(sf, out, *flags)
            expect(rc == 1 and "FAIL q_t" in o,
                   f"one-cell diff FAIL {flags or ['default']}", o)

        # -------- row-count diff FAILs; --stream reports the shorter
        # side's count as the divergence index
        out = write_out(root, "rows", "q_t",
                        ints([(1, 10), (2, 20)]), base_sql)
        rc, o = run(sf, out)
        expect(rc == 1 and "rows spark=2 oracle=3" in o,
               "row-count diff FAIL (default)", o)
        rc, o = run(sf, out, "--stream")
        expect(rc == 1 and "stream diff @2" in o,
               "row-count diff FAIL (--stream, @index = spark count)", o)
        out = write_out(root, "rows2", "q_t", ints(base_rows),
                        "SELECT * FROM (VALUES (1, 10), (2, 20)) "
                        "t(k, v) ORDER BY k")
        rc, o = run(sf, out, "--stream")
        expect(rc == 1 and "stream diff @2" in o,
               "row-count diff FAIL (--stream, @index = oracle count)", o)

        # -------- dtype diff (int vs double) is a schema FAIL even
        # though stringified values could never match anyway
        out = write_out(root, "dtype", "q_t", ints(base_rows),
                        "SELECT k, CAST(v AS DOUBLE) AS v FROM (VALUES "
                        "(1, 10), (2, 20), (3, 30)) t(k, v) ORDER BY k")
        for flags in ([], ["--stream"]):
            rc, o = run(sf, out, *flags)
            expect(rc == 1 and "dtype mismatch" in o,
                   f"dtype diff FAIL {flags or ['default']}", o)

        # -------- NULL vs value: float64 column, one side null
        tbl = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                        "v": pa.array([10.0, None, 30.0], pa.float64())})
        out = write_out(root, "null", "q_t", tbl,
                        "SELECT k, CAST(v AS DOUBLE) AS v FROM (VALUES "
                        "(1, 10), (2, 20), (3, 30)) t(k, v) ORDER BY k")
        rc, o = run(sf, out)
        expect(rc == 1 and "FAIL q_t" in o, "NULL-vs-value diff FAIL", o)

        # -------- NULL-ordering divergence: same multiset, different
        # order. --stream (order IS the contract) must FAIL; the
        # default driver compare resorts and must PASS.
        tbl = pa.table({"k": pa.array([None, 1, 2], pa.int64()),
                        "v": pa.array([30, 10, 20], pa.int64())})
        sql_nl = ("SELECT * FROM (VALUES (1, 10), (2, 20), "
                  "(NULL, 30)) t(k, v) ORDER BY k NULLS LAST")
        out = write_out(root, "nullord", "q_t", tbl, sql_nl)
        rc, o = run(sf, out, "--stream")
        expect(rc == 1 and "stream diff @0" in o,
               "NULL-ordering divergence FAIL (--stream)", o)
        rc, o = run(sf, out)
        expect(rc == 0, "NULL-ordering same-multiset PASS (default resort)",
               o)

        # -------- float column forces --stream onto the row-wise
        # path; a one-cell diff must still surface there
        fl = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                       "v": pa.array([1.5, 2.5, 3.5], pa.float64())})
        sql_f = ("SELECT k, CAST(v AS DOUBLE) AS v FROM (VALUES (1, 1.5), "
                 "(2, 2.5), (3, 3.5)) t(k, v) ORDER BY k")
        out = write_out(root, "fok", "q_t", fl, sql_f)
        rc, o = run(sf, out, "--stream")
        expect(rc == 0 and "PASS q_t" in o,
               "float column --stream row-wise PASS", o)
        out = write_out(root, "fbad", "q_t", fl,
                        sql_f.replace("(2, 2.5)", "(2, 2.4)"))
        rc, o = run(sf, out, "--stream")
        expect(rc == 1 and "stream diff @1" in o,
               "float one-cell diff FAIL (--stream row-wise)", o)

        # -------- replay md5 stale-guard: a --staged run of a query
        # that HAS a hand replay must refuse when the oracle text is
        # not the one the replay was derived from
        out = write_out(root, "stale", "q_dedup_simhash_hamming",
                        ints(base_rows), base_sql)
        rc, o = run(sf, out, "--staged")
        expect(rc == 1 and "oracle changed" in o,
               "replay md5 stale-guard trips on drifted oracle", o)

        # -------- staged fallbacks: RECURSIVE and unparseable CTE
        # lists execute fused and PASS (round-12 advisory)
        out = write_out(root, "rec", "q_t", ints([(1, 1), (2, 2), (3, 3)]),
                        "WITH RECURSIVE r(k, v) AS ("
                        "SELECT 1, 1 UNION ALL "
                        "SELECT k + 1, k + 1 FROM r WHERE k < 3) "
                        "SELECT k, v FROM r ORDER BY k")
        rc, o = run(sf, out, "--staged")
        expect(rc == 0 and "PASS q_t" in o,
               "--staged falls back fused on WITH RECURSIVE", o)
        out = write_out(root, "quot", "q_t", ints(base_rows),
                        'WITH "quoted name" AS (' + base_sql +
                        ') SELECT * FROM "quoted name"')
        rc, o = run(sf, out, "--staged")
        expect(rc == 0 and "PASS q_t" in o,
               "--staged falls back fused on unparseable CTE name", o)

        print(f"== all {checks} comparator negative-tests green ==")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
