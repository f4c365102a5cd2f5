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
import sys, json, glob, os, re
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


def split_ctes(sql):
    """Split a top-level `WITH [RECURSIVE] name AS [MATERIALIZED] (...)`
    list into ([(name, body), ...], final_statement). Paren- and
    single-quote-aware ('' escapes honored); nested WITH inside a body
    is left untouched as part of that body. Raises ValueError if the
    text does not parse — exec_staged catches it and falls back to
    un-staged (fused) execution."""
    m = re.match(r"\s*WITH\s+(RECURSIVE\s+)?", sql, re.I)
    if not m:
        return [], sql
    i = m.end()
    n = len(sql)
    ctes = []
    while True:
        m = re.match(
            r"\s*([A-Za-z_][A-Za-z0-9_]*)\s*(\([^()]*\))?\s+AS\s+"
            r"((?:NOT\s+)?MATERIALIZED\s+)?\(", sql[i:], re.I)
        if not m:
            raise ValueError(f"CTE parse error at offset {i}: "
                             f"{sql[i:i + 60]!r}")
        name = m.group(1)
        collist = m.group(2)  # `name(col, ...) AS (...)` form, or None
        k = i + m.end()  # just past the opening paren
        depth = 1
        while k < n and depth:
            c = sql[k]
            if c == "'":
                k += 1
                while k < n:
                    if sql[k] == "'":
                        if k + 1 < n and sql[k + 1] == "'":
                            k += 2
                            continue
                        break
                    k += 1
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            k += 1
        if depth:
            raise ValueError("unbalanced parens in CTE body")
        body = sql[i + m.end():k - 1]
        if collist:
            # `name(a, b) AS (body)` renames the body's columns — keep
            # that via a column-aliasing subquery when staging
            body = f"SELECT * FROM ({body}) AS {name}{collist}"
        ctes.append((name, body))
        m = re.match(r"\s*,", sql[k:])
        if not m:
            return ctes, sql[k:]
        i = k + m.end()


def exec_staged(con, name, sql):
    """Execute an oracle query by STAGING: each top-level CTE becomes a
    temp table in declaration order (evaluation-strategy change only —
    each CTE is a pure relational expression, so materializing it
    cannot change the final relation), then the final statement runs
    against the staged tables. This is the chunked-oracle-replay path
    for twins whose single fused DuckDB pipeline exhausts spill at
    sf10 (the banded-signature self-join feeding the CC walk measured
    >45 GB fused, vs ~50 s staged — the planner recomputes/fuses what
    the CTE list declares as stages). Per-query hand-derived replays
    (tools/replays.py) take precedence; each documents its equivalence
    argument."""
    try:
        from replays import REPLAYS
    except ImportError:
        REPLAYS = {}
    replay = REPLAYS.get(name)
    if replay:
        import hashlib
        got = hashlib.md5(sql.encode()).hexdigest()
        if got != replay["expect_md5"]:
            raise ValueError(
                f"replay for {name} targets oracle md5 "
                f"{replay['expect_md5']} but oracle_sql.json has {got}"
                " — the oracle changed; refresh or drop the replay")
        stmts = replay["stmts"]
        for st in stmts[:-1]:
            con.execute(st)
        return con.execute(stmts[-1])
    # RECURSIVE CTEs cannot be staged (a self-referencing body has no
    # CREATE TEMP TABLE form) and a CTE-list parse failure must not
    # turn a valid oracle into an exec-error FAIL — both fall back to
    # the fused single-statement pipeline (round-12 advisory).
    if re.match(r"\s*WITH\s+RECURSIVE\b", sql, re.I):
        return con.execute(sql)
    try:
        ctes, final = split_ctes(sql)
    except ValueError:
        return con.execute(sql)
    for nm, body in ctes:
        con.execute(f'CREATE OR REPLACE TEMP TABLE "{nm}" AS {body}')
    return con.execute(final)


def stream_compare(files, rb):
    """Row-stream compare in the query's own ORDER BY. Valid ONLY when
    that ORDER BY is a total order (caller opts in per query): Spark
    wrote a globally range-sorted output, so its part files read in
    part order ARE the sorted stream; the oracle cursor streams its
    own ORDER BY. Both sides pass through the same arrow -> pandas ->
    str(cell) conversion, so stringification rules cannot diverge
    between sides; pairwise-equal ordered streams imply the driver's
    sort-all-columns compare passes too (equal multisets resort
    identically). Returns (n_rows_spark, n_rows_oracle, first_diff)
    where first_diff is None or (row_idx, spark_tuple, oracle_tuple).
    `rb` is the oracle cursor's RecordBatchReader (the caller reads its
    .schema for the dtype gate before handing it over)."""
    import itertools
    import pyarrow.parquet as pq

    def spark_batches():
        for f in files:
            for b in pq.ParquetFile(f).iter_batches(batch_size=131072):
                yield b

    def oracle_batches(rb):
        while True:
            try:
                yield rb.read_next_batch()
            except StopIteration:
                return

    def rows(batches):
        for b in batches:
            df = b.to_pandas()
            df = df[sorted(df.columns)]
            for row in df.itertuples(index=False, name=None):
                yield tuple(str(v) for v in row)

    # Vectorized typed fast path for outputs with NO float/decimal
    # columns (e.g. the 197M-row hamming pair table): for integer/
    # string columns, typed equality after a cast to a common arrow
    # type is EXACTLY str-equality (ints of any width stringify
    # identically — the same dtype_class the frame comparator uses),
    # so aligned arrow slices can be compared wholesale instead of
    # 2×rows×cols Python str() calls. Floats keep the row-wise str()
    # path (driver semantics compare repr, and -0.0/NaN make typed
    # equality diverge from it).
    import pyarrow as pa

    def common_type(ta, tb):
        def norm_t(t):
            if pa.types.is_integer(t):
                return pa.int64()
            if pa.types.is_string(t) or pa.types.is_large_string(t):
                return pa.large_string()
            if pa.types.is_boolean(t):
                return pa.bool_()
            if pa.types.is_date(t):
                return pa.date32()
            if pa.types.is_timestamp(t):
                return pa.timestamp("us")
            return None
        na, nb = norm_t(ta), norm_t(tb)
        return na if na is not None and na == nb else None

    sp_first = pq.ParquetFile(files[0]).schema_arrow
    cols = sorted(sp_first.names)
    common = {}
    for c in cols:
        ct = common_type(sp_first.field(c).type, rb.schema.field(c).type)
        if ct is None:
            common = None
            break
        common[c] = ct
    if common is not None:
        schema = pa.schema([(c, common[c]) for c in cols])

        class Chunks:
            def __init__(self, batches):
                self.it = iter(batches)
                self.tbl = None
                self.off = 0

            def take(self, n):
                """Up to n rows as a Table cast to the common schema;
                None when exhausted."""
                if self.tbl is None or self.off >= self.tbl.num_rows:
                    b = next(self.it, None)
                    if b is None:
                        return None
                    self.tbl = pa.Table.from_batches([b]) \
                        .select(cols).cast(schema)
                    self.off = 0
                out = self.tbl.slice(self.off,
                                     min(n, self.tbl.num_rows - self.off))
                self.off += out.num_rows
                return out

        cs = Chunks(spark_batches())
        co = Chunks(oracle_batches(rb))
        ns = no = 0
        while True:
            a = cs.take(1 << 20)
            if a is None:
                break
            got = 0
            parts = []
            while got < a.num_rows:
                b = co.take(a.num_rows - got)
                if b is None:
                    break
                parts.append(b)
                got += b.num_rows
            b = pa.concat_tables(parts) if parts else None
            if b is None or b.num_rows < a.num_rows:
                bn = b.num_rows if b is not None else 0
                # the oracle stream ran dry mid-chunk: the divergence
                # is at the oracle's total row count — capture it
                # BEFORE draining the spark side (round-12 advisory;
                # the partially-fetched oracle rows in this last chunk
                # were not compared, but the row-count FAIL verdict is
                # already decided)
                div_idx = no + bn
                ns += a.num_rows + sum(
                    t.num_rows for t in iter(lambda: cs.take(1 << 20), None))
                no += bn
                return ns, no, (div_idx, "<spark row>", None)
            if not a.equals(b):
                # locate the first differing row for the report
                pda, pdb = a.to_pandas(), b.to_pandas()
                for i in range(len(pda)):
                    ra = tuple(str(v) for v in pda.iloc[i])
                    rbo = tuple(str(v) for v in pdb.iloc[i])
                    if ra != rbo:
                        return ns + i, no + i, (ns + i, ra, rbo)
            ns += a.num_rows
            no += a.num_rows
        tail = co.take(1)
        if tail is not None:
            no += tail.num_rows + sum(
                t.num_rows for t in iter(lambda: co.take(1 << 20), None))
            return ns, no, (ns, None, "<oracle row>")
        return ns, no, None

    ns = no = 0
    first_diff = None
    srows = rows(spark_batches())
    orows = rows(oracle_batches(rb))
    for i, (a, b) in enumerate(itertools.zip_longest(srows, orows)):
        if a is not None:
            ns += 1
        if b is not None:
            no += 1
        if first_diff is None and a != b:
            first_diff = (i, a, b)
            if a is None or b is None:
                # length mismatch: drain both sides for true counts
                ns += sum(1 for _ in srows)
                no += sum(1 for _ in orows)
                break
    return ns, no, first_diff


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
    staged = stream = False
    skip = set()
    only = None
    args = sys.argv[3:]
    while args:
        a = args.pop(0)
        if a == "--staged":
            # chunked oracle replay: stage each top-level CTE as a
            # temp table in a DISK-BACKED DuckDB under the spill dir.
            # Same algebra, explicit evaluation order — for twins whose
            # fused pipeline exhausts spill at 100× (the CC-walk
            # family). See exec_staged.
            staged = True
        elif a == "--stream":
            # stream-compare in the query's own ORDER BY instead of
            # pandas-sorting the full frames. ONLY valid when that
            # ORDER BY is a total order (e.g. a PK) — the caller opts
            # in per query. Closes the 60M-row comparator-sort
            # timeouts (q_join_inner at sf10).
            stream = True
        elif a == "--artifact":
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
    # staged/stream twins get a DISK-BACKED database so materialized
    # stages live in the buffer pool with eviction, not the Python
    # heap; it sits inside the spill dir so gate_batch's disk watchdog
    # and between-query wipe still govern it.
    spill_raw = os.environ.get("GRAFT_DUCKDB_SPILL", "/tmp/duckdb_spill")
    if staged or stream:
        os.makedirs(spill_raw, exist_ok=True)
        # PID-suffixed DB file: two gate workers mis-sharing one spill
        # dir degrade to separate databases instead of colliding on
        # DuckDB's single-writer file lock (round-12 advisory)
        con = duckdb.connect(
            os.path.join(spill_raw, f"staged-{os.getpid()}.duckdb"))
    else:
        con = duckdb.connect()
    # let big oracle CTEs (the unrolled k-core peel at sf1+) spill to
    # disk instead of dying at the in-memory ceiling. Resource config
    # only — comparator semantics stay driver-strict.
    # GRAFT_DUCKDB_SPILL lets parallel gate workers (gate_batch.py
    # sharded across processes) give each DuckDB its OWN spill dir —
    # a shared one would be rmtree'd between queries by a sibling
    # worker mid-spill.
    # env values are interpolated into SQL SET statements — escape
    # single quotes so an odd (operator-controlled) value breaks the
    # setting, not the statement (round-10 advisory)
    spill_sql = spill_raw.replace("'", "''")
    con.execute(f"SET temp_directory='{spill_sql}'")
    # overridable for phases that share the box with a live Spark JVM
    # (parallel gate workers + a Verify/Bench run): 90GB × N workers
    # would invite the OOM killer; resource config only, semantics
    # stay driver-strict.
    mem_limit = os.environ.get(
        "GRAFT_DUCKDB_MEMLIMIT", "90GB").replace("'", "''")
    con.execute(f"SET memory_limit='{mem_limit}'")
    # optional thread cap for gate runs sharing the box with a live
    # Spark JVM or an A/B bench (resource config only)
    thr = os.environ.get("GRAFT_DUCKDB_THREADS", "").strip()
    if thr.isdigit() and int(thr) > 0:
        con.execute(f"SET threads={int(thr)}")
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
        if staged or stream:
            # provenance: this record came from the chunked-replay /
            # stream-comparator path, not the default fused pipeline
            results[name]["mode"] = "+".join(
                m for m, on in (("staged", staged), ("stream", stream)) if on)

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
            cur = (exec_staged(con, name, oracle[name]) if staged
                   else con.execute(oracle[name]))
            if stream:
                import pyarrow.parquet as pq
                rb = cur.fetch_record_batch(131072)
                # schema-level column + dtype-class gate (stream mode
                # never materializes a frame; note this misses pandas'
                # int->float64 promotion on null-bearing columns, so
                # --stream is only for null-free PK-ordered outputs)
                s_emp = pq.ParquetFile(files[0]) \
                    .schema_arrow.empty_table().to_pandas()
                o_emp = rb.schema.empty_table().to_pandas()
                if sorted(s_emp.columns) != sorted(o_emp.columns):
                    print(f"FAIL {name}: columns "
                          f"spark={sorted(s_emp.columns)} "
                          f"oracle={sorted(o_emp.columns)}")
                    rec(name, False, False, False, 0, None)
                    n_fail += 1
                    continue
                sd2, od2 = dict(s_emp.dtypes), dict(o_emp.dtypes)
                dt_bad = [c for c in sd2
                          if dtype_class(sd2[c]) != dtype_class(od2[c])]
                if dt_bad:
                    detail = ", ".join(
                        f"{c}: spark={sd2[c]} oracle={od2[c]}"
                        for c in dt_bad)
                    print(f"FAIL {name}: dtype mismatch ({detail})")
                    rec(name, True, False, False, 0, None)
                    n_fail += 1
                    continue
                ns, no, diff = stream_compare(files, rb)
                if diff is not None:
                    i, a, b = diff
                    print(f"FAIL {name}: stream diff @{i} "
                          f"(rows spark={ns} oracle={no})")
                    print(f"  spark : {a}")
                    print(f"  oracle: {b}")
                    rec(name, ns == no, True, False, ns, None)
                    n_fail += 1
                else:
                    print(f"PASS {name} ({ns} rows, stream)")
                    rec(name, True, True, True, ns, None)
                    n_pass += 1
                continue
            sdf = pd.read_parquet(files if len(files) > 1 else files[0])
            odf = cur.df()
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
