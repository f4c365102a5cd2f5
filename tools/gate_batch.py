#!/usr/bin/env python3
"""Per-query driver for the big-SF oracle gate (round 9).

Runs tools/compare.py ONE QUERY PER PROCESS so a DuckDB twin that
spills without bound (e.g. an all-pairs CTE at 100x) can be killed by
timeout without losing the batch, and the spill dir is wiped between
queries. Results accumulate as JSON lines in --log; queries already in
the log are skipped, so the driver is resumable.

Usage:
  python3 tools/gate_batch.py <sfDir> <verifyOut> --log <file>
      [--queries a,b,c] [--timeout SECONDS] [--jsonl <file>]

With --jsonl, each per-query compare appends its full record (rows/
schema/hash match) to the given JSON-lines file; killed queries get a
record with err=TIMEOUT/SPILL_KILL. tools/assemble_gate.py merges the
lines into a CORRECTNESS_* artifact with a mechanical git stamp.
"""
import sys, json, os, shutil, subprocess, tempfile, time

def main():
    sf, out = sys.argv[1], sys.argv[2]
    log_path = None
    queries = None
    jsonl = None
    timeout = 900
    staged_qs = set()
    stream_qs = set()
    args = sys.argv[3:]
    while args:
        a = args.pop(0)
        if a == "--log":
            log_path = args.pop(0)
        elif a == "--queries":
            queries = [q for q in args.pop(0).split(",") if q]
        elif a == "--timeout":
            timeout = int(args.pop(0))
        elif a == "--jsonl":
            jsonl = args.pop(0)
        elif a == "--staged-queries":
            # run these twins through compare.py --staged (chunked
            # CTE-by-CTE replay in a disk-backed DuckDB — the CC-walk
            # family whose fused plan exhausts spill at 100×)
            staged_qs = {q for q in args.pop(0).split(",") if q}
        elif a == "--stream-queries":
            # run these through compare.py --stream (ordered stream
            # compare; only for totally-ORDER-BY'd outputs)
            stream_qs = {q for q in args.pop(0).split(",") if q}
        else:
            sys.exit(f"unknown arg {a}")
    assert log_path, "--log required"
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    if queries is None:
        queries = sorted(oracle)
    done = set()
    if os.path.exists(log_path):
        for line in open(log_path):
            try:
                done.add(json.loads(line)["query"])
            except Exception:
                pass
    here = os.path.dirname(os.path.abspath(__file__))
    # each gate_batch process owns ONE spill dir (overridable so
    # parallel sharded workers don't rmtree each other's mid-spill);
    # it is passed down to compare.py via the same env var.
    spill_dir = os.environ.get("GRAFT_DUCKDB_SPILL", "/tmp/duckdb_spill")
    env = {**os.environ, "GRAFT_DUCKDB_SPILL": spill_dir}
    with open(log_path, "a") as log:
        for q in queries:
            if q in done:
                continue
            shutil.rmtree(spill_dir, ignore_errors=True)
            t0 = time.time()
            # child output goes to a temp FILE, not a PIPE: a twin that
            # prints verbose failure rows can fill a 64 KiB pipe buffer
            # and block forever, which the watchdog would then mislabel
            # as TIMEOUT (round-10 advisory)
            tf = tempfile.TemporaryFile(mode="w+")
            cmd = [sys.executable, os.path.join(here, "compare.py"),
                   sf, out, "--only", q]
            if q in staged_qs:
                cmd += ["--staged"]
            if q in stream_qs:
                cmd += ["--stream"]
            if jsonl:
                cmd += ["--jsonl", jsonl]
            p = subprocess.Popen(
                cmd, stdout=tf, stderr=subprocess.STDOUT, text=True,
                env=env)
            # watchdog: timeout OR unbounded spill (a twin that wrote
            # SPILL_CAP_GB of temp is not going to finish inside the
            # budget; kill it before it takes the box's disk down)
            SPILL_CAP_GB = int(os.environ.get("GRAFT_SPILL_CAP_GB", "35"))
            status = None
            while True:
                rc = p.poll()
                if rc is not None:
                    break
                if time.time() - t0 > timeout:
                    p.kill()
                    status = "TIMEOUT"
                    break
                spill = 0
                try:
                    with os.scandir(spill_dir) as it:
                        spill = sum(e.stat().st_size for e in it
                                    if e.is_file())
                except FileNotFoundError:
                    pass
                if spill > SPILL_CAP_GB * (1 << 30):
                    p.kill()
                    status = "SPILL_KILL"
                    break
                time.sleep(5)
            p.wait()
            tf.seek(0)
            out_txt = tf.read()
            tf.close()
            took = round(time.time() - t0, 1)
            if status is None:
                ok = p.returncode == 0
                tail = (out_txt.strip().splitlines() or ["?"])[-2:]
                rec = {"query": q, "status": "PASS" if ok else "FAIL",
                       "seconds": took, "detail": " | ".join(tail)}
            else:
                rec = {"query": q, "status": status, "seconds": took,
                       "detail": f"killed ({status.lower()})"}
                if jsonl:
                    # the killed twin never reached compare.py's own
                    # writer — record the failure so the assembled
                    # artifact counts it instead of omitting it
                    with open(jsonl, "a") as jf:
                        jf.write(json.dumps({
                            "query": q, "rows_match": False,
                            "schema_match": False, "hash_match": False,
                            "rows": 0,
                            "err": f"oracle {status.lower()} after "
                                   f"{took}s"}) + "\n")
            shutil.rmtree(spill_dir, ignore_errors=True)
            log.write(json.dumps(rec) + "\n")
            log.flush()
            print(f"[gate] {rec['status']} {q} ({rec['seconds']}s)",
                  flush=True)

if __name__ == "__main__":
    main()
