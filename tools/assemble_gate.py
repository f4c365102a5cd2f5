#!/usr/bin/env python3
"""Merge a per-query gate JSONL (compare.py --jsonl, driven one query
per process by gate_batch.py) into a CORRECTNESS_*-style artifact with
the same MECHANICAL provenance stamp compare.py --artifact emits:
`git rev-parse HEAD` + clean/dirty marker + invocation/absent-query
accounting, so a partial sweep can never masquerade as a full gate.

Usage:
  python3 tools/assemble_gate.py <sfDir> <verifyOut> <jsonl> <artifact>
      [--note TEXT]

The LAST record per query wins (re-runs after a fix supersede the
earlier failure). Queries present in <verifyOut>/oracle_sql.json but
absent from the JSONL are listed in invocation.absent_queries and make
the artifact `partial: true` — they are never counted as passes.
"""
import sys, json, os, subprocess, datetime


def main():
    sf, out, jsonl, artifact = sys.argv[1:5]
    note = None
    args = sys.argv[5:]
    while args:
        a = args.pop(0)
        if a == "--note":
            note = args.pop(0)
        else:
            sys.exit(f"unknown arg {a}")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    results = {}
    for line in open(jsonl):
        line = line.strip()
        if not line:
            continue
        rec = json.loads(line)
        q = rec.pop("query")
        results[q] = rec
    unknown = sorted(q for q in results if q not in oracle)
    if unknown:
        sys.exit(f"JSONL has queries not in oracle_sql.json: {unknown}")
    n_pass = sum(1 for r in results.values()
                 if r["rows_match"] and r["schema_match"]
                 and r["hash_match"] and not r["err"])
    n_fail = len(results) - n_pass
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    commit = subprocess.run(["git", "-C", repo, "rev-parse", "HEAD"],
                            capture_output=True, text=True).stdout.strip()
    dirty = subprocess.run(
        ["git", "-C", repo, "status", "--porcelain", "--", "src", "tools"],
        capture_output=True, text=True).stdout.strip()
    stamp = (f"assembled from per-query gate log at commit {commit}"
             + (" (src/tools DIRTY at sweep time)" if dirty else " (clean)")
             + f" on {datetime.date.today().isoformat()}")
    absent = sorted(q for q in oracle if q not in results)
    body = {
        "sf_dir": sf,
        "note": ((note + " — ") if note else "") + stamp,
        "invocation": {
            "harness": "gate_batch.py one-query-per-process",
            "n_oracle_queries": len(oracle),
            "absent_queries": absent,
            "partial": bool(absent),
        },
        "n_pass": n_pass, "n_fail": n_fail,
        "queries": {q: results[q] for q in sorted(results)},
    }
    with open(artifact, "w") as f:
        json.dump(body, f, indent=1)
    print(f"artifact -> {artifact} [{stamp}] "
          f"{n_pass} pass / {n_fail} fail / {len(absent)} absent")


if __name__ == "__main__":
    main()
