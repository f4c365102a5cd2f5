"""Hand-derived chunked oracle replays for twins whose DuckDB plan is
resource-infeasible at sf10 even when staged CTE-by-CTE (compare.py
--staged). Each entry carries the md5 of the EXACT oracle SQL it
replays — exec_staged refuses to use a replay whose source oracle has
drifted, so a stale replay can never silently gate a changed query.

Every replay must be algebraically equivalent to its oracle, with the
derivation written next to it; the comparator downstream stays
driver-strict either way (the replay only changes HOW DuckDB computes
the oracle relation, never what is compared).
"""

# q_dedup_simhash_hamming — derivation:
#   original: pairs = GROUP BY (doc_a, doc_b) over the 8-bit-band
#   collision self-join, keeping MIN(a.sig)/MIN(b.sig); final filters
#   hamming(sig_a, sig_b) <= 3. At 500k docs a band value is only 8
#   bits -> ~2k docs per bucket -> ~2e9 pair-slot rows into the
#   GROUP BY with ~1e9+ distinct groups: that aggregation state is the
#   measured >45 GB spill (the matches are candidate pairs, nearly all
#   of which the hamming filter then discards).
#   equivalences used:
#     (1) `sig` has exactly one row per doc_id, so MIN(a.sig) = a.sig:
#         the GROUP BY is just DISTINCT over (doc_a, doc_b, sig_a,
#         sig_b).
#     (2) the hamming predicate is a pure function of the pair row, so
#         it commutes with DISTINCT: filtering each band's candidates
#         BEFORE the dedup keeps exactly the pairs the original keeps.
#   replay: stage `sig`; per band b in 0..3 insert the band's
#   collision pairs WITH the hamming filter pushed into the join
#   (join output streams through the filter, nothing quadratic is
#   materialized); DISTINCT the union; project + ORDER BY as the
#   original. Each band join builds a 500k-row hash table on the
#   8-bit band value — bounded memory by construction.
_HAMMING_SIG = """
CREATE OR REPLACE TEMP TABLE sig AS
WITH tok AS (
  SELECT doc_id,
    unnest(list_distinct(list_filter(string_split_regex(text, '[ \t\n\r\f\x0B]+'), w -> w <> ''))) AS t
  FROM documents),
h AS (SELECT doc_id, md5(t) AS h FROM tok),
b AS (
  SELECT doc_id, unnest(range(1, 33)) AS k,
    unnest(list_transform(range(1, 33), k ->
      CASE WHEN (instr('0123456789abcdef', substr(h, k, 1)) - 1) % 2 = 1
           THEN 1 ELSE -1 END)) AS v
  FROM h),
s AS (SELECT doc_id, k, SUM(v) AS sv FROM b GROUP BY doc_id, k)
SELECT doc_id,
  CAST(SUM(CASE WHEN sv > 0
                THEN (CAST(1 AS BIGINT) << (k - 1))
                ELSE 0 END) AS BIGINT) AS sig
FROM s GROUP BY doc_id
"""

_HAMMING_BAND = """
INSERT INTO cand
SELECT a.doc_id, b.doc_id, a.sig, b.sig
FROM sig a JOIN sig b
  ON ((a.sig >> {sh}) & 255) = ((b.sig >> {sh}) & 255)
 AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= 3
"""

REPLAYS = {
    "q_dedup_simhash_hamming": {
        "expect_md5": "e6b101baf0670f667359769a2378f67f",
        "stmts": [
            _HAMMING_SIG,
            "CREATE OR REPLACE TEMP TABLE cand ("
            "doc_a BIGINT, doc_b BIGINT, sig_a BIGINT, sig_b BIGINT)",
            _HAMMING_BAND.format(sh=0),
            _HAMMING_BAND.format(sh=8),
            _HAMMING_BAND.format(sh=16),
            _HAMMING_BAND.format(sh=24),
            """SELECT doc_a, doc_b,
  CAST(bit_count(xor(sig_a, sig_b)) AS INTEGER) AS hamming
FROM (SELECT DISTINCT doc_a, doc_b, sig_a, sig_b FROM cand)
ORDER BY doc_a, doc_b""",
        ],
    },
}
