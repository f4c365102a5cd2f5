package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Public, parameterized deduplication API — the reusable forms of the
  * `q_dedup_*` operators (which delegate here, so the DuckDB oracle
  * gate verifies this code). Every operator is bucketed/pruned: nothing
  * is ever O(n²) in the corpus size.
  *
  * Portability note: hashing is md5-derived so an external engine can
  * reproduce results byte-for-byte; a production 100 TB deployment
  * would swap xxhash64 into `slotHash` once cross-engine verification
  * is retired (one-line change, same plan shapes).
  */
object Dedup {

  /** Exact dedup groups on arbitrary keys: one hash-aggregate (map-side
    * partials), deterministic keep-min representative — unlike
    * `dropDuplicates`, which keeps an arbitrary row. */
  def exactGroups(df: DataFrame, keys: Seq[Column], id: Column): DataFrame =
    df.groupBy(keys: _*)
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Word n-gram shingle array (distinct, map-side) of a text column —
    * the ONE definition of "shared n-gram" for minhash, jaccard, and
    * contamination (a drift here would make dedup and decontamination
    * disagree); callers must pair it with the explode_outer + null
    * filter generator discipline (SCALE.md pathology #1). */
  private[api] def shingleExpr(n: Int): String = {
    val parts = (0 until n).map(j => s"w[i+$j]").mkString(", ")
    s"array_distinct(transform(sequence(0, size(w) - $n), i -> " +
      s"concat_ws(' ', $parts)))"
  }

  /** MinHash/LSH near-duplicate candidate pairs: 16 hash slots (four
    * md5s per shingle, sliced into 8-hex windows), pairs agreeing on at
    * least `minMatch` slot-minima are emitted as
    * (doc_a, doc_b, n_match) with doc_a < doc_b.
    *
    * Plan shape (measured, SCALE.md): shingling is map-side
    * (`array_distinct` per row); signatures come from ONE explode +
    * hash-agg with partial min (nested array lambdas measured 8×
    * slower — interpreted, not codegen'd); explode_outer + null filter
    * keeps InferFiltersFromGenerate from inlining the shingle
    * expression into the scan filter 3× (measured 10×); the four
    * window-minima aggregate per (doc, j) BEFORE stack() fans out slot
    * rows; candidates come from an equi-join on (slot, min) buckets —
    * LSH banding, never an all-pairs comparison. */
  def minhashPairs(
      df: DataFrame, id: Column, text: Column,
      shingle: Int = 3, minMatch: Int = 8): DataFrame = {
    val sig = df
      .select(id.as("doc_id"), split(text, " ").as("w"))
      .filter(size(col("w")) >= shingle)
      .select(col("doc_id"),
              explode_outer(expr(shingleExpr(shingle))).as("s"))
      .filter(col("s").isNotNull)
      .select(col("doc_id"), col("s"),
              explode(expr("sequence(0, 3)")).as("j"))
      .select(col("doc_id"), col("j"),
              md5(concat(col("s"), lit("#"), col("j").cast("string")))
                .as("h"))
      .groupBy(col("doc_id"), col("j"))
      .agg(min(substring(col("h"), 1, 8)).as("m0"),
           min(substring(col("h"), 9, 8)).as("m1"),
           min(substring(col("h"), 17, 8)).as("m2"),
           min(substring(col("h"), 25, 8)).as("m3"))
      .select(col("doc_id"), expr(
        "stack(4, j * 4, m0, j * 4 + 1, m1, j * 4 + 2, m2," +
        " j * 4 + 3, m3) AS (k, mh)"))
    val a = sig.select(col("doc_id").as("doc_a"), col("k"), col("mh"))
    val b = sig.select(col("doc_id").as("doc_b"),
                       col("k").as("k2"), col("mh").as("mh2"))
    a.join(b, col("k") === col("k2") && col("mh") === col("mh2") &&
              col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_match"))
      .filter(col("n_match") >= minMatch)
  }

  /** Connected components over an undirected edge list (a, b) →
    * (doc, root) with root = min member id. Pregel-style min-label
    * propagation to fixpoint: each iteration is one distributed
    * join + aggregate, lineage truncated per step via localCheckpoint;
    * convergence reads off the checkpointed result (no extra join).
    * O(diameter) rounds — near-dup graphs are shallow. */
  def connectedComponents(
      pairs: DataFrame, a: String, b: String): DataFrame = {
    val p = pairs.select(col(a).as("doc_a"), col(b).as("doc_b"))
      .localCheckpoint()
    val edges = p.union(
      p.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
    var labels = edges.select(col("doc_a").as("doc")).distinct()
      .withColumn("root", col("doc")).localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      val prop = edges
        .join(labels, col("doc_a") === col("doc"))
        .groupBy(col("doc_b").as("doc2"))
        .agg(min(col("root")).as("nroot"))
      val next = labels
        .join(prop, col("doc") === col("doc2"), "left")
        .select(col("doc"),
                least(col("root"), coalesce(col("nroot"), col("root")))
                  .as("root"),
                col("root").as("old"))
        .localCheckpoint()
      changed = next.filter(col("root") =!= col("old")).count()
      labels = next.select(col("doc"), col("root"))
    }
    labels
  }

  /** Per-document SimHash signature as a `bits`-char '0'/'1' string
    * (bits ≤ 32): bit k = majority vote over the doc's distinct tokens
    * of parity(hex digit k of md5(token)). Embarrassingly parallel —
    * one array fold per row, no shuffle. */
  def simhashSignature(
      df: DataFrame, id: Column, text: Column, bits: Int = 32): DataFrame = {
    require(bits >= 1 && bits <= 32, "md5 provides 32 hex digits")
    df.select(id.as("doc_id"), text.as("_t"))
      .select(col("doc_id"),
              expr("transform(array_distinct(split(_t, ' ')), t -> md5(t))")
                .as("hs"))
      .select(col("doc_id"),
              expr(
                s"""concat_ws('', transform(
                  |  aggregate(hs, array_repeat(0, $bits),
                  |    (acc, h) -> zip_with(acc, sequence(1, $bits),
                  |      (a, k) -> a + CASE WHEN
                  |        (instr('0123456789abcdef', substring(h, k, 1)) - 1) % 2 = 1
                  |        THEN 1 ELSE -1 END)),
                  |  x -> CASE WHEN x > 0 THEN '1' ELSE '0' END))""".stripMargin)
                .as("sig"))
  }

  /** Per-document 32-bit SimHash signature as a BIGINT (bit k set iff
    * the majority vote for hex digit k+1's parity is positive — same
    * votes as simhashSignature, packed). Integer-exact, map-side. */
  def simhashSig32(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("doc_id"), text.as("_t"))
      .select(col("doc_id"),
              expr("transform(array_distinct(split(_t, ' ')), t -> md5(t))")
                .as("hs"))
      .select(col("doc_id"),
              expr(
                """aggregate(
                  |  zip_with(
                  |    aggregate(hs, array_repeat(0, 32),
                  |      (acc, h) -> zip_with(acc, sequence(1, 32),
                  |        (a, k) -> a + CASE WHEN
                  |          (instr('0123456789abcdef', substring(h, k, 1)) - 1) % 2 = 1
                  |          THEN 1 ELSE -1 END)),
                  |    sequence(0, 31),
                  |    (v, k) -> CASE WHEN v > 0 THEN shiftleft(1L, k) ELSE 0L END),
                  |  0L, (acc, x) -> acc + x)""".stripMargin)
                .as("sig"))

  /** SimHash near-duplicate pairs within `maxHamming` bit flips,
    * via BYTE BANDING (the pigeonhole trick): signatures within
    * Hamming ≤ 3 must agree on at least one of the four 8-bit bands,
    * so candidates come from an equi-join on (band index, band value) —
    * never an all-pairs scan — and `bit_count(a XOR b)` (codegen'd
    * integer built-in) confirms exactly. Returns
    * (doc_a, doc_b, hamming), doc_a < doc_b. */
  def simhashHammingPairs(
      df: DataFrame, id: Column, text: Column,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      "4-band pigeonhole only guarantees recall for maxHamming <= 3")
    val sig = simhashSig32(df, id, text)
    val bands = sig.select(col("doc_id"), col("sig"),
        explode(expr("sequence(0, 3)")).as("b"))
      .withColumn("bv", expr("(sig div shiftleft(1L, 8 * b)) % 256"))
    val a = bands.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"),
                         col("b"), col("bv"))
    val bb = bands.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"),
                          col("b").as("b2"), col("bv").as("bv2"))
    // confirm with bit_count IN THE JOIN STAGE, before the pair-dedup
    // groupBy: when band selectivity degrades (saturated signature
    // space), the candidate fan-out is large, and filtering map-side
    // means only true near-dup pairs ever shuffle (measured 2× at
    // sf0.1 vs grouping all candidates first)
    a.join(bb.hint("MERGE"),
           col("b") === col("b2") && col("bv") === col("bv2") &&
           col("doc_a") < col("doc_b"))
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(min(col("hamming")).as("hamming"))
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** N-gram Jaccard near-duplicate pairs via the inverted-index join:
    * only docs sharing an n-gram ever meet. Returns
    * (doc_a, doc_b, inter, jac) for round(J, 4) ≥ minJaccard.
    * `|doc|` rides along as a column so no separate sizes table is
    * joined (the naive formulation planned 7 exchanges); the MERGE hint
    * stops AQE from broadcasting a multi-million-row self-join side
    * (measured 5×). n is the selectivity dial — small vocabularies need
    * wider shingles (see q_dedup_ngram_jaccard notes). */
  def jaccardPairs(
      df: DataFrame, id: Column, text: Column,
      n: Int = 7, minJaccard: Double = 0.2): DataFrame = {
    val sh = df
      .select(id.as("doc_id"), split(text, " ").as("w"))
      .filter(size(col("w")) >= n)
      .withColumn("gs", expr(shingleExpr(n)))
      .select(col("doc_id"), size(col("gs")).as("sz"),
              explode_outer(col("gs")).as("g"))
      .filter(col("g").isNotNull)
    val a = sh.select(col("doc_id").as("doc_a"), col("sz").as("sz_a"),
                      col("g"))
    val b = sh.select(col("doc_id").as("doc_b"), col("sz").as("sz_b"),
                      col("g").as("g2"))
    a.join(b.hint("MERGE"),
           col("g") === col("g2") && col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"),
           max(col("sz_a")).as("sz_a"), max(col("sz_b")).as("sz_b"))
      .withColumn("jac", round(col("inter").cast("double") /
        (col("sz_a") + col("sz_b") - col("inter")), 4))
      .filter(col("jac") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("jac"))
  }
}
