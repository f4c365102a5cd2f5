package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Public, parameterized text-analysis API — the reusable forms of the
  * `q_text_*` / `q_fn_levenshtein` operators (which delegate here where
  * the shapes line up, so the oracle gate verifies this code). All
  * per-document transforms are map-side; corpus-level statistics come
  * from explode + hash-agg with small broadcast joins.
  */
object Text {

  /** Unigram-profile language identification: build top-`profileSize`
    * term profiles per known language from a labeled corpus, then
    * predict each doc's language as argmax(profile hits) over its
    * distinct tokens (tiebreak: language asc). Returns
    * (doc_id, predicted). The profile is tiny (langs × profileSize)
    * and broadcasts; docs with zero profile hits get no row (callers
    * left-join if they need "unknown"). */
  def languageId(
      df: DataFrame, id: Column, text: Column, lang: Column,
      profileSize: Int = 5): DataFrame = {
    val tokens = df.select(
      id.as("doc_id"), lang.as("lang"),
      explode(split(text, " ")).as("term"))
    val profile = tokens
      .groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang"))
          .orderBy(col("n").desc, col("term").asc)))
      .filter(col("rn") <= profileSize)
      .select(col("lang").as("p_lang"), col("term").as("p_term"))
    val hits = tokens.select(col("doc_id"), col("term")).distinct()
      .join(broadcast(profile), col("term") === col("p_term"))
      .groupBy(col("doc_id"), col("p_lang"))
      .agg(count(lit(1)).as("hits"))
    hits
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("hits").desc, col("p_lang").asc)))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("p_lang").as("predicted"))
  }

  /** Heuristic quality score in [0, 1]: length saturation (chars /
    * `saturation`), 1 − stopword ratio, and mean-word-length saturation,
    * blended 0.4/0.3/0.3. Integer counts flow through exactly-rounded
    * IEEE ops, so the score is engine-portable. Adds column `score`. */
  def qualityScore(
      df: DataFrame, text: Column, nChars: Column,
      stopwords: Seq[String] = Seq("the", "a"),
      saturation: Double = 500.0): DataFrame = {
    val w = split(text, " ")
    // foldLeft, not reduce: an empty stopword list is a legitimate
    // parameterization (score without the stopword term) and must not
    // throw at plan construction
    val isStop = (t: Column) =>
      stopwords.foldLeft(lit(false))((acc, s) => acc || t === s)
    df.withColumn("_chars", nChars.cast("double"))
      .withColumn("_ntok", size(w).cast("double"))
      .withColumn("_nstop", size(filter(w, isStop)).cast("double"))
      .withColumn("score",
        least(col("_chars") / saturation, lit(1.0)) * 0.4 +
        (lit(1.0) - col("_nstop") / col("_ntok")) * 0.3 +
        least((col("_chars") - col("_ntok") + 1.0) / col("_ntok") / 8.0,
              lit(1.0)) * 0.3)
      .drop("_chars", "_ntok", "_nstop")
  }

  /** Token accounting per row: whitespace token count (`n_ws`) and a
    * BPE-ish subword estimate (`n_bpe` = Σ ceil(len(word)/`charsPerTok`)
    * — the "~4 chars per token" rule used to size LLM corpora; integer
    * math, exactly portable). */
  def tokenCounts(
      df: DataFrame, text: Column, charsPerTok: Double = 4.0): DataFrame =
    df.withColumn("_w", split(text, " "))
      .withColumn("n_ws", size(col("_w")))
      .withColumn("n_bpe",
        aggregate(col("_w"), lit(0L),
          (acc, t) => acc + ceil(length(t) / lit(charsPerTok))))
      .drop("_w")

  /** Rolling-hash document fingerprint (md5-derived word values in
    * 0..255, position weights 31^(i mod 8), mod 2^31−1) — pure integer
    * math, identical in any engine. Equal fingerprints = exact (or
    * reordered-within-period) duplicate candidates. Adds column `fp`. */
  def fingerprint(df: DataFrame, text: Column): DataFrame =
    df.withColumn("_w", split(text, " "))
      .withColumn("fp",
        expr(
          """aggregate(
            |  zip_with(
            |    transform(_w, t ->
            |      (instr('0123456789abcdef', substring(md5(t), 1, 1)) - 1) * 16
            |    + (instr('0123456789abcdef', substring(md5(t), 2, 1)) - 1)),
            |    sequence(0, size(_w) - 1),
            |    (v, i) -> cast(v as bigint)
            |            * cast(pow(31D, cast(i % 8 as double)) as bigint)),
            |  0L, (acc, x) -> acc + x)""".stripMargin)
          % 2147483647L)
      .drop("_w")
}
