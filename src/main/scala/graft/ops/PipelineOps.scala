package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Determinism._
import graft.io.Tables

/** Training-data pipeline operators (SURVEY §2.6 extension): the
  * corpus-curation steps that sit between raw documents and a training
  * run — deterministic stratified sampling (data mixing), train/val/test
  * splitting, TF-IDF and BM25 relevance scoring, token-budget sequence
  * packing, and benchmark-contamination detection.
  *
  * Scale notes (100 TB):
  *  - sampling/splitting are pure map-side predicates on a content hash —
  *    no shuffle at all before the reporting aggregate, and the SAME doc
  *    always lands in the same split on any cluster size or rerun
  *    (md5-derived, not rand()).
  *  - tf-idf/bm25 are explode + hash-agg + broadcast of the tiny
  *    (term-level / scalar) statistics — never a per-doc-pair operation.
  *  - packing is one window per (lang) partition over pre-aggregated
  *    per-doc token counts — rows shuffled once, integer math.
  *  - contamination is a LEFT SEMI join against the benchmark shingle
  *    set: candidate docs never fan out into pairs, and the benchmark
  *    side (tiny) broadcasts.
  *
  * Determinism: sampling thresholds are integer compares on a 16-bit
  * hash slice (no floats); scores follow R3 (identical operand order,
  * round(…,4), rank on the ROUNDED value).
  */
object PipelineOps extends OpGroup {

  /** Uniform 16-bit hash of a column: first 4 hex digits of md5(str(c)).
    * Integer in [0, 65536) computed identically by both engines — the
    * portable replacement for rand()-based sampling. */
  private def u16Spark(c: String): Column = {
    def d(i: Int) =
      s"(instr('0123456789abcdef', substring(md5(cast($c as string)), $i, 1)) - 1)"
    expr(s"${d(1)} * 4096 + ${d(2)} * 256 + ${d(3)} * 16 + ${d(4)}")
  }

  private def u16Sql(c: String): String = {
    def d(i: Int) =
      s"(instr('0123456789abcdef', substr(md5(CAST($c AS VARCHAR)), $i, 1)) - 1)"
    s"${d(1)} * 4096 + ${d(2)} * 256 + ${d(3)} * 16 + ${d(4)}"
  }

  def qs: Seq[Q] = Seq(
    Q(
      // deterministic stratified sampling = data-mixing weights: keep
      // 25% of the dominant language, 75% of the rest, decided per doc
      // by an integer threshold on the content hash — replayable on any
      // cluster, no rand(), no shuffle before the reporting aggregate.
      "q_sample_stratified",
      (s, d) => Tables.documents(s, d)
        .select(col("lang"), u16Spark("doc_id").as("u"))
        .withColumn("thr",
          when(col("lang") === "en", 16384).otherwise(49152))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_total"),
             count(when(col("u") < col("thr"), 1)).as("n_kept"),
             r4(count(when(col("u") < col("thr"), 1)) / count(lit(1)))
               .as("pct_kept"))
        .orderBy(col("lang")),
      s"""WITH h AS (
        |  SELECT lang, ${u16Sql("doc_id")} AS u,
        |    CASE WHEN lang = 'en' THEN 16384 ELSE 49152 END AS thr
        |  FROM documents)
        |SELECT lang, COUNT(*) AS n_total,
        |  COUNT(CASE WHEN u < thr THEN 1 END) AS n_kept,
        |  round(CAST(COUNT(CASE WHEN u < thr THEN 1 END) AS DOUBLE)
        |        / COUNT(*), 4) AS pct_kept
        |FROM h GROUP BY lang ORDER BY lang""".stripMargin),

    Q(
      // hash-based train/val/test split (90/5/5): split id = content
      // hash mod 20 — docs never migrate between splits across reruns
      // or cluster sizes, the property rand()-splits lack.
      "q_split_train_holdout",
      (s, d) => Tables.documents(s, d)
        .select(col("lang"), col("doc_id"),
                (u16Spark("doc_id") % 20).as("m"))
        .withColumn("split",
          when(col("m") === 0, "test")
            .when(col("m") === 1, "val").otherwise("train"))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
        .orderBy(col("lang"), col("split")),
      s"""WITH h AS (
        |  SELECT lang, doc_id, (${u16Sql("doc_id")}) % 20 AS m
        |  FROM documents)
        |SELECT lang,
        |  CASE WHEN m = 0 THEN 'test'
        |       WHEN m = 1 THEN 'val' ELSE 'train' END AS split,
        |  COUNT(*) AS n_docs, MIN(doc_id) AS first_doc
        |FROM h GROUP BY lang, split ORDER BY lang, split""".stripMargin),

    Q(
      // corpus TF-IDF: top-3 terms per language by tf(lang,term) *
      // ln(N/df(term)). One explode, two hash-aggs, the scalar N and the
      // per-term df broadcast back — no per-doc-pair work anywhere.
      "q_text_tfidf",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val tokens = docs.select(
          col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("term"))
        val tf = tokens.groupBy(col("lang"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val df = tokens.select(col("doc_id"), col("term")).distinct()
          .groupBy(col("term")).agg(count(lit(1)).as("df"))
        val n = docs.agg(count(lit(1)).as("n_docs"))
        val scored = tf
          .join(broadcast(df), "term")
          .crossJoin(broadcast(n))
          .withColumn("score",
            r4(col("tf") * log(col("n_docs").cast("double") / col("df"))))
        val w = Window.partitionBy(col("lang"))
          .orderBy(col("score").desc, col("term").asc)
        scored.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("lang"), col("term"), col("tf"), col("df"),
                  col("score"), col("rn"))
          .orderBy(col("lang"), col("rn"))
      },
      """WITH tokens AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |tf AS (SELECT lang, term, COUNT(*) AS tf
        |       FROM tokens GROUP BY lang, term),
        |df AS (SELECT term, COUNT(*) AS df FROM
        |         (SELECT DISTINCT doc_id, term FROM tokens)
        |       GROUP BY term),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.lang, tf.term, tf.tf, df.df,
        |    round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 4) AS score
        |  FROM tf JOIN df USING (term) CROSS JOIN n),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY lang
        |             ORDER BY score DESC, term ASC) AS rn
        |  FROM scored)
        |SELECT lang, term, tf, df, score, rn FROM r WHERE rn <= 3
        |ORDER BY lang, rn""".stripMargin),

    Q(
      // BM25 (k1=1.2, b=0.75) retrieval scoring for a two-term query
      // over the corpus, top-10 docs. Same shape as tf-idf: per-doc tf
      // for the query terms only (explode + filter + hash-agg), per-term
      // df and the scalar (N, avgdl) broadcast back. R3: both engines
      // evaluate the identical expression tree, rank on round(…,4).
      "q_text_bm25",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("w"))
          .select(col("doc_id"), col("w"), size(col("w")).as("dl"))
        val stats = docs.agg(
          count(lit(1)).as("n_docs"),
          sum(col("dl")).as("sum_dl"))
        val qterms = Seq("spark", "query")
        val tf = docs
          .select(col("doc_id"), col("dl"),
                  explode(col("w")).as("term"))
          .filter(col("term").isin(qterms: _*))
          .groupBy(col("doc_id"), col("dl"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val scored = tf
          .join(broadcast(df), "term")
          .crossJoin(broadcast(stats))
          .withColumn("avgdl",
            col("sum_dl").cast("double") / col("n_docs"))
          .withColumn("idf",
            log(lit(1.0) + (col("n_docs") - col("df") + 0.5)
              / (col("df") + 0.5)))
          .withColumn("part",
            col("idf") * (col("tf") * 2.2)
              / (col("tf") + lit(1.2) *
                  (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
          .groupBy(col("doc_id"))
          .agg(r4(sum(col("part"))).as("score"))
        // global top-10 via orderBy+limit = TakeOrderedAndProject
        // (per-partition heaps + driver merge — no global sort, no
        // single-partition window)
        scored
          .select(col("doc_id"), col("score"))
          .orderBy(col("score").desc, col("doc_id").asc).limit(10)
      },
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS w,
        |    len(string_split(text, ' ')) AS dl
        |  FROM documents),
        |stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM d),
        |tf AS (
        |  SELECT doc_id, dl, term, COUNT(*) AS tf FROM
        |    (SELECT doc_id, dl, unnest(w) AS term FROM d)
        |  WHERE term IN ('spark', 'query')
        |  GROUP BY doc_id, dl, term),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |scored AS (
        |  SELECT tf.doc_id,
        |    round(SUM(
        |      ln(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
        |      * (tf.tf * 2.2)
        |      / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl
        |           / (CAST(stats.sum_dl AS DOUBLE) / stats.n_docs)))
        |    ), 4) AS score
        |  FROM tf JOIN df USING (term) CROSS JOIN stats
        |  GROUP BY tf.doc_id)
        |SELECT doc_id, score FROM scored
        |ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin),

    Q(
      // token-budget sequence packing (2048-token bins): docs stream
      // into bins in doc_id order per language; bin id = running-total
      // offset div budget — deterministic integer math, one window per
      // lang partition over per-doc token counts (NOT per-token rows).
      "q_pack_sequences",
      (s, d) => {
        val budget = 2048
        val toks = Tables.documents(s, d)
          .select(col("lang"), col("doc_id"),
                  size(split(col("text"), " ")).cast("bigint").as("tok"))
        val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        toks
          .withColumn("cum", sum(col("tok")).over(w))
          .withColumn("bin", expr(s"(cum - tok) div $budget"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
               sum(col("tok")).as("total_tokens"),
               (max(col("bin")) + 1).as("n_bins"),
               r4(sum(col("tok")) / ((max(col("bin")) + 1) * budget))
                 .as("fill_ratio"))
          .orderBy(col("lang"))
      },
      """WITH t AS (
        |  SELECT lang, doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
        |  FROM documents),
        |c AS (
        |  SELECT lang, tok,
        |    SUM(tok) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(tok) AS BIGINT) AS total_tokens,
        |  CAST(MAX((cum - tok) // 2048) + 1 AS BIGINT) AS n_bins,
        |  round(CAST(SUM(tok) AS DOUBLE)
        |        / ((MAX((cum - tok) // 2048) + 1) * 2048), 4) AS fill_ratio
        |FROM c GROUP BY lang ORDER BY lang""".stripMargin),

    Q(
      // benchmark-contamination detection: a doc is contaminated when it
      // shares any distinct word-7-gram with the held-out "benchmark"
      // set (source = 'src0' here). LEFT SEMI join against the benchmark
      // shingle set — candidates never fan out into pairs; the benchmark
      // side is tiny and broadcasts. 7-gram width = same selectivity
      // dial as q_dedup_ngram_jaccard (real decontamination runs use
      // 13-grams on web-scale docs).
      "q_contamination",
      (s, d) => {
        def shingles(src: org.apache.spark.sql.DataFrame) = src
          .select(col("doc_id"), col("lang"), col("source"),
                  split(col("text"), " ").as("w"))
          .filter(size(col("w")) >= 7)
          .select(col("doc_id"), col("lang"), col("source"),
                  explode_outer(expr(
                    "array_distinct(transform(sequence(0, size(w) - 7), i -> " +
                    "concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4]," +
                    " w[i+5], w[i+6])))")).as("g"))
          .filter(col("g").isNotNull)
        val all = shingles(Tables.documents(s, d))
        val bench = all.filter(col("source") === "src0").select(col("g"))
        val corpus = all.filter(col("source") =!= "src0")
        val contaminated = corpus
          .join(broadcast(bench), Seq("g"), "left_semi")
          .select(col("doc_id"), col("lang")).distinct()
        Tables.documents(s, d)
          .filter(col("source") =!= "src0")
          .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
          .join(contaminated.groupBy(col("lang"))
                  .agg(count(lit(1)).as("n_contaminated"),
                       min(col("doc_id")).as("first_doc")),
                Seq("lang"), "left")
          .select(col("lang"), col("n_docs"),
                  coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
                  coalesce(col("first_doc"), lit(-1L)).as("first_doc"))
          .orderBy(col("lang"))
      },
      """WITH tok AS (
        |  SELECT doc_id, lang, source, string_split(text, ' ') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, lang, source,
        |    concat(w[i+1], ' ', w[i+2], ' ', w[i+3], ' ', w[i+4], ' ',
        |           w[i+5], ' ', w[i+6], ' ', w[i+7]) AS g
        |  FROM (SELECT doc_id, lang, source, w,
        |          unnest(range(0, len(w) - 6)) AS i
        |        FROM tok WHERE len(w) >= 7)),
        |contaminated AS (
        |  SELECT DISTINCT c.doc_id, c.lang
        |  FROM sh c WHERE c.source <> 'src0'
        |    AND EXISTS (SELECT 1 FROM sh b
        |                WHERE b.source = 'src0' AND b.g = c.g)),
        |base AS (
        |  SELECT lang, COUNT(*) AS n_docs FROM documents
        |  WHERE source <> 'src0' GROUP BY lang),
        |hit AS (
        |  SELECT lang, COUNT(*) AS n_contaminated, MIN(doc_id) AS first_doc
        |  FROM contaminated GROUP BY lang)
        |SELECT base.lang, base.n_docs,
        |  COALESCE(hit.n_contaminated, 0) AS n_contaminated,
        |  COALESCE(hit.first_doc, -1) AS first_doc
        |FROM base LEFT JOIN hit ON base.lang = hit.lang
        |ORDER BY base.lang""".stripMargin)
  )
}
