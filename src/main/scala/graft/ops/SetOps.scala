package graft.ops

import org.apache.spark.sql.functions._
import graft.Determinism._
import graft.io.Tables

/** SURVEY §2.5 (sort / limit / top-k / set operations). */
object SetOps extends OpGroup {

  /** custkeys of AUTOMOBILE-segment customers. */
  private def setA(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.customer(s, d)
      .filter(col("c_mktsegment") === "AUTOMOBILE")
      .select(col("c_custkey"))

  /** custkeys holding at least one 'P'-status order. */
  private def setB(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.orders(s, d)
      .filter(col("o_orderstatus") === "P")
      .select(col("o_custkey").as("c_custkey"))

  private val sqlA = "SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'"
  private val sqlB = "SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'P'"

  /** Bag inputs with real multiplicities (>1 per key on BOTH sides —
    * setA/setB above are key-unique, which would make INTERSECT ALL
    * degenerate to INTERSECT): one row per order, keyed by customer. */
  private def bagA(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.orders(s, d)
      .filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("c_custkey"))

  private def bagB(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.orders(s, d)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select(col("o_custkey").as("c_custkey"))

  private val bagSqlA =
    "SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'"
  private val bagSqlB =
    "SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')"

  def qs: Seq[Q] = Seq(
    Q(
      "q_sort_multi_nulls",
      (s, d) => Tables.customer(s, d)
        .withColumn("seg_nn", expr("nullif(c_mktsegment, 'AUTOMOBILE')"))
        .select(col("c_custkey"), col("seg_nn"), col("c_acctbal"))
        .orderBy(asc_nulls_first("seg_nn"), desc("c_acctbal"),
                 asc("c_custkey")),
      """SELECT c_custkey, NULLIF(c_mktsegment, 'AUTOMOBILE') AS seg_nn, c_acctbal
        |FROM customer
        |ORDER BY seg_nn ASC NULLS FIRST, c_acctbal DESC, c_custkey ASC""".stripMargin),

    Q(
      "q_limit_offset",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"),
                date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"),
                moneyOut("o_totalprice").as("total"))
        .orderBy(col("odate"), col("o_orderkey"))
        .offset(10).limit(20),
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS odate,
        |  CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)), 2) AS DOUBLE) AS total
        |FROM orders ORDER BY odate, o_orderkey
        |LIMIT 20 OFFSET 10""".stripMargin),

    Q(
      // top-k: Spark compiles orderBy+limit to TakeOrderedAndProject —
      // no global sort, per-partition heaps + driver merge. The pattern
      // that actually scales to 100 TB.
      "q_topk",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(asMoney(sum(money("o_totalprice"))).as("revenue"))
        .orderBy(desc("revenue"), asc("c_custkey"))
        .limit(10),
      """SELECT c_custkey, c_name,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY revenue DESC, c_custkey ASC LIMIT 10""".stripMargin),

    Q(
      "q_set_union_distinct",
      (s, d) => setA(s, d).union(setB(s, d)).distinct()
        .orderBy(col("c_custkey")),
      s"$sqlA UNION $sqlB ORDER BY c_custkey"),

    Q(
      // bag semantics made hash-stable by counting multiplicity
      "q_set_union_all",
      (s, d) => setA(s, d).unionAll(setB(s, d))
        .groupBy(col("c_custkey")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("c_custkey")),
      s"""SELECT c_custkey, COUNT(*) AS cnt FROM ($sqlA UNION ALL $sqlB)
         |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin),

    Q(
      "q_set_intersect",
      (s, d) => setA(s, d).intersect(setB(s, d))
        .orderBy(col("c_custkey")),
      s"$sqlA INTERSECT $sqlB ORDER BY c_custkey"),

    Q(
      "q_set_except",
      (s, d) => setA(s, d).except(setB(s, d))
        .orderBy(col("c_custkey")),
      s"$sqlA EXCEPT $sqlB ORDER BY c_custkey"),

    Q(
      // TRUE bag intersection (multiplicity = min of the two sides,
      // standard SQL INTERSECT ALL) — distinct from q_set_intersect
      // because both inputs carry per-key multiplicities > 1. The
      // result multiset is made hash-stable by folding to
      // (key, multiplicity): Spark plans intersectAll as one
      // count-per-side aggregate + generate, shuffling only keyed
      // counts — never materializing duplicate rows wider than a key.
      "q_set_intersect_all",
      (s, d) => bagA(s, d).intersectAll(bagB(s, d))
        .groupBy(col("c_custkey")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("c_custkey")),
      s"""SELECT c_custkey, COUNT(*) AS cnt
         |FROM ($bagSqlA INTERSECT ALL $bagSqlB)
         |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin),

    Q(
      // bag difference (multiplicity = max(0, left - right)); same
      // hash-stabilizing fold to (key, multiplicity)
      "q_set_except_all",
      (s, d) => bagA(s, d).exceptAll(bagB(s, d))
        .groupBy(col("c_custkey")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("c_custkey")),
      s"""SELECT c_custkey, COUNT(*) AS cnt
         |FROM ($bagSqlA EXCEPT ALL $bagSqlB)
         |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)
  )
}
