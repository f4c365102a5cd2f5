package graft.ops

import org.apache.spark.sql.functions._
import graft.io.Tables

/** SURVEY §2 — iterative graph traversal, oracle-checked against DuckDB's
  * `WITH RECURSIVE`. The declared query builds a real graph from the
  * fixture (suppliers co-supplying the same order within one week) and
  * runs a bounded BFS — the one operator class whose Spark form is a
  * driver-coordinated LOOP of joins rather than a single plan, so the
  * oracle gate proving it equals the recursive-SQL semantics is worth
  * more than any unit test.
  */
object GraphOps extends OpGroup {

  def qs: Seq[Q] = Seq(
    Q(
      // Co-supply reachability: edges link suppliers appearing in the
      // same order (orders of one week), BFS from supplier 1, ≤4 hops,
      // min hop distance per reached supplier. The co-occurrence
      // self-join is on l_orderkey (bounded per-order fanout — TPC-H
      // orders have ≤7 lineitems; a 100 TB corpus with hub keys would
      // cap or salt the fanout exactly like Dedup's hot-shingle cap);
      // the BFS joins hash on src each hop (api.Graph scale notes).
      "q_graph_reachability",
      (s, d) => {
        val wk = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1997-01-01") &&
                  col("o_orderdate") < lit("1997-01-08"))
          .select(col("o_orderkey"))
        val ls = Tables.lineitem(s, d)
          .join(wk, col("l_orderkey") === col("o_orderkey"), "left_semi")
          .select(col("l_orderkey"), col("l_suppkey")).distinct()
        val e = ls.alias("a")
          .join(ls.alias("b"), col("a.l_orderkey") === col("b.l_orderkey"))
          .filter(col("a.l_suppkey") =!= col("b.l_suppkey"))
          .select(col("a.l_suppkey").as("src"),
                  col("b.l_suppkey").as("dst"))
          .distinct()
        graft.api.Graph.shortestHops(s, e, source = 1L, maxHops = 4)
          .select(col("node"), col("dist"))
          .orderBy(col("dist"), col("node"))
      },
      """WITH RECURSIVE ls AS (
        |  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
        |  WHERE l_orderkey IN (
        |    SELECT o_orderkey FROM orders
        |    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |      AND o_orderdate <  TIMESTAMP '1997-01-08')),
        |e AS (
        |  SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
        |  FROM ls a JOIN ls b USING (l_orderkey)
        |  WHERE a.l_suppkey <> b.l_suppkey),
        |bfs(node, d) AS (
        |  SELECT CAST(1 AS BIGINT) AS node, 0 AS d
        |  UNION
        |  SELECT e.dst, bfs.d + 1
        |  FROM bfs JOIN e ON e.src = bfs.node WHERE bfs.d < 4)
        |SELECT node, min(d) AS dist
        |FROM bfs GROUP BY node
        |ORDER BY dist, node""".stripMargin)
  )
}
