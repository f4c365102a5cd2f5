package graft

import org.scalacheck.{Arbitrary, Gen}
import org.scalacheck.rng.Seed

/** Property-based lossless-roundtrip tests (SURVEY §5.2.1) — the
  * faithful-port core. The reference's test suite asserts
  * msg2sql→sql2msg == original for nested/array/time-bearing messages;
  * here the equivalent is Dataset[T] → parquet → Dataset[T], including
  * ns-exact stamps (which TimestampType could NOT carry — SURVEY §1.4)
  * and uint8[] payloads as BinaryType. */
case class HeaderLike(seq: Long, stamp: Stamp, frameId: String)
case class SampleMsg(
    header: HeaderLike,
    pose: Pose,
    name: String,
    flags: Seq[Boolean],
    ranges: Seq[Float],
    payload: Array[Byte]) {
  // Array[Byte] equality is reference-based; normalize for the test
  override def equals(o: Any): Boolean = o match {
    case m: SampleMsg =>
      header == m.header && pose == m.pose && name == m.name &&
      flags == m.flags && ranges == m.ranges &&
      java.util.Arrays.equals(payload, m.payload)
    case _ => false
  }
  override def hashCode(): Int = header.hashCode
}

class RoundtripSpec extends SparkSpec {
  import spark.implicits._

  private val genStamp = for {
    secs <- Gen.chooseNum(0L, 4102444800L)
    nanos <- Gen.chooseNum(0L, 999999999L) // full ns range — lossless
  } yield Stamp(secs, nanos)

  private val genMsg = for {
    seq <- Gen.chooseNum(0L, Long.MaxValue)
    stamp <- genStamp
    frame <- Gen.alphaNumStr.map(_.take(20))
    pstamp <- genStamp
    x <- Gen.chooseNum(-1e6, 1e6); y <- Gen.chooseNum(-1e6, 1e6)
    z <- Gen.chooseNum(-1e6, 1e6)
    name <- Gen.alphaNumStr.map(_.take(30))
    flags <- Gen.listOfN(5, Arbitrary.arbBool.arbitrary)
    ranges <- Gen.listOfN(8, Gen.chooseNum(-1000f, 1000f))
    payload <- Gen.listOfN(16, Arbitrary.arbByte.arbitrary).map(_.toArray)
  } yield SampleMsg(HeaderLike(seq, stamp, frame), Pose(x, y, z, pstamp),
                    name, flags, ranges, payload)

  test("Dataset[T] -> parquet -> as[T] is lossless (msg2sql/sql2msg analog)") {
    // scalacheck generators sampled with fixed seeds (no scalatest bridge
    // in the build) — 5 generated batches of 20 messages each
    for (seed <- 1L to 5L) {
      val msgs = Gen.listOfN(20, genMsg)
        .apply(Gen.Parameters.default, Seed(seed))
        .getOrElse(fail(s"generator exhausted at seed $seed"))
      val dir = tmpDir("rt") + "/msgs"
      msgs.toDS().write.mode("overwrite").parquet(dir)
      val back = spark.read.parquet(dir).as[SampleMsg].collect()
      // generators hit edge values (seq=0/1/Max) often — sort by a key
      // that is unique with overwhelming probability for the compare
      def key(m: SampleMsg) = (m.header.seq, m.name, m.header.frameId)
      assert(back.sortBy(key).toSeq == msgs.sortBy(key))
    }
  }

  test("normalizeUrl is idempotent; tracking variants converge (property)") {
    import org.apache.spark.sql.functions.col
    // generated URLs: mixed-case scheme/host, path segments, params in
    // random order with tracking params interleaved at any position
    val genParam = Gen.oneOf(
      Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(5))
        .map(k => s"$k=1"),
      Gen.oneOf("utm_source=x", "utm_campaign=abc", "ref=home",
                "utm_x_1=z"))
    val genUrl = for {
      scheme <- Gen.oneOf("http", "HTTPS", "Ftp")
      host <- Gen.oneOf("Ex.COM", "a.b.c", "WWW.Site.Org")
      path <- Gen.listOfN(2, Gen.oneOf(
          Gen.alphaNumStr.map(_.take(4)), Gen.const("AT&T"),
          Gen.const("a&ref=x"), Gen.const("utm_a=1")))
        .map(_.mkString("/"))
      params <- Gen.listOf(genParam).map(_.take(6))
    } yield {
      val q = if (params.isEmpty) "" else params.mkString("?", "&", "")
      s"$scheme://$host/$path$q"
    }
    for (seed <- 1L to 5L) {
      val urls = Gen.listOfN(40, genUrl)
        .apply(Gen.Parameters.default, Seed(seed))
        .getOrElse(fail(s"generator exhausted at seed $seed"))
      val once = urls.toDF("u")
        .select(graft.api.Text.normalizeUrl(col("u")).as("n"))
      val twice = once.select(graft.api.Text.normalizeUrl(col("n")).as("n2"))
        .as[String].collect().toSeq
      val first = once.as[String].collect().toSeq
      assert(first == twice, "normalizeUrl is not idempotent")
      // no tracking param survives IN THE QUERY (path segments that
      // merely look like one must be untouched); separators repaired
      first.foreach { n =>
        val q = n.dropWhile(_ != '?')
        assert(!q.contains("utm_") && !q.matches(".*[?&]ref=.*"), n)
        assert(!n.contains("?&") && !n.endsWith("&") && !n.endsWith("?"), n)
        assert(n.count(_ == '?') <= 1, n)
      }
      // a URL and its tracking-decorated twin normalize identically
      val decorated = urls.map { u =>
        if (u.contains("?")) u + "&utm_source=zz" else u + "?utm_source=zz"
      }
      val normDecorated = decorated.toDF("u")
        .select(graft.api.Text.normalizeUrl(col("u")).as("n"))
        .as[String].collect().toSeq
      assert(first == normDecorated, "tracking twin diverged")
    }
  }

  test("bandedRangeJoin equals the naive range join on random data (property)") {
    import org.apache.spark.sql.functions.col
    // random keys/timestamps cluster near bucket edges on purpose
    // (small ts range vs W) — the regime where an off-by-one in the
    // band math would show
    val genRow = for {
      k <- Gen.oneOf("u", "v", "w")
      ts <- Gen.chooseNum(0L, 400L)
    } yield (k, ts)
    for (seed <- 1L to 5L) {
      val rows = Gen.listOfN(60, genRow)
        .apply(Gen.Parameters.default, Seed(seed))
        .getOrElse(fail(s"generator exhausted at seed $seed"))
        .zipWithIndex.map { case ((k, ts), i) => (i.toLong, k, ts) }
      val w = 1L + seed * 13 // varied, deliberately not a divisor of 400
      val a = rows.toDF("a_id", "ka", "a_us")
      val b = rows.map { case (i, k, ts) => (i + 1000L, k, ts) }
        .toDF("b_id", "kb", "b_us")
      val naive = a.join(b, col("ka") === col("kb") &&
          col("b_us") > col("a_us") && col("b_us") <= col("a_us") + w)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      val banded = graft.api.Events.bandedRangeJoin(
          a, b, col("ka"), col("kb"), col("a_us"), col("b_us"), w)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      assert(banded == naive,
        s"seed=$seed W=$w: banded diverged (missing=" +
        s"${naive -- banded}, extra=${banded -- naive})")
    }
  }

  test("intRatio4 equals BigDecimal HALF_UP on random ratios (property)") {
    import org.apache.spark.sql.functions.{col, lit}
    val genPair = for {
      num <- Gen.chooseNum(-3000000L, 3000000L)
      den <- Gen.chooseNum(1L, 5000L)
    } yield (num, den)
    for (seed <- 1L to 5L) {
      val pairs = Gen.listOfN(200, genPair)
        .apply(Gen.Parameters.default, Seed(seed))
        .getOrElse(fail(s"generator exhausted at seed $seed"))
      val got = pairs.toDF("num", "den")
        .select(col("num"), col("den"),
                graft.Determinism.intRatio4(col("num"), col("den"))
                  .as("r"))
        .as[(Long, Long, Double)].collect()
      got.foreach { case (num, den, r) =>
        val want = new java.math.BigDecimal(num)
          .divide(new java.math.BigDecimal(den), 0,
                  java.math.RoundingMode.HALF_UP)
          .doubleValue() / 10000.0
        assert(r == want, s"intRatio4($num, $den) = $r, want $want")
      }
    }
  }

  test("ns stamps survive where TimestampType would truncate") {
    val m = Stamp(1700000000L, 123456789L)
    val dir = tmpDir("ns") + "/s"
    Seq(m).toDS().write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).as[Stamp].head()
    assert(back.nanos == 123456789L) // µs TimestampType keeps only 123456xxx
  }
}
