package graft.ops

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Temporal.asofJoin]] / [[Temporal.rangeJoin]] vs brute-force oracles
  * computed in plain Scala over seeded random data — the same
  * check-the-plan-against-the-definition style as the dedup suites.
  */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(42)

  // (key, ts, id) left points; (key, ts, tag) right observations.
  private lazy val leftRows: Seq[(Long, Long, Long)] =
    (1L to 200L).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i))
  private lazy val rightRows: Seq[(Long, Long, String)] = {
    // distinct (key, ts) by construction — the operator's documented contract
    val seen = scala.collection.mutable.Set[(Long, Long)]()
    (1L to 150L).flatMap { i =>
      val kt = (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong)
      if (seen.add(kt)) Some((kt._1, kt._2, s"r$i")) else None
    }
  }

  private def leftDf: DataFrame = leftRows.toDF("k", "lts", "id")
  private def rightDf: DataFrame = rightRows.toDF("k", "rts", "tag")

  private def bruteAsof(strict: Boolean, tol: Option[Long]): Map[Long, Option[String]] =
    leftRows.map { case (k, lts, id) =>
      val cands = rightRows.filter { case (rk, rts, _) =>
        rk == k && (if (strict) rts < lts else rts <= lts) &&
          tol.forall(t => lts - rts <= t)
      }
      id -> (if (cands.isEmpty) None else Some(cands.maxBy(_._2)._3))
    }.toMap

  private def runAsof(strict: Boolean, tol: Option[Long]): Map[Long, Option[String]] =
    Temporal.asofJoin(leftDf, rightDf, Seq("k"), "lts", "rts", strict, tol)
      .select("id", "tag").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap

  test("asofJoin matches the brute-force definition (inclusive)") {
    assert(runAsof(strict = false, None) === bruteAsof(strict = false, None))
  }

  test("asofJoin strict excludes equal timestamps") {
    assert(runAsof(strict = true, None) === bruteAsof(strict = true, None))
    // the two modes genuinely differ on this data (equal-ts collisions exist)
    assert(bruteAsof(strict = false, None) !== bruteAsof(strict = true, None))
  }

  test("asofJoin tolerance nulls out stale matches") {
    val tol = Some(50L)
    assert(runAsof(strict = false, tol) === bruteAsof(strict = false, tol))
    assert(bruteAsof(strict = false, tol).values.exists(_.isEmpty))
  }

  test("asofJoin keeps every left row (LEFT semantics) and all left columns") {
    val out = Temporal.asofJoin(leftDf, rightDf, Seq("k"), "lts", "rts")
    assert(out.count() === leftRows.size)
    assert(out.columns.toSeq === Seq("k", "lts", "id", "rts", "tag"))
  }

  test("asofJoin rejects colliding non-key columns") {
    val bad = rightRows.toDF("k", "rts", "id") // 'id' collides with left
    val e = intercept[IllegalArgumentException] {
      Temporal.asofJoin(leftDf, bad, Seq("k"), "lts", "rts")
    }
    assert(e.getMessage.contains("collide"))
  }

  // ---- asofJoinSliced (skew-safe two-pass variant) ------------------------

  private def runAsofSliced(
      width: Long, strict: Boolean, tol: Option[Long]): Map[Long, Option[String]] =
    Temporal.asofJoinSliced(leftDf, rightDf, Seq("k"), "lts", "rts", width, strict, tol)
      .select("id", "tag").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap

  test("asofJoinSliced matches brute force at several slice widths, all modes") {
    for (w <- Seq(1L, 13L, 100L, 5000L)) {
      assert(runAsofSliced(w, strict = false, None) === bruteAsof(strict = false, None),
        s"inclusive mismatch at width $w")
      assert(runAsofSliced(w, strict = true, None) === bruteAsof(strict = true, None),
        s"strict mismatch at width $w")
      assert(runAsofSliced(w, strict = false, Some(50L)) === bruteAsof(strict = false, Some(50L)),
        s"tolerance mismatch at width $w")
    }
  }

  test("asofJoinSliced on a single hot key: same answer, (key, slice)-partitioned windows") {
    // ALL rows one key — the shape that serializes asofJoin's sort into a
    // single task. The sliced variant must (a) agree with the one-pass
    // plan exactly and (b) hash-partition its heavy window on
    // (key, slice), so the hot key spreads across time slices.
    val hotL = leftRows.map { case (_, ts, id) => (0L, ts, id) }.toDF("k", "lts", "id")
    val hotR = rightRows.map { case (_, ts, tag) => (0L, ts, tag) }
      .groupBy(r => r._2).map(_._2.head).toSeq.toDF("k", "rts", "tag") // keep (k, ts) distinct
    val sliced = Temporal.asofJoinSliced(hotL, hotR, Seq("k"), "lts", "rts", 100L)
    val plain = Temporal.asofJoin(hotL, hotR, Seq("k"), "lts", "rts")
    def asMap(df: DataFrame) = df.select("id", "tag").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(asMap(sliced) === asMap(plain))
    // Plan probe: at least one exchange partitions on the slice column —
    // >1 partition can be active on the hot key. (String match: the AQE
    // wrapper hides the inner tree from plan.collect.)
    val planStr = sliced.queryExecution.executedPlan.toString
    assert(
      planStr.linesIterator.exists(l =>
        l.contains("Exchange hashpartitioning") && l.contains("_graft_slice")),
      s"expected a (key, slice) hash partitioning in:\n$planStr")
  }

  test("asofJoinSliced carries right state across empty and left-only slices") {
    // One right row far in the past; left rows many slices later — the
    // carry must propagate across slices with no rows and slices with
    // only left rows.
    val l = Seq((1L, 1000L, 1L), (1L, 2500L, 2L), (1L, 9999L, 3L)).toDF("k", "lts", "id")
    val r = Seq((1L, 5L, "old")).toDF("k", "rts", "tag")
    val got = Temporal.asofJoinSliced(l, r, Seq("k"), "lts", "rts", 10L)
      .select("id", "tag").collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(got === Map(1L -> "old", 2L -> "old", 3L -> "old"))
  }

  test("asofJoinSliced rejects a non-integral ts column with a clear contract message") {
    // plain asofJoin only ORDERS by ts, so it accepts TimestampType — the
    // sliced variant floor-divides and must fail loudly at the contract,
    // not with a cryptic arithmetic analysis error (r13 review).
    val l = Seq((1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), 1L))
      .toDF("k", "lts", "id")
    val r = Seq((1L, 5L, "old")).toDF("k", "rts", "tag")
    val e = intercept[IllegalArgumentException] {
      Temporal.asofJoinSliced(l, r, Seq("k"), "lts", "rts", 10L)
    }
    assert(e.getMessage.contains("must be integral") &&
      e.getMessage.contains("unix_micros"), e.getMessage)
  }

  // ---- rangeJoin ----------------------------------------------------------

  // points may be negative (bucketing must floor, not truncate)
  private lazy val points: Seq[(Long, Long)] =
    (1L to 300L).map(i => (i, rnd.nextInt(2000).toLong - 500))
  private lazy val intervals: Seq[(Long, Long, Long)] =
    (1L to 40L).map { i =>
      val s = rnd.nextInt(2000).toLong - 600
      (i, s, s + rnd.nextInt(300).toLong) // may be empty (len 0)
    }

  private def bruteRange: Set[(Long, Long)] =
    (for {
      (pid, p) <- points
      (iid, s, e) <- intervals
      if p >= s && p < e
    } yield (pid, iid)).toSet

  private def runRange(width: Long): Set[(Long, Long)] =
    Temporal.rangeJoin(
        points.toDF("pid", "p"), intervals.toDF("iid", "s", "e"),
        "p", "s", "e", width)
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("rangeJoin matches brute force, duplicate-free, at several widths") {
    val expected = bruteRange
    assert(expected.nonEmpty)
    for (w <- Seq(1L, 7L, 100L, 4096L)) {
      val got = Temporal.rangeJoin(
          points.toDF("pid", "p"), intervals.toDF("iid", "s", "e"),
          "p", "s", "e", w)
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length === got.toSet.size, s"duplicates at width $w")
      assert(got.toSet === expected, s"mismatch at width $w")
    }
  }

  test("rangeJoin boundary semantics: start inclusive, end exclusive") {
    val pts = Seq((1L, 10L), (2L, 19L), (3L, 20L), (4L, 9L)).toDF("pid", "p")
    val ivs = Seq((100L, 10L, 20L)).toDF("iid", "s", "e")
    val got = Temporal.rangeJoin(pts, ivs, "p", "s", "e", 8L)
      .select("pid").as[Long].collect().toSet
    assert(got === Set(1L, 2L))
  }

  test("rangeJoin salted: same pairs, duplicate-free, salt reaches the join keys") {
    val expected = bruteRange
    for (sb <- Seq(2, 8)) {
      val df = Temporal.rangeJoin(
          points.toDF("pid", "p"), intervals.toDF("iid", "s", "e"),
          "p", "s", "e", 100L, saltBuckets = sb)
      val got = df.select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length === got.toSet.size, s"duplicates at saltBuckets $sb")
      assert(got.toSet === expected, s"mismatch at saltBuckets $sb")
    }
    // Hot-cell shape: every point in ONE cell (width spans the axis). The
    // salted plan must partition the shuffle join on the salt too —
    // broadcast is disabled here because salt only matters (and only
    // appears as a partition key) on the shuffle path.
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val hot = Temporal.rangeJoin(
          points.toDF("pid", "p"), intervals.toDF("iid", "s", "e"),
          "p", "s", "e", 1000000L, saltBuckets = 4)
      val planStr = hot.queryExecution.executedPlan.toString
      assert(
        planStr.linesIterator.exists(l =>
          l.contains("Exchange hashpartitioning") && l.contains("_graft_salt")),
        s"expected salt in the join partitioning:\n$planStr")
      assert(hot.select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        === expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
  }

  test("rangeJoin drops empty intervals and rejects bad width") {
    val pts = Seq((1L, 5L)).toDF("pid", "p")
    val ivs = Seq((100L, 5L, 5L), (101L, 7L, 3L)).toDF("iid", "s", "e")
    assert(Temporal.rangeJoin(pts, ivs, "p", "s", "e", 10L).count() === 0)
    intercept[IllegalArgumentException] {
      Temporal.rangeJoin(pts, ivs, "p", "s", "e", 0L)
    }
  }
}
