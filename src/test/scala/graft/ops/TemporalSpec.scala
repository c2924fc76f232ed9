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

  test("rangeJoin drops empty intervals and rejects bad width") {
    val pts = Seq((1L, 5L)).toDF("pid", "p")
    val ivs = Seq((100L, 5L, 5L), (101L, 7L, 3L)).toDF("iid", "s", "e")
    assert(Temporal.rangeJoin(pts, ivs, "p", "s", "e", 10L).count() === 0)
    intercept[IllegalArgumentException] {
      Temporal.rangeJoin(pts, ivs, "p", "s", "e", 0L)
    }
  }
}
