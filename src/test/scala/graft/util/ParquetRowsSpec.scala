package graft.util

import graft.SparkSpec

class ParquetRowsSpec extends SparkSpec {
  import spark.implicits._

  test("PullIterator: idempotent hasNext, next-before-hasNext, clean exhaustion") {
    val src = Iterator("a", "b", "c")
    def read(): String = if (src.hasNext) src.next() else null
    val it = new PullIterator(() => read())
    // repeated hasNext consumes nothing
    (1 to 5).foreach(_ => assert(it.hasNext))
    assert(it.next() == "a")
    // next before any hasNext call
    assert(it.next() == "b")
    assert(it.hasNext && it.next() == "c")
    assert(!it.hasNext && !it.hasNext)
    intercept[NoSuchElementException](it.next())
  }

  test("ParquetRows round-trips a written parquet file in streamed order") {
    val dir = tempDir("pqrows-").resolve("t").toString
    val data = (1L to 100L).map(i => (i, s"row$i"))
    data.toDF("id", "s").repartition(4).write.parquet(dir)
    val got = ParquetRows.iterator(spark, dir)
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("s"))).toVector
    assert(got.sorted == data.sorted)
  }
}
