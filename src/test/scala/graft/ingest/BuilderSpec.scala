package graft.ingest

import java.nio.file.Files

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Programmatic builder API parity (reference EP3, `Culvert.java:59-98`
  * + `Stream.java:90-166`). */
class BuilderSpec extends AnyFunSuite {

  test("builder defaults mirror the reference StreamBuilder, not the CLI") {
    val c = CulvertBuilder.newBuilder().config
    // Stream.java:94-102 defaults
    assert(c.eventsPerSecond == 10)
    assert(c.commitAfterNRows == 10000)
    assert(c.transactionBatchSize == 10)
    assert(c.timeoutMs == -1L)
    assert(c.outputPath.isEmpty) // console fallback
  }

  test("builder methods configure a runnable culvert") {
    val c = CulvertBuilder.newBuilder()
      .withName("lib")
      .withParallelism(3)
      .withEventsPerSecond(500)
      .withCommitAfterRows(100)
      .withTimeout(1234)
      .withDynamicPartitioning(true)
      .withBuckets(4)
      .withSeed(7)
      .config
    assert(c.name == "lib" && c.parallelism == 3 && c.eventsPerSecond == 500 &&
      c.commitAfterNRows == 100 && c.timeoutMs == 1234 && c.dynamicPartitioning &&
      c.buckets == 4 && c.seed == 7)
  }

  test("withColumns overrides the generated schema end to end") {
    val dir = Files.createTempDirectory("graft-builder-cols").toString
    val specs = Seq(
      Gen.ColSpec("device_id", Gen.ColType.StringUuidPool),
      Gen.ColSpec("kind", Gen.ColType.StringDict, Seq("a", "b")),
      Gen.ColSpec("score", Gen.ColType.DoubleT))
    val cfg = CulvertBuilder.newBuilder()
      .withOutputPath(dir)
      .withParallelism(2)
      .withBuckets(2)
      .withColumns(specs)
      .config
    Ingest.runBatch(TestSpark.spark, cfg, 1000)
    val back = TestSpark.spark.read.orc(dir)
    assert(back.columns.sorted.sameElements(
      Array("device_id", "kind", "month", "score", "year")))
    assert(back.count() == 1000)
    // bucket contract holds for the override's FIRST column: the two
    // files of a partition dir are hash-disjoint in device_id
    import org.apache.spark.sql.functions._
    val perFile = back
      .withColumn("f", input_file_name())
      .select(col("f"), pmod(hash(col("device_id")), lit(2)).as("bkt"))
      .distinct().groupBy("f").count().collect()
    assert(perFile.forall(_.getLong(1) == 1L), "each file must hold one bucket")
  }

  test("builder run drives a real streaming ingest") {
    val dir = Files.createTempDirectory("graft-builder").toString
    val res = CulvertBuilder.newBuilder()
      .withOutputPath(dir)
      .withParallelism(2)
      .withEventsPerSecond(2000)
      .withCommitAfterRows(400)
      .withTimeout(15000) // generous under external machine load
      .withBuckets(2)
      .run(TestSpark.spark)
    assert(res.rowsCommitted > 0)
    assert(TestSpark.spark.read.orc(dir).count() == res.rowsCommitted)
  }
}
