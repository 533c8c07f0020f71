package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.TarShards

/** Tar shard export: ustar conformance (parseable by an independent
  * reader), round-trip fidelity, deterministic re-export, and the
  * id-routing/manifest contracts. */
class TarShardsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def tmpDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft-tar-$tag").toFile
    d.deleteOnExit(); d.getAbsolutePath
  }

  private val docs = (0L until 40L)
    .map(i => (i, s"document body $i with id $i".getBytes("UTF-8")))
    .toDF("doc_id", "payload")

  test("header is ustar-conformant: java.util.zip-independent parse and checksum") {
    val h = TarShards.header("42.txt", 1234L)
    assert(h.length == 512)
    assert(new String(h, 257, 5, "US-ASCII") == "ustar")
    // checksum recomputes: sum with chksum field as spaces
    val stated = Integer.parseInt(
      new String(h, 148, 8, "US-ASCII").takeWhile(c => c >= '0' && c <= '7'), 8)
    val copy = h.clone(); java.util.Arrays.fill(copy, 148, 156, ' '.toByte)
    assert(copy.map(_ & 0xff).sum == stated)
    assert(java.lang.Long.parseLong(
      new String(h, 124, 12, "US-ASCII").takeWhile(c => c >= '0' && c <= '7'), 8) == 1234L)
  }

  test("round-trip: every payload comes back byte-identical under its id name") {
    val dir = tmpDir("rt")
    TarShards.export(docs, "doc_id", "payload", shards = 4, dir, ext = ".txt")
    val back = TarShards.read(spark, dir)
      .select(regexp_replace(col("name"), "\\.txt$", "").cast("long").as("doc_id"),
        col("content"))
    val joined = docs.join(back, "doc_id")
      .filter(col("payload") =!= col("content"))
    assert(back.count() == 40)
    assert(joined.count() == 0, "payload mismatch after tar round-trip")
  }

  test("archives parse with GNU tar's reader (system tar -t)") {
    val dir = tmpDir("gnu")
    TarShards.export(docs, "doc_id", "payload", shards = 2, dir, ext = ".txt")
    val tars = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".tar"))
    assert(tars.nonEmpty)
    val tarBin = new java.io.File("/usr/bin/tar")
    assume(tarBin.exists, "system tar unavailable")
    tars.foreach { t =>
      val p = new ProcessBuilder("/usr/bin/tar", "-tf", t.getAbsolutePath)
        .redirectErrorStream(true).start()
      val outLines = scala.io.Source.fromInputStream(p.getInputStream).getLines().toList
      assert(p.waitFor() == 0, s"tar -tf rejected ${t.getName}: ${outLines.take(3)}")
      assert(outLines.forall(_.endsWith(".txt")))
    }
  }

  test("re-export of identical data is byte-identical (content-addressable)") {
    val d1 = tmpDir("det1"); val d2 = tmpDir("det2")
    TarShards.export(docs, "doc_id", "payload", shards = 3, d1)
    TarShards.export(docs, "doc_id", "payload", shards = 3, d2)
    def bytes(dir: String) = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar")).sortBy(_.getName)
      .map(f => f.getName -> java.util.Arrays.hashCode(Files.readAllBytes(f.toPath)))
      .toSeq
    assert(bytes(d1) == bytes(d2))
  }

  test("manifest attests counts, bytes, and order-independent content xor") {
    val dir = tmpDir("man")
    val m = TarShards.export(docs, "doc_id", "payload", shards = 4, dir)
      .orderBy("shard").collect()
    assert(m.map(_.getAs[Long]("n_members")).sum == 40L)
    val totalBytes = docs.select(sum(length(col("payload")))).head.getLong(0)
    assert(m.map(_.getAs[Long]("n_bytes")).sum == totalBytes)
    // routing is the pure md5 function: recompute expected membership
    val expected = docs.select(
        graft.core.Layout.shardOf(col("doc_id"), 4).as("shard"))
      .groupBy("shard").count().orderBy("shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    m.foreach(r => assert(r.getAs[Long]("n_members") ==
      expected(r.getAs[Long]("shard"))))
  }

  test("truncated archives: zero-trailer EOF tolerated, partial header rejected") {
    // a full valid archive, via the writer itself
    val h = TarShards.header("a.txt", 4L)
    val payload = "body".getBytes("US-ASCII") ++ new Array[Byte](508)
    val trailer = new Array[Byte](1024)
    val full = h ++ payload ++ trailer
    assert(TarShards.parse(full).map(_._1) == Seq("a.txt"))
    // EOF inside the all-zero trailer: a tolerated truncation (the
    // member itself is intact) — parse ends cleanly
    assert(TarShards.parse(full.dropRight(1000)).map(_._1) == Seq("a.txt"))
    // EOF mid-HEADER of a second member: the partial block must be
    // REJECTED, not parsed against stale bytes from the previous block
    // (a garbage name/size, or a silent stop)
    val torn = h ++ payload ++ TarShards.header("b.txt", 4L).take(100)
    val e = intercept[java.io.EOFException] { TarShards.parse(torn).toList }
    assert(e.getMessage.contains("truncated tar"))
  }

  test("null payload becomes a zero-byte member, not a crash") {
    val withNull = Seq((1L, "x".getBytes("UTF-8")), (2L, null))
      .toDF("doc_id", "payload")
    val dir = tmpDir("nul")
    val m = TarShards.export(withNull, "doc_id", "payload", shards = 1, dir)
    assert(m.agg(sum("n_members")).head.getLong(0) == 2L)
    val back = TarShards.read(spark, dir).collect()
    assert(back.find(_.getAs[String]("name").startsWith("2"))
      .get.getAs[Array[Byte]]("content").isEmpty)
  }

  test("exportStream lands per-epoch generations; read unions them") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val dir = tmpDir("stream"); val cp = tmpDir("stream-cp")
    val ms = MemoryStream[(Long, String)]
    val stream = ms.toDF().toDF("doc_id", "txt")
      .select(col("doc_id"), encode(col("txt"), "UTF-8").as("payload"))
    ms.addData((1L, "first"), (2L, "second"))
    val q1 = TarShards.exportStream(stream, "doc_id", "payload",
      shards = 2, dir, cp, ext = ".txt")
    q1.awaitTermination(30000)
    ms.addData((3L, "third"))
    val q2 = TarShards.exportStream(stream, "doc_id", "payload",
      shards = 2, dir, cp, ext = ".txt")
    q2.awaitTermination(30000)
    val back = TarShards.read(spark, s"$dir/epoch=*")
    assert(back.count() == 3)
    val names = back.collect().map(_.getAs[String]("name")).toSet
    assert(names == Set("1.txt", "2.txt", "3.txt"))
  }
}
