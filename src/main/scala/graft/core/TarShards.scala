package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WebDataset-style tar shard export/import: the handoff format
  * multimodal training dataloaders stream (one `.tar` per shard,
  * members named `<id>.<ext>`, consumed sequentially — no random
  * access, no footer). Payloads are opaque `binary` — text, image,
  * audio alike.
  *
  * Scale shape: shard membership is a pure function of the id
  * ([[Layout.shardOf]] — re-derivable by any engine), one hash
  * exchange routes every row of a shard to ONE task, and each task
  * streams its shards' members through a fixed 512-byte header buffer
  * — memory is O(1) per writer regardless of shard size. Readers get
  * one (whole) tar per task; size shards accordingly (the WebDataset
  * convention is ~0.1–1 GiB), `shards ≈ totalBytes / targetShardBytes`.
  *
  * The tar dialect is plain POSIX ustar: name ≤ 100 bytes, size as
  * 11-digit octal (≤ 8 GiB per member), mtime pinned to 0 so a
  * re-export of identical data is byte-identical (content-addressable
  * shards). Two zero blocks terminate each archive.
  */
object TarShards {
  private val Block = 512

  /** ustar header for one member; `name` must be ≤ 100 bytes. */
  private[graft] def header(name: String, size: Long): Array[Byte] = {
    val nameB = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    require(nameB.length <= 100, s"tar member name exceeds 100 bytes: $name")
    require(size >= 0 && size <= 0x1FFFFFFFFL, s"member size out of ustar range: $size")
    val h = new Array[Byte](Block)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      System.arraycopy(b, 0, h, off, b.length)
    }
    System.arraycopy(nameB, 0, h, 0, nameB.length)
    put(100, "0000644\u0000")
    put(108, "0000000\u0000")
    put(116, "0000000\u0000")
    put(124, f"$size%011o\u0000")
    put(136, "00000000000\u0000")
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum field as spaces
    h(156) = '0'                                   // typeflag: regular file
    put(257, "ustar\u0000")
    put(263, "00")
    put(265, "graft\u0000")
    put(297, "graft\u0000")
    put(329, "0000000\u0000")
    put(337, "0000000\u0000")
    var sum = 0L
    var i = 0
    while (i < Block) { sum += (h(i) & 0xff); i += 1 }
    put(148, f"$sum%06o\u0000 ")
    h
  }

  private def padTo(out: java.io.OutputStream, written: Long): Unit = {
    val rem = (Block - (written % Block)) % Block
    if (rem > 0) out.write(new Array[Byte](rem.toInt))
  }

  /** Export `df` into `shards` tar files under `path`
    * (`shard-%05d.tar`), members named `<id><ext>` ordered by id
    * within each shard. Id→shard routing is [[Layout.shardOf]];
    * `payloadCol` must be binary. Each shard is written by exactly one
    * task to a temp file and atomically renamed, so a retried task
    * republishes identical bytes (deterministic content: fixed
    * mtime/uid/owner, id-sorted members).
    *
    * Returns the manifest computed by RE-READING the written tars
    * (attests what landed on disk): (shard, n_members, n_bytes,
    * content_xor) where content_xor is the order-independent XOR of
    * 48-bit md5 prefixes of member payloads. */
  def export(df: DataFrame, idCol: String, payloadCol: String,
             shards: Int, path: String, ext: String = ".bin"): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    require(!df.columns.exists(_.equalsIgnoreCase("shard")),
      "input already has a 'shard' column — tar export reserves that name")
    val spark = df.sparkSession
    // hadoop Configuration is not Serializable — ship its effective
    // property dump and rebuild per task (metadata-sized)
    val confProps: Array[(String, String)] = {
      val it = spark.sparkContext.hadoopConfiguration.iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
      buf.toArray
    }
    val routed = df
      .select(col(idCol).cast("string").as("__id"), col(payloadCol).as("__pl"),
        Layout.shardOf(col(idCol), shards).as("shard"))
      .repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col("__id"))
    routed.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      val hc = new org.apache.hadoop.conf.Configuration(false)
      confProps.foreach { case (k, v) => hc.set(k, v) }
      val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(hc)
      var cur = -1L
      var out: java.io.OutputStream = null
      var tmp: org.apache.hadoop.fs.Path = null
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(_.taskAttemptId()).getOrElse(0L)
      def close(): Unit = if (out != null) {
        out.write(new Array[Byte](2 * Block)) // end-of-archive
        out.close()
        val fin = new org.apache.hadoop.fs.Path(path, f"shard-${cur}%05d.tar")
        fs.delete(fin, false)
        if (!fs.rename(tmp, fin))
          sys.error(s"could not publish tar shard $fin")
        out = null
      }
      rows.foreach { r =>
        val sh = r.getAs[Long]("shard")
        if (sh != cur) {
          close()
          cur = sh
          tmp = new org.apache.hadoop.fs.Path(path,
            f".shard-${cur}%05d.tar.$attempt%d.tmp")
          out = fs.create(tmp, true)
        }
        val payload = r.getAs[Array[Byte]]("__pl")
        val bytes = if (payload == null) Array.emptyByteArray else payload
        out.write(header(r.getAs[String]("__id") + ext, bytes.length.toLong))
        out.write(bytes)
        padTo(out, bytes.length.toLong)
      }
      close()
    }
    manifest(read(spark, path))
  }

  /** Streaming tar shard sink: each micro-batch lands as its own
    * generation of shard files under `path/epoch=<id>/shard-*.tar` —
    * tars are append-only archives, so a stream grows by ADDING
    * archives, never rewriting one (the WebDataset ingestion shape:
    * training jobs list and stream new shards as they appear).
    * Batch determinism is inherited from [[export]]; epoch-path
    * isolation plus foreachBatch's epoch-scoped replay makes a
    * restarted batch overwrite its own generation idempotently.
    * [[read]] on `path/epoch=*` unions all generations. */
  def exportStream(stream: DataFrame, idCol: String, payloadCol: String,
                   shards: Int, path: String, checkpoint: String,
                   ext: String = ".bin",
                   trigger: org.apache.spark.sql.streaming.Trigger =
                     org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        if (batch.head(1).nonEmpty) {
          export(batch, idCol, payloadCol, shards,
            s"$path/epoch=$epoch", ext)
          ()
        }
      }
      .start()

  /** Read tar shards back: one row per member — (shard, name, content).
    * Each task parses one whole tar (binaryFile source), the
    * WebDataset consumption shape. */
  def read(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(s"$path/shard-*.tar")
      .select(regexp_extract(col("path"), "shard-(\\d+)\\.tar$", 1)
        .cast("long").as("shard"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (shard, tar) => parse(tar).map { case (n, b) => (shard, n, b) } }
      .toDF("shard", "name", "content")
  }

  /** Parse a ustar archive into (name, payload) members. */
  private[graft] def parse(tar: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
    var off = 0
    while (off + Block <= tar.length && tar(off) != 0) {
      var end = off
      while (end < off + 100 && tar(end) != 0) end += 1
      val name = new String(tar, off, end - off,
        java.nio.charset.StandardCharsets.UTF_8)
      val sizeStr = new String(tar, off + 124, 12,
        java.nio.charset.StandardCharsets.US_ASCII)
        .takeWhile(c => c >= '0' && c <= '7')
      val size = java.lang.Long.parseLong(sizeStr, 8)
      val data = java.util.Arrays.copyOfRange(tar, off + Block,
        off + Block + size.toInt)
      out += ((name, data))
      off += Block + ((size + Block - 1) / Block).toInt * Block
    }
    out.toSeq
  }

  /** Order-independent per-shard manifest over a [[read]] frame:
    * member count, payload bytes, XOR of 48-bit md5 payload prefixes
    * (any lost, duplicated, or substituted member changes it —
    * overflow-free at any count). */
  def manifest(members: DataFrame): DataFrame =
    members
      .withColumn("__cs",
        conv(substring(md5(col("content")), 1, 12), 16, 10).cast("long"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_members"),
        sum(length(col("content"))).as("n_bytes"),
        expr("bit_xor(__cs)").as("content_xor"))
}
