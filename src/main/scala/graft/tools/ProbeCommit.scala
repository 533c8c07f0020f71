package graft.tools

import org.apache.spark.sql.functions._

/** Attribution harness for the commit protocol's per-phase cost
  * (VERDICT r13 #2): times each stage of a commitBatch-shaped 1M-row
  * commit separately — raw count, routeAndProject+write to staging,
  * publish renames, committedView listing+count — so the soak's
  * "write amplification" has a named tax instead of a lump sum.
  * Throwaway-grade but kept: quiet-window A/B runs re-use it.
  *
  * runMain graft.tools.ProbeCommit [rowsPerBatch] [batches]
  */
object ProbeCommit {
  def main(args: Array[String]): Unit = {
    val per = args.headOption.map(_.toLong).getOrElse(1000000L)
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = graft.core.Sessions.local("graft-probe-commit")
    val root = java.nio.file.Files.createTempDirectory("graft-probe-commit")
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe-commit] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    try {
      val cfg = graft.ingest.IngestConfig(
        outputPath = Some(root.toString), parallelism = 16)
      def raw(i: Long) = spark.range(i * per, (i + 1) * per, 1, cfg.parallelism)
        .select(col("id").as("value"), spark_partition_id().as("__pid"))
      // stage A: plain write of the routed projection (no protocol) —
      // OUTSIDE the commit root so the view stages below see only
      // committed layout
      val plainRoot = java.nio.file.Files.createTempDirectory("graft-probe-plain")
      (0 until 2).foreach { w =>
        t(s"plain_routed_write_$w") {
          graft.ingest.Ingest.routeAndProject(raw(99 + w), cfg)
            .write.mode("overwrite").format(cfg.format)
            .option("compression", cfg.compression)
            .options(Map("orc.compress.size" -> "32768",
              "orc.dictionary.key.threshold" -> "0"))
            .partitionBy("year", "month")
            .save(s"$plainRoot/plain$w")
        }
      }
      graft.IngestProbes.rmrfQuiet(plainRoot.toFile)
      // stage B: the full protocol, per batch
      (0 until nBatches).foreach { i =>
        t(s"commitBatch_$i") {
          graft.ingest.Ingest.commitBatch(cfg, root.toString, raw(i), i)
        }
      }
      // stage B2: the protocol's own phases, hand-unrolled — where the
      // per-commit fixed cost sits (count / staged write / publish
      // renames / marker)
      locally {
        import org.apache.hadoop.fs.Path
        val fs = new Path(root.toString)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val batch = raw(50)
        t("phase_count") { batch.count() }
        val staging = new Path(s"$root/_staging/50")
        t("phase_staged_write") {
          graft.ingest.Ingest.routeAndProject(batch, cfg)
            .write.mode("overwrite").format(cfg.format)
            .option("compression", cfg.compression)
            .options(Map("orc.compress.size" -> "32768",
              "orc.dictionary.key.threshold" -> "0"))
            .partitionBy("year", "month")
            .save(staging.toString)
        }
        val moved = t("phase_publish_renames") {
          var nMoved = 0
          val files = scala.collection.mutable.ArrayBuffer.empty[Path]
          graft.core.Tables.walkStatuses(fs, staging)(st => files += st.getPath)
          files.foreach { f =>
            if (!f.getName.startsWith("_") && !f.getName.startsWith(".")) {
              val rel = f.toString
                .stripPrefix(fs.makeQualified(staging).toString).stripPrefix("/")
              val relDir = rel.split('/').dropRight(1).mkString("/")
              val destDir = new Path(s"$root/$relDir")
              fs.mkdirs(destDir)
              fs.rename(f, new Path(destDir, s"b50-${f.getName}"))
              nMoved += 1
            }
          }
          nMoved
        }
        println(s"moved=$moved")
        t("phase_marker") {
          fs.mkdirs(new Path(s"$root/_commits"))
          fs.create(new Path(s"$root/_commits/50")).close()
        }
      }
      t("fs_walk") {
        val fs = new org.apache.hadoop.fs.Path(root.toString)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        var n = 0
        val it = fs.listFiles(new org.apache.hadoop.fs.Path(root.toString), true)
        while (it.hasNext) { it.next(); n += 1 }
        println("walked=" + n)
      }
      t("fs_walk_liststatus") {
        val fs = new org.apache.hadoop.fs.Path(root.toString)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        var n = 0
        def rec(p: org.apache.hadoop.fs.Path): Unit =
          fs.listStatus(p).foreach { st =>
            if (st.isDirectory) rec(st.getPath) else n += 1
          }
        rec(new org.apache.hadoop.fs.Path(root.toString))
        println("walkedLS=" + n)
      }
      t("one_file_schema") {
        val fs = new org.apache.hadoop.fs.Path(root.toString)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val one = fs.globStatus(
          new org.apache.hadoop.fs.Path(s"$root/year=2018/month=0/b0-*"))(0)
        println(spark.read.format(cfg.format).load(one.getPath.toString)
          .schema.simpleString.take(60))
      }
      val v = t("committedView_construct") {
        graft.core.Tables.committedView(spark, root.toString)
      }
      t("committedView_count") { println("rows=" + v.count()) }
      t("committedView_count_again") {
        graft.core.Tables.committedView(spark, root.toString).count()
      }
    } finally {
      graft.IngestProbes.rmrfQuiet(root.toFile)
      spark.stop()
    }
  }
}
