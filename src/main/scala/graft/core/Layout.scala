package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional clustered layout (Z-ordering) for parquet/ORC
  * output — the data-skipping half of scan performance that partition
  * dirs can't give: partitionBy handles ONE low-cardinality column;
  * interleaving the bucketed bits of several high-cardinality columns
  * into a Morton code and range-writing by it puts each output file
  * into a small hyper-rectangle of the value space, so row-group
  * min/max statistics prune files for predicates on ANY of the z
  * columns (a linear sort clusters only its leading column; every file
  * spans the full range of the others).
  *
  * Shape at scale: one metadata-sized min/max aggregate, one codegen'd
  * projection for the z-value (shifts and ors — no UDF), one range
  * exchange + in-partition sort, which the write was going to pay
  * anyway for a clustered layout. Equi-width bucketing (min/max only)
  * rather than equi-depth (quantile job) — heavy skew concentrates
  * buckets, but skipping degrades gracefully and the stats pass stays
  * one aggregate.
  */
object Layout {

  /** Morton (bit-interleaved) z-value over numeric columns, each
    * equi-width-bucketed to `bits` bits between its observed min/max
    * (collected as one metadata-sized aggregate). Returns the input
    * with `zCol` appended — a pure codegen'd projection. */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int = 8,
                 zCol: String = "_z"): DataFrame = {
    require(cols.nonEmpty, "need at least one z-order column")
    require(bits >= 1 && bits * cols.length <= 63,
      s"bits x cols must fit a long, got $bits x ${cols.length}")
    val stats = df.agg(
      cols.flatMap(c => Seq(min(col(c).cast("double")).as(s"min_$c"),
        max(col(c).cast("double")).as(s"max_$c"))).head,
      cols.flatMap(c => Seq(min(col(c).cast("double")).as(s"min_$c"),
        max(col(c).cast("double")).as(s"max_$c"))).tail: _*).collect().head
    val buckets = (1L << bits).toDouble
    val bucketCols = cols.zipWithIndex.map { case (c, i) =>
      val lo = stats.getDouble(2 * i)
      val hi = stats.getDouble(2 * i + 1)
      val w = if (hi > lo) hi - lo else 1.0
      least(lit((1L << bits) - 1), greatest(lit(0L),
        floor((col(c).cast("double") - lit(lo)) / lit(w) * lit(buckets))
          .cast("long")))
    }
    val k = cols.length
    val z = (0 until bits).flatMap { i =>
      bucketCols.zipWithIndex.map { case (b, j) =>
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * k + j)
      }
    }.reduce[Column](_.bitwiseOR(_))
    df.withColumn(zCol, z)
  }

  /** Write `df` z-ordered by `cols`: range-exchange on the z-value
    * (files = contiguous z runs = small hyper-rectangles), sort within
    * partitions so row groups inside a file cluster too, drop the
    * helper column, write. `numFiles` <= 0 uses
    * spark.sql.shuffle.partitions. */
  def zorderWrite(df: DataFrame, path: String, cols: Seq[String],
                  bits: Int = 8, numFiles: Int = 0,
                  format: String = "parquet"): Unit = {
    val n = if (numFiles > 0) numFiles
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    withZValue(df, cols, bits)
      .repartitionByRange(n, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").format(format).save(path)
  }

  /** Clustering factor of a written layout: for each file and column,
    * (file's value span) / (global span) — the fraction of the value
    * range a scan of that file can hit, i.e. the expected file-skip
    * rate for point/range predicates on that column (1.0 = no
    * skipping, like an unsorted write or a non-leading sort column).
    * One scan, two keyed aggregations; diagnostic-sized output (one
    * row per column). */
  def clusteringFactor(spark: org.apache.spark.sql.SparkSession,
                       path: String, cols: Seq[String],
                       format: String = "parquet"): DataFrame = {
    val df = spark.read.format(format).load(path)
    val perFile = df.groupBy(input_file_name().as("file"))
      .agg(cols.flatMap(c => Seq(
        min(col(c).cast("double")).as(s"min_$c"),
        max(col(c).cast("double")).as(s"max_$c"))).head,
        cols.flatMap(c => Seq(
          min(col(c).cast("double")).as(s"min_$c"),
          max(col(c).cast("double")).as(s"max_$c"))).tail: _*)
    val spans = perFile.agg(
      cols.flatMap(c => Seq(
        avg(col(s"max_$c") - col(s"min_$c")).as(s"span_$c"),
        (max(col(s"max_$c")) - min(col(s"min_$c"))).as(s"global_$c"))).head,
      cols.flatMap(c => Seq(
        avg(col(s"max_$c") - col(s"min_$c")).as(s"span_$c"),
        (max(col(s"max_$c")) - min(col(s"min_$c"))).as(s"global_$c"))).tail: _*)
      .collect().head
    import spark.implicits._
    cols.zipWithIndex.map { case (c, i) =>
      val span = spans.getDouble(2 * i)
      val global = spans.getDouble(2 * i + 1)
      (c, if (global > 0) span / global else 0.0)
    }.toDF("column", "clustering_factor")
  }

  /** Shard assignment used by [[shardedExport]]: md5 of the stringed
    * id, first 6 hex chars as an integer, mod `shards` — a pure
    * function of the id, reproducible in any engine with md5 (the
    * manifest's consumers re-derive it to locate a row's shard without
    * reading data). */
  def shardOf(id: Column, shards: Int): Column =
    pmod(conv(substring(md5(id.cast("string").cast("binary")), 1, 6), 16, 10)
      .cast("long"), lit(shards.toLong))

  /** Deterministic sharded export with a verifiable manifest — the
    * handoff format a training job consumes: `shards` equal-role
    * output files whose membership is a pure function of the id
    * ([[shardOf]]), plus a manifest row per shard with the row count
    * and an order-independent id checksum (XOR of 48-bit md5
    * prefixes — overflow-free at any row count, and any lost,
    * duplicated, or substituted row changes it).
    *
    * The manifest is computed by RE-READING the written files, not
    * from the in-flight frame — it attests what landed on disk.
    * Scale shape: one hash exchange on the shard id (writers stream
    * one open file each), one aggregation over the re-read output.
    *
    * Precondition: ids must be UNIQUE — the XOR checksum cancels any
    * pair of rows sharing an id, so duplicate-id inputs weaken the
    * substitution-detection claim to counts only (n_rows still flags
    * lost/added rows). Dedup first if ids can repeat. The input must
    * not already carry a `shard` column (that name is the routing key).
    * Returns the manifest: (shard, n_rows, id_xor). */
  def shardedExport(df: DataFrame, idCol: String, shards: Int,
                    path: String, format: String = "parquet"): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    // case-INSENSITIVE like Spark's default resolver: withColumn would
    // replace a column named "Shard"/"SHARD" just the same
    require(!df.columns.exists(_.equalsIgnoreCase("shard")),
      "input already has a 'shard' column — shardedExport reserves that " +
        "name for the routing key; rename it first")
    val spark = df.sparkSession
    df.withColumn("shard", shardOf(col(idCol), shards))
      .repartition(shards, col("shard"))
      .write.mode("overwrite").format(format)
      .partitionBy("shard").save(path)
    // checksum input built Column-wise, THEN aggregated: interpolating
    // idCol into raw SQL would break on names needing quoting ("user
    // id", reserved words) — only the argument-less bit_xor aggregate
    // itself lacks a Column API
    spark.read.format(format).load(path)
      .withColumn("__cs",
        conv(substring(md5(col(idCol).cast("string").cast("binary")), 1, 12),
          16, 10).cast("long"))
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(__cs)").as("id_xor"))
  }
}
