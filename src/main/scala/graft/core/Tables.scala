package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet fixtures (TESTDATA.md).
  *
  * Every query in the surface takes `(SparkSession, sfDir)` and loads
  * tables through here so the scan path is uniform: parquet source,
  * column pruning + predicate pushdown handled by the DataSource V2
  * reader. At 100 TB these would be partitioned directories; the API
  * is unchanged.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` is normalized to TimestampType regardless of how the
    * fixture was written — the driver has regenerated events.parquet
    * across rounds with different physical types, and a loader pinned
    * to one of them silently kills every event-time query when the
    * fixture changes (VERDICT r7 #1: 14 queries + 22 tests dead for two
    * rounds). The loader therefore dispatches on the LOADED dtype:
    *  - LongType — parquet TIMESTAMP(NANOS) read under
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (set at session
    *    construction, graft.core.Sessions.local; a loader must not
    *    mutate shared session conf, VERDICT r1 #5). Long nanos → µs
    *    timestamp via integer division (ns ≈ 1.7e18 exceeds double's
    *    53-bit mantissa, so float division would corrupt it).
    *  - TimestampNTZType — parquet timestamp[us] with
    *    isAdjustedToUTC=false (the current fixture). The session
    *    timezone is UTC, so reinterpreting the naive micros as UTC
    *    instants is exact and matches the DuckDB oracle, which reads
    *    the same column as a naive timestamp.
    *  - TimestampType — already instant-typed; use as-is.
    * FixtureSchemaSpec pins the fixture's current dtype so the next
    * driver-side regeneration fails in one named test. */
  private[graft] def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.TimestampType => df
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other — extend Tables.normalizeEventTs")
    }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(table(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Committed-only view of an ingest output directory: reads ONLY the
    * files published by batches whose `_commits/<batchId>` marker exists
    * — the atomic-visibility half of the staged-commit protocol (the
    * reference delegates this contract to hive-streaming transactions,
    * `Culvert.java:213-231`; SURVEY §2.3.1). A crash mid-publish leaves
    * `b<id>-*` files with no marker; this reader never sees them, and a
    * replayed commit first scrubs them (Ingest.commitBatch).
    *
    * Listing cost is one recursive enumeration of the table directory —
    * the same listing every Spark file-source scan performs; the marker
    * set is one extra small-directory listing.
    *
    * Zero-committed-batches behavior (ADVICE r3): the frame is still
    * TYPED — schema comes from `schema` if given, else is inferred from
    * any data file already present (staged or uncommitted files have
    * the sink's schema even before their commit lands), so downstream
    * column references behave identically on the empty and populated
    * paths. Only a sink with no files at all and no declared schema
    * degrades to `spark.emptyDataFrame` (nothing to infer from).
    */
  /** Data files carry their batch token in the name: `<batchId>`
    * (single-query sink), `g<i>-<batchId>` (concurrent commit groups),
    * or `c<stamp>` (a compaction batch, Compact.compact). */
  private[graft] val batchFileRe = "^b((?:g\\d+-)?\\d+|c\\d+)-.*$".r

  /** Resolve the LIVE batch-token set of an ingest directory: every
    * plain commit marker, minus tokens superseded by compactions. A
    * compaction marker `_commits/c<stamp>` lists the tokens its
    * rewrite replaced (its file CONTENT — written atomically via
    * temp+rename, so a reader sees either the old tokens or the
    * compacted one, never both); markers apply in stamp order so
    * compactions chain (a later compaction supersedes an earlier
    * compaction's token like any other). */
  private[graft] def liveTokens(fs: org.apache.hadoop.fs.FileSystem,
                                root: org.apache.hadoop.fs.Path): Set[String] = {
    import org.apache.hadoop.fs.Path
    val commitsDir = new Path(root, "_commits")
    if (!fs.exists(commitsDir)) return Set.empty
    val names = fs.listStatus(commitsDir).map(_.getPath.getName)
    var live = names.filter(_.matches("(?:g\\d+-)?\\d+")).toSet
    val compactions = names.collect {
      case n if n.matches("c\\d+") => (n.stripPrefix("c").toLong, n)
    }.sortBy(_._1)
    compactions.foreach { case (_, name) =>
      val in = fs.open(new Path(commitsDir, name))
      val superseded =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .filter(_.nonEmpty).toSet
        finally in.close()
      live = live -- superseded + name
    }
    live
  }


  /** Recursive data-file walk via per-directory `listStatus` — NOT
    * `fs.listFiles`: that returns LocatedFileStatus, whose constructor
    * eagerly loads permissions, which Hadoop's local filesystem
    * implements by FORKING `ls` once per file (~3.6 ms each; 9 s to
    * walk a 2.5k-file table, measured r14 — 92× slower than this walk
    * at the same file count). `listStatus` stays lazy about
    * permissions on every scheme. Hidden (`_`/`.`) directories are
    * not descended unless `descendHidden` (the committedView schema-
    * donor peek into `_staging` needs them). Missing directories read
    * as empty — a concurrent vacuum/compaction may remove a dir
    * mid-walk. */
  private[graft] def walkStatuses(fs: org.apache.hadoop.fs.FileSystem,
                                  root: org.apache.hadoop.fs.Path,
                                  descendHidden: Boolean = false)
      (visit: org.apache.hadoop.fs.FileStatus => Unit): Unit = {
    def rec(p: org.apache.hadoop.fs.Path): Unit = {
      val kids =
        try fs.listStatus(p)
        catch {
          case _: java.io.FileNotFoundException =>
            Array.empty[org.apache.hadoop.fs.FileStatus]
        }
      kids.foreach { st =>
        val n = st.getPath.getName
        if (st.isDirectory) {
          if (descendHidden || !(n.startsWith("_") || n.startsWith(".")))
            rec(st.getPath)
        } else visit(st)
      }
    }
    rec(root)
  }

  /** Recursive listing of the data files belonging to a given set of
    * batch tokens (the `b<token>-*` naming contract), hidden dirs
    * skipped — the resolution step shared by snapshot reads and the
    * commit-log stream. One directory walk per call, same cost as any
    * file-source listing. */
  private[graft] def tokenDataFiles(fs: org.apache.hadoop.fs.FileSystem,
                                    root: org.apache.hadoop.fs.Path,
                                    tokens: Set[String]): Seq[String] =
    tokenDataStatuses(fs, root, tokens).map(_.getPath.toString)

  /** Status-preserving form of [[tokenDataFiles]] — callers that go on
    * to BUILD A FRAME over the resolved files must use this +
    * [[manifestFrame]], not per-file `load(paths: _*)`: above 32 roots
    * the reader path launches a distributed listing job re-discovering
    * statuses this walk already holds (the r14 committedView bug; a
    * commit-log STREAM hits it once per micro-batch at production
    * commit sizes — 512-file commits are the bench's own shape). */
  private[graft] def tokenDataStatuses(fs: org.apache.hadoop.fs.FileSystem,
                                       root: org.apache.hadoop.fs.Path,
                                       tokens: Set[String])
      : Seq[org.apache.hadoop.fs.FileStatus] = {
    val files = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.hadoop.fs.FileStatus]
    walkStatuses(fs, root) { st =>
      st.getPath.getName match {
        case batchFileRe(id) if tokens(id) => files += st
        case _ => ()
      }
    }
    files.toSeq
  }

  /** Snapshot (time-travel) read: the table as of ingest batch
    * `upToBatch` — the files of every plain or commit-group batch with
    * id ≤ `upToBatch`, resolved against the ORIGINAL batch files.
    * Compaction rewrites never participate: a compacted file merges the
    * table state at compaction time and cannot represent an earlier
    * batch boundary. Until `Compact.vacuum`, superseded originals stay
    * on disk, so every historical snapshot remains reconstructible
    * after a compaction; once vacuum has deleted a needed original the
    * snapshot is gone and this FAILS LOUDLY (the VACUUM-breaks-
    * time-travel contract every log-structured table format shares)
    * rather than silently returning a partial snapshot. The
    * reproducibility primitive for "train on the corpus exactly as it
    * stood at commit N". */
  def committedViewAsOf(spark: SparkSession, path: String, upToBatch: Long,
                        format: String = "orc",
                        schema: Option[org.apache.spark.sql.types.StructType] = None,
                        mergeSchemas: Boolean = false)
      : DataFrame =
    committedViewRange(spark, path, Long.MinValue, upToBatch, format, schema,
      mergeSchemas)

  /** Resolve an AS-OF timestamp to a batch id: the max batch id among
    * commit markers whose mtime ≤ `tsMillis`. Markers are written at
    * commit time and never touched again, so the mtime IS the commit
    * stamp. A timestamp that predates the FIRST commit fails loudly —
    * "the table as it stood before it existed" is a caller bug, not an
    * empty table. Commit-group caveat (single-writer sequential ids
    * have none): groups commit the same batch id at different moments,
    * and the snapshot-by-id contract then includes every id ≤ the
    * resolved one even if some group's marker for a smaller id landed
    * after `tsMillis` — resolution is by marker stamp, inclusion by
    * batch id, the same rule [[committedViewAsOf]] documents. */
  def resolveBatchAt(spark: SparkSession, path: String, tsMillis: Long): Long = {
    import org.apache.hadoop.fs.Path
    val commitsDir = new Path(new Path(path), "_commits")
    val fs = commitsDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val batchToken = "(?:g\\d+-)?(\\d+)".r
    val stamps =
      if (!fs.exists(commitsDir)) Array.empty[(Long, Long)]
      else fs.listStatus(commitsDir).flatMap { st =>
        st.getPath.getName match {
          case batchToken(id) => Some((id.toLong, st.getModificationTime))
          case _ => None
        }
      }
    require(stamps.nonEmpty, s"no commits at $path — nothing to time-travel to")
    val eligible = stamps.collect { case (id, m) if m <= tsMillis => id }
    if (eligible.isEmpty) {
      val first = stamps.minBy(_._2)
      throw new IllegalArgumentException(
        s"timestamp $tsMillis predates the first commit to $path " +
          s"(batch ${first._1} at ${first._2}) — there is no table state to read")
    }
    eligible.max
  }

  /** Timestamp-addressed snapshot ([[committedViewAsOf]] with the
    * batch id resolved by [[resolveBatchAt]]) — the standard lakehouse
    * AS-OF-timestamp read; same vacuum-fails-loudly contract. */
  def committedViewAt(spark: SparkSession, path: String, tsMillis: Long,
                      format: String = "orc",
                      schema: Option[org.apache.spark.sql.types.StructType] = None,
                      mergeSchemas: Boolean = false): DataFrame =
    committedViewAsOf(spark, path, resolveBatchAt(spark, path, tsMillis),
      format, schema, mergeSchemas)

  /** Timestamp-addressed snapshot DIFF: the rows ADDED in the time
    * window `(fromTs, toTs]` — [[committedViewDelta]] with both
    * boundaries resolved by [[resolveBatchAt]]. Asymmetric pre-history
    * handling, deliberately: a `fromTs` BEFORE the first commit means
    * "everything up to toTs" (the from-boundary resolves to
    * before-all-batches — asking for changes since before the table
    * existed is a meaningful window), while a `toTs` before the first
    * commit still fails loudly through resolveBatchAt (an EMPTY window
    * ending in pre-history is indistinguishable from a caller bug).
    * Same O(delta) read and vacuum contract as the batch form. */
  def committedViewDeltaAt(spark: SparkSession, path: String,
                           fromTs: Long, toTs: Long,
                           format: String = "orc",
                           schema: Option[org.apache.spark.sql.types.StructType] = None,
                           mergeSchemas: Boolean = false): DataFrame = {
    require(fromTs <= toTs, s"fromTs $fromTs must be <= toTs $toTs")
    val to = resolveBatchAt(spark, path, toTs)
    val from =
      try resolveBatchAt(spark, path, fromTs)
      catch { case _: IllegalArgumentException => Long.MinValue }
    committedViewDelta(spark, path, math.min(from, to), to, format, schema,
      mergeSchemas)
  }

  /** Snapshot DIFF: the rows ADDED between two batch boundaries — the
    * table as of `toBatch` minus the table as of `fromBatch`
    * (exclusive/inclusive). The commit log is append-only (compaction
    * rewrites content, never changes it), so the diff is EXACTLY the
    * original files of the batches in `(fromBatch, toBatch]` — an
    * O(delta) read with no join, no shuffle, and no scan of either
    * full snapshot; at 100 TB this is the difference between diffing
    * two corpus versions in seconds and anti-joining two corpus-sized
    * tables. Same vacuum contract as [[committedViewAsOf]]: once a
    * needed original was compacted away AND vacuumed, the diff fails
    * loudly. Incremental-training primitive: "the documents commit N
    * added since the last training snapshot M". */
  def committedViewDelta(spark: SparkSession, path: String, fromBatch: Long,
                         toBatch: Long, format: String = "orc",
                         schema: Option[org.apache.spark.sql.types.StructType] = None,
                         mergeSchemas: Boolean = false): DataFrame = {
    require(fromBatch <= toBatch,
      s"fromBatch $fromBatch must be <= toBatch $toBatch")
    committedViewRange(spark, path, fromBatch, toBatch, format, schema,
      mergeSchemas)
  }

  private def committedViewRange(spark: SparkSession, path: String,
                                 afterBatch: Long, upToBatch: Long,
                                 format: String,
                                 schema: Option[org.apache.spark.sql.types.StructType],
                                 mergeSchemas: Boolean): DataFrame = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val commitsDir = new Path(root, "_commits")
    val batchToken = "(?:g\\d+-)?(\\d+)".r
    val names =
      if (fs.exists(commitsDir)) fs.listStatus(commitsDir).map(_.getPath.getName)
      else Array.empty[String]
    val wanted = names.collect {
      case t @ batchToken(id) if id.toLong > afterBatch && id.toLong <= upToBatch => t
    }.toSet
    // every token any compaction has (transitively) superseded — its
    // files are vacuum candidates, so absence means "destroyed", not
    // "empty commit"
    val superseded = names.collect {
      case n if n.matches("c\\d+") => (n.stripPrefix("c").toLong, n)
    }.sortBy(_._1).flatMap { case (_, name) =>
      val in = fs.open(new Path(commitsDir, name))
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).toSeq
      finally in.close()
    }.toSet
    val files = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.hadoop.fs.FileStatus]
    val tokensSeen = scala.collection.mutable.Set.empty[String]
    walkStatuses(fs, root) { st =>
      st.getPath.getName match {
        case batchFileRe(id) if wanted(id) =>
          files += st; tokensSeen += id
        case _ => ()
      }
    }
    val destroyed = (wanted -- tokensSeen).filter(superseded)
    if (destroyed.nonEmpty) {
      val window = if (afterBatch == Long.MinValue) s"as of batch $upToBatch"
        else s"delta ($afterBatch, $upToBatch]"
      throw new IllegalStateException(
        s"snapshot $window is unreconstructible: batch file(s) " +
          s"${destroyed.toSeq.sorted.mkString(", ")} were compacted away and " +
          "vacuumed — historical reads survive compaction only until vacuum")
    }
    if (files.nonEmpty)
      manifestFrame(spark, path, files.toSeq, format, mergeSchemas)
    else committedView(spark, path, format, schema, mergeSchemas).limit(0)
  }

  /** Shared reader for committed batch files. With `mergeSchemas` the
    * view is the UNION-BY-NAME of every committed batch's schema —
    * schema evolution: a column added in a later commit reads as null
    * for earlier batches, and an INCOMPATIBLE redefinition (the same
    * column at a different type) fails loudly at load time (the
    * source's schema-merge rejects it) instead of silently winning by
    * whichever file the sampler picked. Off by default: merging reads
    * every file's footer up front, which a fixed-schema table need
    * not pay. */
  /** Frame over a resolved committed-file manifest. Default path: a
    * manifest-backed FileIndex (org.apache.spark.sql.execution
    * .datasources.GraftCommitFileIndex) serving the statuses the
    * commit-log walk already holds — NO re-listing, no per-file
    * getFileStatus, no parallel-discovery job (13 s per view at 2.5k
    * files before r14; a listing storm per reader at object-store
    * scale). The DataFrameReader path remains for schema-merging
    * reads (every footer must be consulted anyway) and non-columnar
    * formats. */
  private[graft] def manifestFrame(spark: SparkSession, path: String,
                            files: Seq[org.apache.hadoop.fs.FileStatus],
                            format: String,
                            mergeSchemas: Boolean): DataFrame = {
    val fast =
      if (mergeSchemas) None
      else org.apache.spark.sql.execution.datasources.GraftCommitFileIndex
        .frame(spark, path, files, format)
    fast.getOrElse(batchReader(spark, path, format, mergeSchemas)
      .load(files.map(_.getPath.toString): _*))
  }

  private def batchReader(spark: SparkSession, path: String, format: String,
                          mergeSchemas: Boolean): org.apache.spark.sql.DataFrameReader = {
    val r = spark.read.format(format).option("basePath", path)
    if (mergeSchemas) r.option("mergeSchema", "true") else r
  }

  /** Commit history of a staged-publish ingest table: one row per
    * marker — (token, mtime_ms, kind ∈ commit|compaction, live).
    * `live=false` means a compaction superseded the token (its files
    * are vacuum candidates) or the file is not a protocol marker.
    *
    * Consistency (ADVICE r14): rows AND live flags derive from ONE
    * materialized scan of the `graft-commits` source — the scan is
    * localCheckpoint'd and liveness is an anti-join of the tokens
    * against the SAME snapshot's `superseded` lists, so a commit or
    * compaction landing mid-query can never pair a marker row with a
    * stale flag. Liveness algebra: tokens are unique and a compaction
    * only lists tokens that predate it, so `live = protocol-marker ∧
    * token ∉ ⋃(compaction contents)` — exactly [[liveTokens]]'s
    * fold. Markers are bytes-per-commit metadata; the checkpoint and
    * join are metadata-sized. Returns a MATERIALIZED frame — consume,
    * then [[graft.api.Dedup.releaseMaterialized]] (SQL callers:
    * `graft_release_materialized()`). */
  def commitLog(spark: SparkSession, path: String): DataFrame = {
    val markers = graft.api.PlanAudit.checkpoint(
      spark.read.format("graft-commits").load(s"$path/_commits"))
    val dead = markers
      .select(explode(col("superseded")).as("token"))
      .distinct()
      .withColumn("__dead", lit(true))
    markers.join(dead, Seq("token"), "left")
      .select(col("token"), col("mtime_ms"),
        when(col("token").rlike("^c\\d+$"), lit("compaction"))
          .otherwise(lit("commit")).as("kind"),
        (col("__dead").isNull &&
          (col("token").rlike("^(?:g\\d+-)?\\d+$") ||
            col("token").rlike("^c\\d+$"))).as("live"))
  }

  /** BUCKET-AWARE committed view (VERDICT r16 #3): the ingest write
    * side produces `buckets` hash-disjoint files per partition dir on
    * the cluster key (the reference DDL's `clustered by (user_id) into
    * 32 buckets`, README.md:62-63) and stamps each published file with
    * Spark's `_NNNNN` bucket suffix + a `_bucketspec` manifest —
    * this reader hands that layout to the planner as a real
    * BucketSpec, so repeated joins/aggregations on the cluster key
    * read bucket-aligned partitions and plan with ZERO Exchange on the
    * committed side. At 100 TB that is the difference between
    * shuffling the corpus per join and never shuffling it: the one
    * hash exchange was paid at write time.
    *
    * Falls back LOUDLY (stderr) to the plain [[committedView]] when
    * the layout cannot be trusted end-to-end: no `_bucketspec`, a
    * compaction rewrite in the live set (compaction repartitions by
    * partition dir, destroying bucket discipline), or any file whose
    * name parses to no bucket / an out-of-range bucket — a bucketed
    * scan over such a set would silently DROP those files' rows
    * (FileSourceScanExec keys files by parsed bucket id), which is
    * never an acceptable trade for a saved shuffle. Results are
    * identical either way; only the plan shape differs. */
  def committedViewBucketed(spark: SparkSession, path: String,
                            format: String = "orc"): DataFrame = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def fallback(why: String): DataFrame = {
      System.err.println(
        s"[tables] committedViewBucketed($path): $why — using the unbucketed read")
      committedView(spark, path, format)
    }
    val specFile = new Path(root, "_bucketspec")
    if (!fs.exists(specFile)) return fallback("no _bucketspec manifest")
    val in = fs.open(specFile)
    val kv =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .flatMap { l =>
          l.split('=') match { case Array(k, v) => Some(k -> v); case _ => None }
        }.toMap
      finally in.close()
    val spec = for {
      b <- kv.get("buckets").flatMap(_.toIntOption) if b > 0
      c <- kv.get("column")
    } yield (b, c)
    if (spec.isEmpty) return fallback(s"unparseable _bucketspec: $kv")
    val (buckets, bucketCol) = spec.get
    val committed = liveTokens(fs, root)
    val files = tokenDataStatuses(fs, root, committed)
    if (files.isEmpty) return committedView(spark, path, format)
    val unattributable = files.filter { st =>
      org.apache.spark.sql.execution.datasources.GraftCommitFileIndex
        .bucketIdOf(st.getPath.getName).forall(id => id < 0 || id >= buckets)
    }
    if (unattributable.nonEmpty)
      return fallback(s"${unattributable.size} file(s) without a valid " +
        s"bucket id (e.g. ${unattributable.head.getPath.getName}) — " +
        "compaction rewrite or pre-bucket-suffix commit")
    val bucketSpec = org.apache.spark.sql.catalyst.catalog.BucketSpec(
      buckets, Seq(bucketCol), Nil)
    org.apache.spark.sql.execution.datasources.GraftCommitFileIndex
      .frame(spark, path, files, format, bucketSpec = Some(bucketSpec))
      .getOrElse(fallback(s"no V1 FileFormat for '$format'"))
  }

  def committedView(spark: SparkSession, path: String, format: String = "orc",
                    schema: Option[org.apache.spark.sql.types.StructType] = None,
                    mergeSchemas: Boolean = false): DataFrame = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = liveTokens(fs, root)
    val batchFile = batchFileRe
    val rootQualified = fs.makeQualified(root).toString
    val files = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.hadoop.fs.FileStatus]
    // (file, basePath) of some data file to borrow a schema from when no
    // batch is committed: a half-published b<id>-* file sits in the real
    // partition layout (basePath = table root); a staged file sits under
    // _staging/<id>/<partition dirs> (basePath = the staging batch dir)
    var schemaDonor: Option[(String, String)] = None
    walkStatuses(fs, root, descendHidden = true) { st =>
      val f = st.getPath
      val rel = f.toString.stripPrefix(rootQualified).stripPrefix("/")
      val segs = rel.split('/')
      val visible = !segs.exists(seg => seg.startsWith("_") || seg.startsWith("."))
      f.getName match {
        case batchFile(id) if visible && committed(id) => files += st
        case _ => ()
      }
      if (schemaDonor.isEmpty && !f.getName.startsWith(".") && !f.getName.startsWith("_")) {
        if (visible && batchFile.pattern.matcher(f.getName).matches())
          schemaDonor = Some((f.toString, path))
        else if (segs.headOption.contains("_staging") && segs.length > 2 &&
          !segs.drop(2).exists(seg => seg.startsWith("_") || seg.startsWith(".")))
          schemaDonor = Some((f.toString, s"$path/_staging/${segs(1)}"))
      }
    }
    if (files.nonEmpty)
      manifestFrame(spark, path, files.toSeq, format, mergeSchemas)
    else schema match {
      case Some(s) => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
      case None => schemaDonor match {
        case Some((donor, base)) =>
          // borrow the schema (incl. partition columns via basePath)
          // from a file the sink has written — zero rows read
          spark.read.format(format).option("basePath", base).load(donor).limit(0)
        case None => spark.emptyDataFrame
      }
    }
  }
}
