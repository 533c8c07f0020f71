package graft.tools

import org.apache.spark.sql.functions._

/** Quiet-window A/B harness for the connected-components kernel on
  * the scale smoke's chain graph (VERDICT r13 #6: graph_cc 147 s at
  * 10M nodes vs the ≤75 s bar; VERDICT r17 #1: graph_cc 70.5 → 123.9 s
  * at 50M-rows smoke scale after the checkpointHash layout declaration
  * landed in keepOne — adjudicate declared vs undeclared).
  *
  * Modes:
  *   runMain graft.tools.ProbeCC [nodes]            — one in-process
  *     keepOne run via the API (declared layout, the shipped default)
  *   runMain graft.tools.ProbeCC [nodes] undeclared — same run with the
  *     GraftCheckpointBridge declaration killed (-Dgraft.declareHash=off
  *     equivalent): the EXACT shipped code minus only the declaration
  *   runMain graft.tools.ProbeCC [nodes] manual     — instrumented copy
  *     of the keepOne loop with per-stage walltimes (undeclared)
  *   runMain graft.tools.ProbeCC [nodes] manual-declared — per-stage
  *     walltimes with the declared edge layout (keepOne verbatim)
  *   runMain graft.tools.ProbeCC [nodes] ab [reps] [outJson] — the
  *     adjudication: fork alternating declared/undeclared legs into
  *     FRESH JVMs (the variance class no in-process A/B can see),
  *     record wall + ambient + io per leg, write JSON.
  */
object ProbeCC {
  private def chainEdges(spark: org.apache.spark.sql.SparkSession,
                         nodes: Long, chainL: Long) =
    spark.range(nodes - 1)
      .filter(col("id") % chainL =!= chainL - 1)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))

  def main(args: Array[String]): Unit = {
    val nodes = args.headOption.map(_.toLong).getOrElse(10000000L)
    val mode = args.drop(1).headOption.getOrElse("api")
    val chainL = 1000L
    if (mode == "ab") { runAb(nodes, args); return }
    if (mode == "undeclared") sys.props("graft.declareHash") = "off"
    val spark = graft.core.Sessions.local("graft-probe-cc")
    graft.AmbientLoad.start()
    val edgesIn = chainEdges(spark, nodes, chainL)
    val amb0 = graft.AmbientLoad.ambientNow()
    val io0 = graft.IoLoad.ioSome10Now()
    val t0 = System.nanoTime()
    if (mode == "api" || mode == "undeclared") {
      val cc = graft.api.Graph.connectedComponents(edgesIn)
      val bad = cc.filter(col("component") =!=
        col("node") - pmod(col("node"), lit(chainL))).count()
      val n = cc.count()
      graft.api.Dedup.releaseMaterialized(cc)
      val sec = (System.nanoTime() - t0) / 1e9
      require(bad == 0 && n == nodes - nodes % chainL,
        s"probe-cc drift: bad=$bad n=$n")
      println(f"[probe-cc] mode=$mode nodes=$n bad=$bad  $sec%.1f s")
      // machine-parsable sample line for the ab parent
      println(f"PROBE_CC_SAMPLE=$mode,$sec%.2f,$amb0%.2f,$io0%.1f")
    } else {
      // instrumented copy of the keepOne loop: per-stage walltimes;
      // "manual-declared" adds the shipped checkpointHash declaration
      // on the edge frame so the two manual legs differ ONLY there
      val sc = spark.sparkContext
      def ownRddId(df: org.apache.spark.sql.DataFrame): Option[Int] =
        df.queryExecution.analyzed.collectFirst {
          case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.id
        }
      def release(id: Option[Int]): Unit = id.foreach(i =>
        sc.getPersistentRDDs.get(i).foreach(_.unpersist(false)))
      def t[A](name: String)(body: => A): A = {
        val s0 = System.nanoTime()
        val r = body
        System.err.println(f"[probe-cc]   $name ${(System.nanoTime() - s0) / 1e9}%6.2f s")
        r
      }
      val np = spark.sessionState.conf.numShufflePartitions
      val pairs = edgesIn.select(col("src").as("doc_a"), col("dst").as("doc_b"))
      val sym = pairs.select(col("doc_a"), col("doc_b"))
        .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      val edges = t("edges_ckpt") {
        val base = sym.union(sym.select(col("doc_a"), col("doc_a").as("doc_b")).distinct())
          .repartition(np, col("doc_b"))
          .localCheckpoint()
        if (mode == "manual-declared")
          org.apache.spark.sql.GraftCheckpointBridge.declareHashPartitioning(
            base, Seq("doc_b"), np)
        else base
      }
      var prevId: Option[Int] = None
      var labels = t("init_labels") {
        edges.select(col("doc_a").as("node")).distinct()
          .withColumn("label", col("node"))
      }
      def labelSum(df: org.apache.spark.sql.DataFrame): java.math.BigDecimal =
        df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)
      var prevSum: java.math.BigDecimal = null
      var converged = false
      var iter = 0
      while (!converged && iter < 50) {
        val stepped = t(s"stepped_$iter") {
          edges.join(labels, edges("doc_b") === labels("node"))
            .groupBy(col("doc_a").as("node")).agg(min("label").as("label"))
            .localCheckpoint()
        }
        def chase(df: org.apache.spark.sql.DataFrame, tag: String) = t(tag) {
          val byNode = df.select(col("node").as("pnode"), col("label").as("plabel"))
          df.join(byNode, df("label") === byNode("pnode"))
            .select(df("node"), least(df("label"), col("plabel")).as("label"))
            .localCheckpoint()
        }
        val c1 = chase(stepped, s"chase1_$iter")
        release(ownRddId(stepped))
        val next = chase(c1, s"chase2_$iter")
        release(ownRddId(c1))
        val s = t(s"conv_$iter") { labelSum(next) }
        converged = (s == null && prevSum == null) ||
          (s != null && prevSum != null && s.compareTo(prevSum) == 0)
        prevSum = s
        release(prevId)
        prevId = ownRddId(next)
        labels = next
        iter += 1
      }
      println(f"[probe-cc] mode=$mode iters=$iter ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }

  /** Forked alternating A/B: declared vs undeclared keepOne in fresh
    * JVMs, `reps` legs per variant. */
  private def runAb(nodes: Long, args: Array[String]): Unit = {
    val reps = if (args.length > 2) args(2).toInt else 3
    val outJson = if (args.length > 3) args(3) else "bench_ab_r18_cc.json"
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    val floors = scala.collection.mutable.Map.empty[String, Double]
    (1 to reps).foreach { rep =>
      Seq("api", "undeclared").foreach { leg =>
        val out = java.io.File.createTempFile(s"graft-probe-cc-$leg", ".log")
        try {
          val pr = RaceChild.spawn(Seq(nodes.toString, leg), out,
            mainClass = "graft.tools.ProbeCC", xmx = "16g")
          val finished = pr.waitFor(30, java.util.concurrent.TimeUnit.MINUTES)
          if (!finished) pr.destroyForcibly()
          val src = scala.io.Source.fromFile(out, "UTF-8")
          val lines = try src.getLines().toList finally src.close()
          lines.filter(_.startsWith("PROBE_CC_SAMPLE=")).foreach { l =>
            val f = l.stripPrefix("PROBE_CC_SAMPLE=").split(',')
            entries += s"""{"variant":"${f(0)}","rep":$rep,"sec":${f(1)},""" +
              s""""amb":${f(2)},"io10":${f(3)}}"""
            val sec = f(1).toDouble
            floors(f(0)) = math.min(floors.getOrElse(f(0), Double.MaxValue), sec)
            System.err.println(s"[probe-cc-ab] $leg rep$rep: ${f(1)} s (amb ${f(2)}, io10 ${f(3)})")
          }
          if (!lines.exists(_.startsWith("PROBE_CC_SAMPLE=")))
            System.err.println(s"[probe-cc-ab] $leg rep$rep FAILED; tail: " +
              lines.takeRight(5).mkString(" | ").take(400))
        } finally out.delete()
      }
    }
    val json = s"""{"tool":"ProbeCC-ab","nodes":$nodes,"reps":$reps,""" +
      s""""floor_declared":${floors.getOrElse("api", -1.0)},""" +
      s""""floor_undeclared":${floors.getOrElse("undeclared", -1.0)},""" +
      s""""runs":[${entries.mkString(",")}]}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json + "\n")
    println(json)
  }
}
