package graft.tools

import org.apache.spark.sql.functions._

/** Quiet-window A/B harness for the connected-components kernel on
  * the scale smoke's chain graph (VERDICT r13 #6: graph_cc 147 s at
  * 10M nodes vs the ≤75 s bar). runMain graft.tools.ProbeCC [nodes] */
object ProbeCC {
  def main(args: Array[String]): Unit = {
    val nodes = args.headOption.map(_.toLong).getOrElse(10000000L)
    val mode = args.drop(1).headOption.getOrElse("api")
    val chainL = 1000L
    val spark = graft.core.Sessions.local("graft-probe-cc")
    val edgesIn = spark.range(nodes - 1)
      .filter(col("id") % chainL =!= chainL - 1)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
    val t0 = System.nanoTime()
    if (mode == "api") {
      val cc = graft.api.Graph.connectedComponents(edgesIn)
      val bad = cc.filter(col("component") =!=
        col("node") - pmod(col("node"), lit(chainL))).count()
      val n = cc.count()
      graft.api.Dedup.releaseMaterialized(cc)
      println(f"[probe-cc] nodes=$n bad=$bad  ${(System.nanoTime() - t0) / 1e9}%.1f s")
    } else {
      // instrumented copy of the keepOne loop: per-stage walltimes
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
      val pairs = edgesIn.select(col("src").as("doc_a"), col("dst").as("doc_b"))
      val sym = pairs.select(col("doc_a"), col("doc_b"))
        .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      val edges = t("edges_ckpt") {
        sym.union(sym.select(col("doc_a"), col("doc_a").as("doc_b")).distinct())
          .repartition(col("doc_b"))
          .localCheckpoint()
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
      println(f"[probe-cc] manual iters=$iter ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
