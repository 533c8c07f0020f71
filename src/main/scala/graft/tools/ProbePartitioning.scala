package graft.tools

import org.apache.spark.sql.functions._

/** Scratch probe: does localCheckpoint preserve HashPartitioning through
  * LogicalRDD under AQE, and does a subsequent keyed join skip the
  * exchange on the checkpointed side? */
object ProbePartitioning {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("graft-probe-part", defaultCpus = "8")
    spark.sparkContext.setLogLevel("ERROR")
    val np = spark.sessionState.conf.numShufflePartitions
    println(s"numShufflePartitions=$np")
    val e = spark.range(0, 1000000)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
      .repartition(np, col("src"))
      .localCheckpoint()
    println("== analyzed of checkpointed frame ==")
    println(e.queryExecution.analyzed.treeString.take(500))
    e.queryExecution.analyzed.collectFirst {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        println(s"LogicalRDD outputPartitioning: ${r.outputPartitioning}")
        println(s"LogicalRDD rdd partitions: ${r.rdd.getNumPartitions}")
    }
    val eDecl = org.apache.spark.sql.GraftCheckpointBridge
      .declareHashPartitioning(e, Seq("src"), np)
    eDecl.queryExecution.analyzed.collectFirst {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        println(s"DECLARED LogicalRDD outputPartitioning: ${r.outputPartitioning}")
    }
    val ranks = spark.range(0, 1000000)
      .select(col("id").as("node"), lit(1.0).as("score"))
      .repartition(np, col("node"))
      .localCheckpoint()
    val ranksDecl = org.apache.spark.sql.GraftCheckpointBridge
      .declareHashPartitioning(ranks, Seq("node"), np)
    val jd = eDecl.join(ranksDecl, eDecl("src") === ranksDecl("node"))
      .select(col("dst"), col("score"))
    jd.write.format("noop").mode("overwrite").save()
    println("== DECLARED join explain (executed) ==")
    println(jd.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode))
    // equality gate: declared vs undeclared results identical
    val j = e.join(ranks, e("src") === ranks("node"))
      .select(col("dst"), col("score"))
    val cks = (d: org.apache.spark.sql.DataFrame) => d
      .select(xxhash64(col("dst"), col("score")).as("h"))
      .agg(count(lit(1)), expr("bit_xor(h)")).collect().head
    println(s"undeclared checksum: ${cks(j)}  declared checksum: ${cks(jd)}")
    println("== join explain (pre-exec) ==")
    println(j.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode))
    j.write.format("noop").mode("overwrite").save()
    println("== join explain (executed) ==")
    println(j.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode))
    spark.stop()
  }
}
