package graft

import org.scalatest.funsuite.AnyFunSuite

/** The Verify failure contract (VERDICT r7 #2 / r8 missing #3): a query
  * that throws must leave a loud triple — error-sentinel parquet, an
  * entry in verify_errors.json, and a NONZERO exit code — never a
  * silent gap the driver gate reads as "omitted". */
class VerifyContractSpec extends AnyFunSuite {
  import TestSpark.spark

  test("a failing query yields sentinel + verify_errors.json + exit code 1") {
    val out = java.nio.file.Files.createTempDirectory("graft-verify-red").toString
    // a nonexistent sf dir breaks the query at its scan — the
    // deliberate-breakage path a broken fixture or query would take
    val code = Verify.run(spark, "/nonexistent-sf-dir", out,
      Some(Set("q01_pricing_summary")))
    assert(code == 1, "any query failure must exit nonzero")
    val sentinel = spark.read.parquet(s"$out/q01_pricing_summary")
    assert(sentinel.columns.toSeq == Seq("_graft_verify_error"))
    assert(sentinel.count() == 1L)
    val errs = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/verify_errors.json")), "UTF-8")
    assert(errs.contains("q01_pricing_summary"))
  }

  test("a passing query yields its result + empty errors + exit code 0") {
    val out = java.nio.file.Files.createTempDirectory("graft-verify-green").toString
    val code = Verify.run(spark, "/root/testdata/sf0.001", out,
      Some(Set("q01_pricing_summary")))
    assert(code == 0)
    assert(spark.read.parquet(s"$out/q01_pricing_summary").count() > 0)
    val errs = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/verify_errors.json")), "UTF-8")
    assert(errs.trim == "{}")
  }
}
