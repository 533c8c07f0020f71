package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Synthetic column-generator library: the Spark-native re-expression of
  * the reference's generator kinds (reference `core/Column.java:29-40`
  * enum, value logic `Column.java:102-133`).
  *
  * Design: every generator is a pure Catalyst expression over a `Long`
  * row index (the `value` column of `spark.range` / the `rate` source),
  * so generation is codegen'd, fully distributed, and deterministic per
  * `(seed, rowIndex)` — a declared improvement over the reference's
  * shared `Random(123)` which is nondeterministic under multithreading
  * (`Column.java:45-46,54`; SURVEY.md §7.3).
  *
  * Pool semantics: the reference pre-builds 1M-entry pools at class load
  * and indexes them with `row % 1_000_000` (`Column.java:47,103`), so
  * pooled values cycle with period 1M. We keep the cycle structure but
  * compute the pooled value directly from the pool index with a seeded
  * hash — no driver-side arrays, no broadcast, nothing in the plan but
  * scalar expressions.
  */
object Gen {

  /** Pool period: values of pooled generators repeat every 1M rows
    * (reference `Column.java:47` SIZE = 1_000_000). */
  val PoolSize = 1000000L

  /** Generator kinds, 1:1 with the reference enum (`Column.java:29-40`). */
  sealed trait ColType
  object ColType {
    case object BooleanT       extends ColType
    case object StringName     extends ColType // fresh faker full name
    case object StringDict     extends ColType // round-robin dictionary
    case object StringIp       extends ColType // 1M-pool IPv4
    case object StringUuidPool extends ColType // 1M-pool UUIDs
    case object LongT          extends ColType
    case object DoubleT        extends ColType
    case object TimestampIso   extends ColType // 1M-pool ISO-8601 instant strings
    case object IntYear        extends ColType // pool, domain [2000, 2049]
    case object IntMonth       extends ColType // pool, domain [0, 11]
  }
  import ColType._

  /** One generated column: name, kind, optional dictionary. */
  final case class ColSpec(name: String, tpe: ColType, dict: Seq[String] = Nil)

  /** Default event schema — the Yahoo streaming-benchmark shape the
    * reference installs when no columns are given
    * (`Stream.java:151-165`, README DDL `README.md:53-65`). */
  val defaultColumns: Seq[ColSpec] = Seq(
    ColSpec("user_id", StringUuidPool),
    ColSpec("page_id", StringUuidPool),
    ColSpec("ad_id", StringUuidPool),
    ColSpec("ad_type", StringDict, Seq("banner", "modal", "sponsored-search", "mail", "mobile")),
    ColSpec("event_type", StringDict, Seq("view", "click", "purchase")),
    ColSpec("event_time", TimestampIso),
    ColSpec("ip_address", StringIp)
  )

  /** Dynamic-partition columns the reference appends under `-d`
    * (`Stream.java:77-80`). */
  val partitionColumns: Seq[ColSpec] = Seq(
    ColSpec("year", IntYear),
    ColSpec("month", IntMonth)
  )

  // Small name pools for the full-name generator. The reference calls
  // faker fresh per row (`Column.java:113-114`); we draw from seeded
  // pools hashed per row — same shape (human-looking, high cardinality
  // via first×last cross product), deterministic.
  private val firstNames = Seq(
    "James", "Mary", "Robert", "Patricia", "John", "Jennifer", "Michael",
    "Linda", "David", "Elizabeth", "William", "Barbara", "Richard", "Susan",
    "Joseph", "Jessica", "Thomas", "Sarah", "Charles", "Karen", "Christopher",
    "Lisa", "Daniel", "Nancy", "Matthew", "Betty", "Anthony", "Sandra",
    "Mark", "Margaret", "Donald", "Ashley")
  private val lastNames = Seq(
    "Smith", "Johnson", "Williams", "Brown", "Jones", "Garcia", "Miller",
    "Davis", "Rodriguez", "Martinez", "Hernandez", "Lopez", "Gonzalez",
    "Wilson", "Anderson", "Thomas", "Taylor", "Moore", "Jackson", "Martin",
    "Lee", "Perez", "Thompson", "White", "Harris", "Sanchez", "Clark",
    "Ramirez", "Lewis", "Robinson", "Walker", "Young")

  /** Seeded 64-bit hash of the row index, salted by generator name so
    * sibling columns of the same kind decorrelate. */
  private def h(salt: String, seed: Long, idx: Column): Column =
    xxhash64(lit(salt), lit(seed), idx)

  private def poolIdx(row: Column): Column = pmod(row, lit(PoolSize))

  /** Uniform int in [0, n) from a hash. */
  private def hmod(salt: String, seed: Long, idx: Column, n: Int): Column =
    pmod(h(salt, seed, idx), lit(n.toLong))

  private def pick(pool: Seq[String], salt: String, seed: Long, idx: Column): Column =
    element_at(
      array(pool.map(lit): _*),
      (hmod(salt, seed, idx, pool.size) + 1).cast("int"))

  /** The generator expression for one column over a row-index column. */
  def expr(spec: ColSpec, seed: Long, row: Column): Column = {
    val p = poolIdx(row)
    spec.tpe match {
      case BooleanT =>
        pmod(h(s"bool:${spec.name}", seed, row), lit(2L)) === 0
      case LongT =>
        h(s"long:${spec.name}", seed, row)
      case DoubleT =>
        // 53 uniform mantissa bits -> [0, 1)
        (shiftrightunsigned(h(s"double:${spec.name}", seed, row), 11).cast("double") /
          lit(9007199254740992.0))
      case TimestampIso =>
        // Pooled past instants rendered as ISO-8601 strings (the
        // reference emits `Instant.toString` of faker birthdays,
        // `Column.java:59` — past dates, emitted as STRING).
        val sec = pmod(h("ts", seed, p), lit(1500000000L)) // 1970..2017-07
        date_format(timestamp_seconds(sec), "yyyy-MM-dd'T'HH:mm:ss'Z'")
      case StringName =>
        concat_ws(" ",
          pick(firstNames, s"fn:${spec.name}", seed, row),
          pick(lastNames, s"ln:${spec.name}", seed, row))
      case StringDict =>
        // Deterministic round-robin over the dictionary — NOT random
        // (`Column.java:115-119`: `row % dictionary.length`).
        require(spec.dict.nonEmpty, s"dictionary required for ${spec.name}")
        element_at(
          array(spec.dict.map(lit): _*),
          (pmod(row, lit(spec.dict.size.toLong)) + 1).cast("int"))
      case StringIp =>
        // Pooled IPv4: four octets unpacked from one pooled hash.
        val hh = h("ip", seed, p)
        concat_ws(".",
          (0 to 3).map(k => pmod(shiftrightunsigned(hh, 8 * k), lit(256L))): _*)
      case StringUuidPool =>
        // Pooled UUID-shaped strings: 32 md5 hex chars grouped 8-4-4-4-12.
        val hx = md5(concat_ws(":", lit("uuid"), lit(seed), p))
        concat_ws("-",
          substring(hx, 1, 8), substring(hx, 9, 4), substring(hx, 13, 4),
          substring(hx, 17, 4), substring(hx, 21, 12))
      case IntYear =>
        // Domain [2000, 2049] (`Column.java:61`: 2000 + year % 50).
        (lit(2000) + hmod("year", seed, p, 50)).cast("int")
      case IntMonth =>
        // Effective domain [0, 11] (`Column.java:62`: getMonth() is 0-11,
        // so the `% 30` there is a no-op; SURVEY §1.2).
        hmod("month", seed, p, 12).cast("int")
    }
  }

  /** Project a row-index DataFrame (`value: Long` from range/rate) into
    * the generated schema. */
  def generate(indexed: DataFrame, cols: Seq[ColSpec], seed: Long): DataFrame = {
    val row = col("value")
    indexed.select(cols.map(c => expr(c, seed, row).as(c.name)): _*)
  }

  /** CSV row-encode parity mode: comma-joined stringified values WITH
    * the reference's trailing comma (`Stream.java:184-187` appends `,`
    * after every value, including the last). */
  def csvLine(cols: Seq[String]): Column =
    concat(concat_ws(",", cols.map(c => col(c).cast("string")): _*), lit(","))
}
