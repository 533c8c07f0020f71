package graft.ingest


/** Command-line front end, option-for-option compatible with the
  * reference CLI (reference `core/CulvertCLI.java:115-139`; defaults
  * `CulvertCLI.java:36-47`). Both short and long spellings are
  * accepted, commons-cli style (`-db` / `-table` are long-only there).
  *
  * Deviations (SURVEY.md §7.3): there is no Hive metastore — the sink
  * is a partitioned columnar directory `<output-dir>/<db>/<table>`, so
  * `-u` is accepted-and-ignored, and the extension option `-o`
  * (`--output-dir`, default `./culvert-warehouse`) locates the
  * warehouse; `-o console` selects the console sink fallback
  * (`Stream.java:190-191`). `-s`, `-b`, `-f` are accepted no-ops as in
  * SURVEY §2.1 #11-13.
  */
object Cli {

  final case class Parsed(cfg: IngestConfig, metastoreUrl: String, help: Boolean)

  private val defaultWarehouse = "./culvert-warehouse"

  def parse(args: Array[String]): Either[String, Parsed] = {
    var metastoreUrl = "thrift://localhost:9083"
    var db = "default"
    var table = "culvert"
    var commitAfterNRows = 1000000
    var timeout = 60000L
    var dynamicPartitioning = false
    var streamingOptimizations = true
    var transactionBatchSize = 1
    var eventsPerSecond = 10000
    var numParallelStreams = 1
    var streamLaunchDelayMs = 0L
    var enableAutoFlush = true
    var outputDir = defaultWarehouse
    var commitGroups = 1
    var seenFilter: Option[String] = None
    var help = false

    def num[T](raw: String, f: String => T): Either[String, T] =
      try Right(f(raw))
      catch { case _: NumberFormatException => Left("Invalid type for parameter.") }

    var i = 0
    while (i < args.length) {
      def arg(): Either[String, String] =
        if (i + 1 < args.length) { i += 1; Right(args(i)) }
        else Left("Invalid parameter.")
      val r: Either[String, Unit] = args(i) match {
        case "-u" | "--metastore-url"          => arg().map(metastoreUrl = _)
        case "-db"                             => arg().map(db = _)
        case "-table"                          => arg().map(table = _)
        case "-n" | "--commit-after-n-rows"    => arg().flatMap(num(_, _.toInt)).map(commitAfterNRows = _)
        case "-t" | "--timeout"                => arg().flatMap(num(_, _.toLong)).map(timeout = _)
        case "-d" | "--enable-dynamic-partition" => dynamicPartitioning = true; Right(())
        case "-s" | "--disable-streaming-optimization" => streamingOptimizations = false; Right(())
        case "-b" | "--transaction-batch-size" => arg().flatMap(num(_, _.toInt)).map(transactionBatchSize = _)
        case "-e" | "--events-per-second"      => arg().flatMap(num(_, _.toInt)).map(eventsPerSecond = _)
        case "-p" | "--parallelism"            => arg().flatMap(num(_, _.toInt)).map(numParallelStreams = _)
        case "-l" | "--stream-launch-delay"    => arg().flatMap(num(_, _.toLong)).map(streamLaunchDelayMs = _)
        case "-f" | "--disable-auto-flush"     => enableAutoFlush = false; Right(())
        case "-o" | "--output-dir"             => arg().map(outputDir = _)
        case "-g" | "--commit-groups"          => arg().flatMap(num(_, _.toInt)).map(commitGroups = _)
        case "-F" | "--seen-filter"            => arg().map(p => seenFilter = Some(p))
        case "-h" | "--help"                   => help = true; Right(())
        case other                             => Left("Invalid parameter.")
      }
      r match {
        case Left(e)  => return Left(e)
        case Right(_) => i += 1
      }
    }

    // -g is validated HERE (after the loop — -p may appear after -g on
    // the command line) so a bad combination gets the CLI's error path,
    // not a runtime stack trace from Ingest.run's require. -g is an
    // extension flag, so unlike the reference-parity "Invalid
    // parameter." errors the message says HOW to fix it (VERDICT r5 #7);
    // valid divisors are listed so the user need not factorize -p.
    if (commitGroups < 1 || numParallelStreams % commitGroups != 0) {
      val divisors = (1 to numParallelStreams)
        .filter(numParallelStreams % _ == 0).mkString(", ")
      return Left(s"commit-groups=$commitGroups must divide parallelism=" +
        s"$numParallelStreams; valid -g values for -p $numParallelStreams: $divisors.")
    }

    val outputPath =
      if (outputDir == "console") None else Some(s"$outputDir/$db/$table")
    Right(Parsed(
      IngestConfig(
        outputPath = outputPath,
        db = db,
        table = table,
        commitAfterNRows = commitAfterNRows,
        timeoutMs = timeout,
        dynamicPartitioning = dynamicPartitioning,
        streamingOptimizations = streamingOptimizations,
        transactionBatchSize = transactionBatchSize,
        eventsPerSecond = eventsPerSecond,
        parallelism = numParallelStreams,
        streamLaunchDelayMs = streamLaunchDelayMs,
        autoFlush = enableAutoFlush,
        commitGroups = commitGroups,
        seenFilterPath = seenFilter),
      metastoreUrl, help))
  }

  /** Usage text: one line per option, reference wording
    * (`CulvertCLI.java:116-138,142`). */
  val usage: String =
    """Example usage: culvert -n 100000 -t 60000 -e 100
      |
      |usage: Culvert
      | -u,--metastore-url <arg>              remote metastore url (accepted, unused: file sink). default = 'thrift://localhost:9083'
      | -n,--commit-after-n-rows <arg>        commit transaction after every n rows. default = 1_000_000
      | -t,--timeout <arg>                    timeout in milliseconds after which all streams in culvert will be stopped. default = 60000
      | -d,--enable-dynamic-partition         enable dynamic partitioned insert. default = false
      | -s,--disable-streaming-optimization   disables all streaming optimizations. default = false
      | -b,--transaction-batch-size <arg>     size of transaction batch. default = 1
      | -e,--events-per-second <arg>          events/records per second. default = 10_000
      | -p,--parallelism <arg>                number of parallel streams. default = 1
      | -l,--stream-launch-delay <arg>        delay in milliseconds between launching streams. default = 0
      | -f,--disable-auto-flush               disable auto-flush of open orc files. default = false
      | -db <arg>                             destination database. default = default
      | -table <arg>                          destination table. default = culvert
      | -o,--output-dir <arg>                 warehouse directory for the file sink ('console' = console sink). default = ./culvert-warehouse
      | -g,--commit-groups <arg>              extension: split the run into g concurrently-committing query groups (must divide -p). default = 1
      | -F,--seen-filter <arg>                extension: maintain a seen-ids bloom filter at this path (append each committed batch's id column). default = off
      | -h,--help                             usage help
      |""".stripMargin

  def main(args: Array[String]): Unit =
    parse(args) match {
      case Left(err) =>
        System.err.println(err)
        println(usage)
      case Right(Parsed(_, _, true)) =>
        println(usage)
      case Right(Parsed(cfg, _, _)) =>
        val spark = graft.core.Sessions.local(cfg.name)
        try Ingest.run(spark, cfg)
        finally spark.stop()
    }
}
