package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // write timestamps as INT64 micros so the driver's DuckDB/pyarrow
      // side sees the same physical type it computes (not INT96/ns)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      // status listeners run even with the UI off and their retained
      // state grows across a 174-query single-JVM dump, taxing every
      // later job (the Bench round-10 finding — capping retention cut
      // that sweep 20% on identical code); same treatment here
      .config("spark.sql.ui.retainedExecutions", "15")
      .config("spark.ui.retainedJobs", "50")
      .config("spark.ui.retainedStages", "100")
      .config("spark.ui.retainedTasks", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.TopK.ensureRegistered(spark)
    new java.io.File(outDir).mkdirs()
    // optional local-iteration filter: run only the named queries
    // (driver sets no filter and always gets the full dump)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None => SparkEntry.queries
    }
    // Gate diagnosability (judge r6): besides the parquet the driver
    // compares, emit a canonical per-query content hash and — for any
    // query under 10k rows — a plain-text row dump, so a driver-side
    // hash_match=false is diffable byte-for-byte against a builder or
    // judge run of this same binary, identifying the diverging side,
    // row, and column from artifacts alone.
    val hashes = scala.collection.mutable.LinkedHashMap[String, String]()
    selected.foreach { case (name, fn) =>
      try {
        var df = fn(spark, sfDir)
        // Spark timestamps are LTZ (isAdjustedToUTC=true in parquet); the
        // DuckDB oracle produces naive timestamps. Session TZ is UTC, so
        // casting to NTZ is value-identity but makes the physical parquet
        // type (INT64 micros, naive) match the oracle's exactly.
        for (f <- df.schema.fields
             if f.dataType == org.apache.spark.sql.types.TimestampType)
          df = df.withColumn(f.name,
            org.apache.spark.sql.functions.col(f.name).cast("timestamp_ntz"))
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        // canonical form: columns sorted by name, every value rendered to
        // string (binary → hex), nulls as \N — read BACK from the dumped
        // parquet so the hash covers exactly the bytes the driver reads.
        import org.apache.spark.sql.functions._
        val back = spark.read.parquet(s"$outDir/$name")
        val cols = back.columns.sorted.toSeq
        val rendered = cols.map { c =>
          val f = back.schema(c)
          val v = f.dataType match {
            case org.apache.spark.sql.types.BinaryType => hex(col(c))
            case _ => col(c).cast("string")
          }
          coalesce(v, lit("\\N"))
        }
        val lines = back.select(
          concat_ws("\u0001", rendered: _*).as("__line"))
        // order-independent 64-bit content hash (sum of per-row xxhash64
        // mod 2^64) + row count — stable across partitionings and runs.
        // The sum runs in decimal(38,0): a LONG sum overflows ANSI mode
        // on a few thousand rows (xxhash64 values span ±9.2e18).
        val agg = lines.agg(count(lit(1)).as("n"),
          sum(xxhash64(col("__line"))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("h"))
          .head()
        val nRows = agg.getLong(0)
        val h = if (agg.isNullAt(1)) BigInt(0)
          else BigInt(agg.getDecimal(1).toBigInteger).mod(BigInt(1) << 64)
        hashes(name) = f"rows=$nRows%d hash=${h.toString(16)}%s"
        if (nRows <= 10000) {
          val sortedLines = lines.as[String](org.apache.spark.sql.Encoders.STRING)
            .collect().sorted
          Files.writeString(Paths.get(s"$outDir/$name.txt"),
            (s"# $name canonical dump — cols: ${cols.mkString(",")}\n" +
              sortedLines.mkString("\n") + "\n"))
        }
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/hashes.json"),
      hashes.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}"))
    spark.stop()
  }
}
