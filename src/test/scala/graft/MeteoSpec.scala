package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._

import graft.meteo._
import graft.ops.Upsert

class MeteoSpec extends SparkTestBase {
  import spark.implicits._

  /** Synthetic open-meteo payload shaped like the reference's fixture
    * (tests/fixtures/meteo-payload.json): location + parallel hourly
    * arrays; values are deterministic functions of the hour index. */
  def payloadJson(lat: Double, lon: Double, hours: Int, base: Double = 20.0): String = {
    val times = (0 until hours).map(h => f""""2025-12-01T$h%02d:00"""").mkString(",")
    def arr(f: Int => String) = (0 until hours).map(f).mkString(",")
    s"""{"latitude":$lat,"longitude":$lon,"generationtime_ms":0.4,
       |"hourly":{"time":[$times],
       |"temperature_2m":[${arr(h => (base + h * 0.1).toString)}],
       |"precipitation":[${arr(h => (h % 3 * 0.1).toString)}],
       |"soil_temperature_18cm":[${arr(_ => "28.6")}],
       |"soil_moisture_9_to_27cm":[${arr(_ => "0.0")}],
       |"wind_speed_10m":[${arr(h => (10.0 + h).toString)}],
       |"wind_direction_10m":[${arr(h => (h * 10 % 360).toString)}],
       |"cloud_cover":[${arr(h => (h * 7 % 100).toString)}]}}""".stripMargin
  }

  test("normalizer explodes parallel hourly arrays into one row per hour") {
    val df = Seq(("f1", payloadJson(3.04, 5.06, 24)))
      .toDF("fetch_id", "payload")
    val obs = PayloadNormalizer.normalize(df)
    assert(obs.count() == 24)
    assert(obs.columns.toSeq == Seq("fetch_id", "latitude", "longitude",
      "timestamp") ++ PayloadNormalizer.metricMap.map(_._2))
    val first = obs.orderBy("timestamp").head()
    assert(first.getAs[Double]("latitude") == 3.0) // rounded to 1 dp
    assert(first.getAs[Double]("longitude") == 5.1)
    assert(first.getAs[Double]("temperature_2m".replace("_2m", "")) == 20.0)
    assert(first.getAs[Timestamp]("timestamp").toString.startsWith("2025-12-01 00:00"))
  }

  test("normalizer handles nulls in metric arrays (Optional fields)") {
    val json = """{"latitude":1.0,"longitude":2.0,"hourly":{
      |"time":["2025-12-01T00:00","2025-12-01T01:00"],
      |"temperature_2m":[27.1,null],"precipitation":[null,0.1],
      |"soil_temperature_18cm":[1.0,1.0],"soil_moisture_9_to_27cm":[0.0,0.0],
      |"wind_speed_10m":[5.0,6.0],"wind_direction_10m":[100,200],
      |"cloud_cover":[50,60]}}""".stripMargin
    val obs = PayloadNormalizer.normalize(Seq(("f1", json)).toDF("fetch_id", "payload"))
      .orderBy("timestamp").collect()
    assert(obs.length == 2)
    assert(obs(0).isNullAt(obs(0).fieldIndex("precipitation")))
    assert(obs(1).isNullAt(obs(1).fieldIndex("temperature")))
  }

  test("normalizer tolerates a payload missing a whole metric array") {
    val json = """{"latitude":1.0,"longitude":2.0,"hourly":{
      |"time":["2025-12-01T00:00","2025-12-01T01:00"],
      |"temperature_2m":[27.1,26.0],"precipitation":[0.0,0.1],
      |"soil_temperature_18cm":[1.0,1.0],"soil_moisture_9_to_27cm":[0.0,0.0],
      |"wind_speed_10m":[5.0,6.0],"wind_direction_10m":[100,200]}}""".stripMargin
    // cloud_cover absent entirely -> null column, rows still emitted per hour
    val obs = PayloadNormalizer.normalize(Seq(("f1", json)).toDF("fetch_id", "payload"))
      .orderBy("timestamp").collect()
    assert(obs.length == 2)
    assert(obs.forall(_.isNullAt(obs.head.fieldIndex("cloud_cover"))))
    assert(obs(0).getAs[Double]("temperature") == 27.1)
  }

  test("normalizeTyped yields a compile-time-safe Dataset[Observation]") {
    val ds = PayloadNormalizer.normalizeTyped(
      Seq(("f1", payloadJson(1.0, 2.0, 3))).toDF("fetch_id", "payload"))
    val obs: Seq[MeteoSchemas.Observation] = ds.collect().toSeq
    assert(obs.length == 3)
    assert(obs.forall(_.latitude == 1.0))
    assert(obs.map(_.temperature).forall(_.isDefined))
  }

  test("upsert merge: incoming wins on key conflict, others survive") {
    val existing = Seq(
      (1.0, 2.0, Timestamp.valueOf("2025-12-01 00:00:00"), 10.0, 1L),
      (1.0, 2.0, Timestamp.valueOf("2025-12-01 01:00:00"), 11.0, 1L)
    ).toDF("latitude", "longitude", "timestamp", "temperature", "version")
    val incoming = Seq(
      (1.0, 2.0, Timestamp.valueOf("2025-12-01 01:00:00"), 99.0, 2L),
      (1.0, 2.0, Timestamp.valueOf("2025-12-01 02:00:00"), 12.0, 2L)
    ).toDF("latitude", "longitude", "timestamp", "temperature", "version")
    val merged = Upsert.mergeByKey(existing, incoming,
      Seq("latitude", "longitude", "timestamp"), col("version"))
    assert(merged.count() == 3)
    val at1 = merged.filter(col("timestamp") === "2025-12-01 01:00:00").head()
    assert(at1.getAs[Double]("temperature") == 99.0)
  }

  test("partial upsert replays the reference ON CONFLICT column list: " +
      "updated columns take the refetch, soil/cloud columns and " +
      "created_at keep the first write, updated_at bumps; state merge " +
      "is order-independent and equals the one-shot replay") {
    // the reference's exact split (etl/load.py:45-54): conflict updates
    // {timezone, temperature, precipitation, wind_speed, fetch_id};
    // soil/wind-direction/cloud-cover keep the insert's values
    val writes = Seq(
      // (lat, lon, ts) key; fetch 1 then a conflicting refetch (fetch 2)
      (1.0, 2.0, Timestamp.valueOf("2025-12-01 00:00:00"), 1L,
        "UTC", 10.0, 0.1, 5.0, 7.5, 0.33, 180.0, 50.0),
      (1.0, 2.0, Timestamp.valueOf("2025-12-01 00:00:00"), 2L,
        "CET", 11.5, 0.2, 6.0, 8.8, 0.44, 190.0, 60.0),
      // un-conflicted second location from fetch 2 only
      (3.0, 4.0, Timestamp.valueOf("2025-12-01 00:00:00"), 2L,
        "UTC", 20.0, 0.0, 3.0, 6.0, 0.5, 90.0, 10.0)
    ).toDF("latitude", "longitude", "timestamp", "fetch_id", "timezone",
      "temperature", "precipitation", "wind_speed",
      "soil_temperature_18cm", "soil_moisture_9_to_27cm",
      "wind_direction_10m", "cloud_cover")
    val keys = Seq("latitude", "longitude", "timestamp")
    val upd = Seq("timezone", "temperature", "precipitation",
      "wind_speed", "fetch_id")
    val keep = Seq("soil_temperature_18cm", "soil_moisture_9_to_27cm",
      "wind_direction_10m", "cloud_cover")
    val merged = Upsert.partialLatestByKey(
      writes, keys, col("fetch_id"), Nil, upd, keep)
    assert(merged.count() == 2)
    val r = merged.filter(col("latitude") === 1.0).head()
    // updated columns follow the refetch
    assert(r.getAs[String]("timezone") == "CET")
    assert(r.getAs[Double]("temperature") == 11.5)
    assert(r.getAs[Double]("wind_speed") == 6.0)
    assert(r.getAs[Long]("fetch_id") == 2L)
    // preserved columns and created_at keep the first write
    assert(r.getAs[Double]("soil_temperature_18cm") == 7.5)
    assert(r.getAs[Double]("wind_direction_10m") == 180.0)
    assert(r.getAs[Double]("cloud_cover") == 50.0)
    assert(r.getAs[Long]("created_at") == 1L)
    assert(r.getAs[Long]("updated_at") == 2L)

    // incremental lane: per-batch states folded with partialMergeStates
    // equal the one-shot replay — in order AND out of order
    val b1 = writes.filter(col("fetch_id") === 1L)
    val b2 = writes.filter(col("fetch_id") === 2L)
    def state(df: org.apache.spark.sql.DataFrame) =
      Upsert.partialLatestByKey(df, keys, col("fetch_id"), Nil, upd, keep)
    val want = merged.collect().map(_.toString).sorted.toSeq
    for (pair <- Seq((b1, b2), (b2, b1))) {
      val folded = Upsert.partialMergeStates(
        state(pair._1), state(pair._2), keys, upd, keep)
      assert(folded.collect().map(_.toString).sorted.toSeq == want,
        s"fold order ${pair._1.hashCode}")
    }
  }

  test("partial-upsert fold with ord structs: a VERSION tie across " +
      "batches merges like the one-shot replay, in either fold order") {
    // same key, same version (ts=5) in BOTH batches — only the
    // tie-break (event_id) differs. A merge comparing created/updated
    // alone cannot order these; the ord-struct merge can.
    val writes = Seq(
      (1L, 5L, 10L, "a10", "p10"), // batch 0 (event_id % 2 == 0)
      (1L, 5L, 11L, "a11", "p11"), // batch 1 — ties on (key, version)
      (1L, 3L, 12L, "a12", "p12"), // batch 0, earlier version
      (2L, 7L, 13L, "a13", "p13")
    ).toDF("k", "v", "eid", "u", "p")
    val keys = Seq("k")
    def state(df: org.apache.spark.sql.DataFrame) =
      Upsert.partialLatestByKey(df, keys, col("v"), Seq(col("eid")),
        Seq("u"), Seq("p"), emitOrd = true)
    val oneShot = state(writes)
      .drop(Upsert.ordCreatedCol, Upsert.ordUpdatedCol)
      .collect().map(_.toString).sorted.toSeq
    val b0 = writes.filter(col("eid") % 2 === 0)
    val b1 = writes.filter(col("eid") % 2 === 1)
    for (pair <- Seq((b0, b1), (b1, b0))) {
      val folded = Upsert.partialMergeStates(
          state(pair._1), state(pair._2), keys, Seq("u"), Seq("p"),
          useOrd = true)
        .drop(Upsert.ordCreatedCol, Upsert.ordUpdatedCol)
        .collect().map(_.toString).sorted.toSeq
      assert(folded == oneShot, s"fold != one-shot: $folded vs $oneShot")
    }
    // sanity: the tie resolved BY the tie-break — eid 11 wins the update
    // lane, eid 12 (earliest version) keeps the preserve lane
    val r = state(writes).filter(col("k") === 1L).head()
    assert(r.getAs[String]("u") == "a11")
    assert(r.getAs[String]("p") == "p12")
  }

  test("fetch ledger lifecycle: pending -> success/error, rollup by status") {
    val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
    val t1 = Timestamp.valueOf("2026-01-01 00:01:00")
    val ledger0 = FetchLedger.begin(spark, Seq(
      ("f1", "https://api.example/v1", Map("latitude" -> "1.0")),
      ("f2", "https://api.example/v1", Map("latitude" -> "2.0"))), t0)
    val outcomes = Seq(
      MeteoSchemas.FetchTransition("f1", 1L, t1, "https://api.example/v1",
        Map("latitude" -> "1.0"), MeteoSchemas.FetchStatus.Success,
        Some(200), None, Some("/lake/bronze/2026/01/01/f1.json")),
      MeteoSchemas.FetchTransition("f2", 1L, t1, "https://api.example/v1",
        Map("latitude" -> "2.0"), MeteoSchemas.FetchStatus.Error,
        Some(429), Some("""{"error":"rate limited"}"""), None)).toDF()
    val ledger = FetchLedger.finish(ledger0, outcomes)

    val state = FetchLedger.currentState(ledger).collect()
    assert(state.length == 2)
    assert(state.forall(_.getAs[String]("status") != MeteoSchemas.FetchStatus.Pending))
    assert(FetchLedger.finished(ledger).count() == 2)
    val rollup = FetchLedger.statusRollup(ledger).collect()
    assert(rollup.map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("error" -> 1L, "success" -> 1L))
  }

  test("extract-error taxonomy end-to-end: corrupt payload file -> " +
      "classified ledger transitions with response_status + error_data " +
      "-> dead-letter parquet") {
    val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
    val t1 = Timestamp.valueOf("2026-01-01 00:01:00")
    val url = "https://api.example/v1"
    // four attempts: clean, HTTP 404 (html body), truncated payload
    // (transport fine, body cut mid-object), sink LoadError
    val dir = Files.createTempDirectory("graft-extract-err")
    val goodBody = payloadJson(1.0, 2.0, 2)
    val corruptBody = goodBody.substring(0, goodBody.length / 3)
    Files.writeString(dir.resolve("f3.json"), corruptBody)
    val attempts = Seq(
      ("f1", 200, goodBody, false),
      ("f2", 404, "<html>not found</html>", false),
      ("f3", 200, Files.readString(dir.resolve("f3.json")), false),
      ("f4", 200, goodBody, true)
    ).toDF("fetch_id", "http_status", "body", "load_error")
    val classified = ExtractErrors.classify(attempts,
      from_json(col("body"), MeteoSchemas.payloadSchema).isNotNull &&
        from_json(col("body"), MeteoSchemas.payloadSchema)("latitude").isNotNull)

    // ledger: pending rows then the classified outcomes as transitions
    val ledger = FetchLedger.finish(
      FetchLedger.begin(spark,
        Seq("f1", "f2", "f3", "f4").map(id => (id, url, Map("q" -> id))), t0),
      ExtractErrors.toTransitions(classified, lit(1L), lit(t1), lit(url),
        typedLit(Map.empty[String, String]), concat(lit("/bronze/"),
          col("fetch_id"))))
    val state = FetchLedger.currentState(ledger).collect()
      .map(r => r.getAs[String]("fetch_id") ->
        (r.getAs[String]("status"), Option(r.getAs[Integer]("response_status")),
          Option(r.getAs[String]("error_data")))).toMap
    assert(state("f1") == (("success", Some(200), None)))
    assert(state("f1") != null &&
      FetchLedger.currentState(ledger).filter(col("fetch_id") === "f1")
        .head().getAs[String]("payload_path") == "/bronze/f1")
    assert(state("f2") == (("error", Some(404),
      Some("<html>not found</html>"))))
    assert(state("f3") == (("error", Some(200),
      Some("""{"error":"Invalid JSON"}"""))))
    assert(state("f4") == (("error", Some(200),
      Some("""{"error":"Load error"}"""))))

    // dead-letter parquet: the three failures park with raw bodies
    val dlDir = dir.resolve("dead").toString
    ExtractErrors.deadLetters(classified).write.parquet(dlDir)
    val dl = spark.read.parquet(dlDir)
    assert(dl.count() == 3)
    assert(dl.filter(col("fetch_id") === "f3").head()
      .getAs[String]("body") == corruptBody)
    assert(dl.columns.toSet ==
      Set("fetch_id", "error_kind", "response_status", "body"))
  }

  test("bronze lake: date-partitioned write, partition-pruned read") {
    val root = Files.createTempDirectory("bronze").toString
    val df = Seq(
      ("f1", payloadJson(1.0, 2.0, 2), Timestamp.valueOf("2026-01-01 10:00:00")),
      ("f2", payloadJson(3.0, 4.0, 2), Timestamp.valueOf("2026-01-02 10:00:00"))
    ).toDF("fetch_id", "payload", "fetched_at")
    BronzeLake.write(df, root)
    assert(BronzeLake.read(spark, root).count() == 2)
    val oneDay = BronzeLake.read(spark, root, Some((2026, 1, 1)))
    assert(oneDay.count() == 1)
    val scan = oneDay.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), s"expected partition pruning:\n$scan")
    // end-to-end: bronze -> normalize -> silver observations
    val obs = PayloadNormalizer.normalize(
      BronzeLake.read(spark, root).select("fetch_id", "payload"))
    assert(obs.count() == 4)
  }

  test("dashboard: locations count and recent feed on observations") {
    val obs = PayloadNormalizer.normalize(Seq(
      ("f1", payloadJson(1.0, 2.0, 3)),
      ("f2", payloadJson(5.0, 6.0, 3))).toDF("fetch_id", "payload"))
    assert(Dashboard.countLocations(obs) == 2)
    assert(Dashboard.recent(obs, 4).count() == 4)
    val d = Dashboard.describe(obs, Seq("temperature", "wind_speed")).collect()
    assert(d.length == 2)
    assert(d.forall(_.getAs[Long]("n") == 6)) // 2 payloads x 3 hours
    assert(d.head.getAs[Double]("std") > 0)
  }

  test("incremental state merge equals one-shot aggregation, any batching") {
    import graft.ops.IncrementalAgg
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val oneShot = IncrementalAgg.finalize(
      IncrementalAgg.state(ev, Seq("event_type"), "value"), Seq("event_type"))
      .orderBy("event_type").collect()
    // three arbitrary batches by user_id residue — a partitioning the
    // time-based cutover never produces, merged in a different grouping
    val parts = (0 to 2).map(r =>
      IncrementalAgg.state(ev.filter(col("user_id") % 3 === r),
        Seq("event_type"), "value"))
    val merged = IncrementalAgg.merge(
      Seq(IncrementalAgg.merge(parts.take(2), Seq("event_type")), parts(2)),
      Seq("event_type"))
    val inc = IncrementalAgg.finalize(merged, Seq("event_type"))
      .orderBy("event_type").collect()
    assert(inc.toSeq == oneShot.toSeq)
    assert(oneShot.forall(_.getAs[Double]("var_pop") > 0))
  }

  test("profile computes n/nulls/distinct/min/max per column in one pass") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), Some(2.5)),
      (2L, None, Some(1.0)),
      (3L, Some("a"), None),
      (4L, Some("b"), Some(2.5))).toDF("id", "s", "v")
    val p = graft.ops.Profile.profile(df, Seq("id", "s", "v"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p("id").getLong(1) == 4 && p("id").getLong(2) == 0 &&
      p("id").getLong(3) == 4)
    assert(p("s").getLong(2) == 1 && p("s").getLong(3) == 2)
    assert(p("s").getString(4) == "a" && p("s").getString(5) == "b")
    assert(p("v").getLong(2) == 1 && p("v").getLong(3) == 2 &&
      p("v").getString(4) == "1.0" && p("v").getString(5) == "2.5")
    // single scan: exactly one leaf in the plan (the table is read once);
    // and no Sort anywhere — the full-cardinality aggregate must be
    // hash-based, the keyless global aggregate needs no ordering
    val plan = graft.ops.Profile.profile(df, Seq("id", "s", "v"))
      .queryExecution.executedPlan
    assert(plan.collectLeaves().size == 1,
      s"expected one scan, got ${plan.collectLeaves().size}")
    val sorts = plan.collect {
      case s: org.apache.spark.sql.execution.SortExec => s }
    assert(sorts.isEmpty, s"expected no Sort, got:\n$plan")
  }
}
