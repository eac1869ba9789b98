package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.streaming.{AvroWire, AvroWireSource, FetchEventStream}

/** Kafka-shaped integration lane: a fake broker speaking the consumer
  * CONTRACT the reference depends on (`streaming/consumer.py:1-135` —
  * partitioned (key, value) binary logs, consumer-group committed
  * offsets, poll-from-committed, commit-AFTER-process, rebalance
  * resume), delivering frames in the exact Kafka record shape
  * (`key STRING, value BINARY`) that [[AvroWireSource]] consumes.
  *
  * The point being proven end to end: commit-after-process makes the
  * transport AT-LEAST-ONCE (a crash between process and commit
  * re-delivers, never loses), and the downstream
  * `dropDuplicatesWithinWatermark` stage ([[FetchEventStream
  * .dedupedEvents]]) turns that into exactly-once — while the reverse
  * commit order (commit-before-process) demonstrably LOSES data under
  * the same crash, which is why the reference orders it the way it
  * does.
  */
class KafkaParitySpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String): Path = Files.createTempDirectory(prefix)

  /** Minimal fake broker: partitioned append-only (key, value) logs
    * with per-partition committed offsets for one consumer group. A
    * "consumer" is whoever currently polls a partition; rebalance is
    * simply another consumer resuming from the committed offset —
    * exactly the guarantee a real group coordinator provides. */
  private final class FakeBroker(nPartitions: Int) {
    private val logs =
      Vector.fill(nPartitions)(
        scala.collection.mutable.Buffer.empty[(String, Array[Byte])])
    private val committed =
      scala.collection.mutable.Map.empty[Int, Int].withDefaultValue(0)

    def produce(key: String, value: Array[Byte]): Unit =
      logs(math.floorMod(key.hashCode, nPartitions)) += ((key, value))
    /** Uncommitted records in `p`, up to `max` — poll always resumes
      * from the group's committed offset (the rebalance contract). */
    def poll(p: Int, max: Int = Int.MaxValue): Seq[(String, Array[Byte])] = {
      val end = math.min(logs(p).size.toLong, committed(p).toLong + max).toInt
      logs(p).slice(committed(p), end).toSeq
    }
    def commit(p: Int, n: Int): Unit = committed(p) += n
    def lag(p: Int): Int = logs(p).size - committed(p)
  }

  /** "Process" = deliver the polled frames downstream: append them to
    * the ingest directory in the Kafka record shape. */
  private def deliver(frames: Seq[(String, Array[Byte])], dir: Path): Unit =
    if (frames.nonEmpty)
      frames.toDF("key", "value").coalesce(1)
        .write.mode("append").parquet(dir.toString)

  private def wireFrames(ids: Seq[String]): Seq[(String, Array[Byte])] = {
    val events = ids.zipWithIndex.map { case (id, i) =>
      (id, "https://api.open-meteo.com/v1/forecast", "success",
        s"/bronze/$id.json", Map("latitude" -> "1.0"),
        1700000000000L + i * 1000L)
    }.toDF("fetch_id", "source", "status", "path", "params", "finished_at")
    // CONFLUENT-FRAMED frames (magic + schema id + Avro body) — the
    // byte layout the reference producer's AvroSerializer puts on the
    // topic (streaming/events.py:83-92), so the whole parity story
    // runs on reference-shaped bytes
    AvroWire.encodeFetchEventsFramed(events).collect()
      .map(r => (r.getString(0), r.getAs[Array[Byte]](1))).toSeq
  }

  test("commit-after-process through crash + rebalance is at-least-once; " +
      "watermark dedup downstream makes it exactly-once end to end") {
    val ingest = tmp("kafka_ingest")
    val broker = new FakeBroker(2)
    val ids = (1 to 6).map(i => s"f$i")
    val frames = wireFrames(ids)
    frames.foreach { case (k, v) => broker.produce(k, v) }
    val p0 = broker.lag(0); val p1 = broker.lag(1)
    assert(p0 > 0 && p1 > 0 && p0 + p1 == 6, "keys must spread both partitions")

    // consumer A: P0 fully processed AND committed; P1's first record
    // processed but the consumer CRASHES before its commit lands
    val a0 = broker.poll(0)
    deliver(a0, ingest); broker.commit(0, a0.size)
    val a1 = broker.poll(1, max = 1)
    deliver(a1, ingest) // ...crash here: no commit(1, 1)

    // rebalance: consumer B takes P1, resumes from the COMMITTED offset
    // → re-delivers the processed-but-uncommitted record (duplicate),
    // then drains the partition and commits
    val b1 = broker.poll(1)
    assert(b1.head._1 == a1.head._1,
      "rebalanced consumer must re-poll the uncommitted record")
    deliver(b1, ingest); broker.commit(1, b1.size)
    assert(broker.lag(0) == 0 && broker.lag(1) == 0)

    // the raw transport feed really is at-least-once: 6 + 1 duplicate
    val raw = spark.read.schema("key STRING, value BINARY")
      .parquet(ingest.toString)
    assert(raw.count() == 7, "crash must re-deliver, not lose")
    assert(raw.select("key").distinct().count() == 6)

    // end to end through the SAME streaming graph a real Kafka source
    // would feed: AvroWireSource → valid events → watermark dedup
    val deduped = FetchEventStream.dedupedEvents(
      FetchEventStream.validEvents(
        AvroWireSource(s => s.readStream
          .schema("key STRING, value BINARY").parquet(ingest.toString))
          .events(spark)))
    val q = deduped.writeStream.format("memory").queryName("kafka_parity")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("kafka_parity")
    assert(got.count() == 6, "dedup must collapse the replayed delivery")
    assert(got.select("fetch_id").as[String].collect().sorted.toSeq == ids,
      "every produced event must survive exactly once")
  }

  test("the reverse order (commit-before-process) LOSES the in-flight " +
      "record under the same crash — why the reference commits after") {
    val ingest = tmp("kafka_loss")
    val broker = new FakeBroker(1)
    wireFrames(Seq("g1", "g2")).foreach { case (k, v) => broker.produce(k, v) }
    // consumer commits its poll FIRST, crashes before processing it
    val polled = broker.poll(0, max = 1)
    broker.commit(0, polled.size) // ...crash here: nothing delivered
    // restart resumes from the committed offset — g1 is gone for good
    val rest = broker.poll(0)
    deliver(rest, ingest); broker.commit(0, rest.size)
    val keys = spark.read.schema("key STRING, value BINARY")
      .parquet(ingest.toString).select("key").as[String].collect().toSet
    assert(broker.lag(0) == 0 && keys == Set("g2"),
      "commit-before-process must demonstrate the data-loss hazard")
  }
}
