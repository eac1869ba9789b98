package graft

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.functions._

import graft.streaming.{AvroWire, FetchEventStream}

/** Avro wire-format parity for the fetch-event lane: round-trip through
  * the binary encoding, union-branch handling, dead-letter routing, and
  * field-for-field compatibility with the reference's fetch_event.avsc. */
class AvroWireSpec extends SparkTestBase {
  import spark.implicits._

  private def sampleEvents = Seq(
    ("f1", "https://api.open-meteo.com/v1/forecast", "success",
      Some("/bronze/f1.json"), Map("latitude" -> "1.5", "tz" -> "UTC"),
      1700000000000L),
    ("f2", "https://api.open-meteo.com/v1/forecast", "error",
      None: Option[String], Map("latitude" -> "-7.25"), 1700000060000L),
    ("f3", "https://api.open-meteo.com/v1/forecast", "pending",
      None: Option[String], Map.empty[String, String], 1700000120000L)
  ).toDF("fetch_id", "source", "status", "path", "params", "finished_at")

  test("encode → decode round-trips every field, null path included") {
    val wire = AvroWire.encodeFetchEvents(sampleEvents)
    assert(wire.columns.toSeq == Seq("key", "value"))
    val back = AvroWire.decodeFetchEvents(wire)
    assert(back.filter(col("valid")).count() == 3)
    // map_entries + sort: map iteration order is not part of equality
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("params", array_sort(map_entries(col("params"))))
      .select("fetch_id", "source", "status", "path", "params", "finished_at")
      .orderBy("fetch_id").collect()
    val rows = canon(back)
    val want = canon(sampleEvents
      .withColumn("finished_at", timestamp_millis(col("finished_at"))))
    assert(rows.map(_.toString).toSeq == want.map(_.toString).toSeq)
  }

  test("corrupt/truncated bytes route to the dead-letter feed; the " +
      "decoded stream feeds the parseEvents-downstream operators") {
    val good = AvroWire.encodeFetchEvents(sampleEvents).select("value")
    val bad = Seq(Array[Byte](1), Array.emptyByteArray).toDF("value")
    val decoded = AvroWire.decodeFetchEvents(good.union(bad))
    assert(decoded.count() == 5)
    assert(FetchEventStream.deadLetters(decoded).count() == 2)
    val valid = FetchEventStream.validEvents(decoded)
    assert(valid.count() == 3)
    // same downstream the JSON lane feeds: watermarked health window
    val h = FetchEventStream.windowedHealth(valid).collect()
    assert(h.map(_.getAs[Long]("n_jobs")).sum == 2) // success + error only
  }

  test("decode accepts the FLOAT branch of the params value union " +
      "(payloads from float-writing producers survive)") {
    val schema = AvroWire.fetchEventAvro
    val rec = new GenericData.Record(schema)
    rec.put("fetch_id", "ff")
    rec.put("source", "https://api.open-meteo.com/v1/forecast")
    rec.put("status",
      new GenericData.EnumSymbol(schema.getField("status").schema(), "success"))
    rec.put("path", null)
    val m = new java.util.HashMap[String, AnyRef]()
    m.put("latitude", java.lang.Float.valueOf(52.52f))
    m.put("tz", "UTC")
    rec.put("params", m)
    rec.put("finished_at", java.lang.Long.valueOf(1700000000000L))
    val buf = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(buf, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    val decoded = AvroWire.decodeFetchEvents(
      Seq(buf.toByteArray).toDF("value"))
    val row = decoded.collect().head
    assert(row.getAs[Boolean]("valid"))
    val params = row.getAs[Map[String, String]]("params")
    assert(params("latitude") == "52.52" && params("tz") == "UTC")
  }

  test("Confluent framing: reference-producer-shaped bytes (magic 0x00 " +
      "+ schema id + Avro body) decode; unknown schema ids dead-letter; " +
      "bare and framed records coexist in one feed") {
    // frame bytes BY HAND, independent of encodeFetchEventsFramed —
    // the public Confluent wire layout (magic byte, 4-byte big-endian
    // id, Avro binary), i.e. what confluent_kafka's AvroSerializer
    // (reference streaming/events.py:83-92) actually produces
    val bare = AvroWire.encodeFetchEvents(sampleEvents)
      .select("value").as[Array[Byte]].collect()
    def handFrame(id: Int, body: Array[Byte]): Array[Byte] =
      Array[Byte](0, (id >> 24).toByte, (id >> 16).toByte,
        (id >> 8).toByte, id.toByte) ++ body
    val framedKnown = bare.map(handFrame(1, _))       // id 1 = known
    val framedUnknown = bare.take(1).map(handFrame(7, _)) // id 7 = unknown
    val feed = (framedKnown ++ framedUnknown ++ bare).toSeq.toDF("value")
    val decoded = AvroWire.decodeFetchEvents(feed)
    // 3 framed-known + 3 bare decode; the unknown-id record dead-letters
    assert(decoded.filter(col("valid")).count() == 6)
    val dead = FetchEventStream.deadLetters(decoded).collect()
    assert(dead.length == 1)
    assert(dead(0).getAs[Array[Byte]]("raw").sameElements(framedUnknown(0)),
      "the dead-letter row must carry the undecodable original bytes")
    // framed and bare decode to the SAME records
    val ids = decoded.filter(col("valid"))
      .groupBy("fetch_id").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ids == Map("f1" -> 2L, "f2" -> 2L, "f3" -> 2L))
  }

  test("encodeFetchEventsFramed round-trips through the framed decoder " +
      "and its header is the Confluent layout byte-for-byte") {
    val framed = AvroWire.encodeFetchEventsFramed(sampleEvents, schemaId = 1)
    val values = framed.select("value").as[Array[Byte]].collect()
    for (v <- values) {
      assert(v(0) == 0x00.toByte)
      assert(v.slice(1, 5).sameElements(Array[Byte](0, 0, 0, 1)))
    }
    val back = AvroWire.decodeFetchEvents(framed)
    assert(back.filter(col("valid")).count() == 3)
    assert(back.filter(!col("valid")).count() == 0)
  }

  test("wire schema is field-for-field compatible with the reference's " +
      "fetch_event.avsc (both read/write directions)") {
    val refPath = java.nio.file.Paths.get(
      "/root/reference/streaming/schemas/fetch_event.avsc")
    assume(java.nio.file.Files.exists(refPath),
      "reference .avsc not present in this environment")
    val ref = new Schema.Parser().parse(
      java.nio.file.Files.readString(refPath))
    val ours = AvroWire.fetchEventAvro
    // parsing canonical form strips doc/aliases — exactly the wire
    // contract (what a binary decoder needs to agree on)
    import org.apache.avro.SchemaNormalization
    assert(SchemaNormalization.toParsingForm(ours) ==
      SchemaNormalization.toParsingForm(ref),
      s"wire contract drifted:\nours=$ours\nref =$ref")
    // a record written with OUR schema resolves under the REFERENCE
    // schema and vice versa
    import org.apache.avro.SchemaCompatibility
    def compatible(reader: Schema, writer: Schema): Boolean =
      SchemaCompatibility.checkReaderWriterCompatibility(reader, writer)
        .getType == SchemaCompatibility.SchemaCompatibilityType.COMPATIBLE
    assert(compatible(ref, ours), "reference cannot read our records")
    assert(compatible(ours, ref), "we cannot read reference records")
  }
}
