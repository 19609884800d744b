package graft

import graft.pipeline.{TransactionAvro, TransactionPipeline}
import graft.pipeline.TransactionPipeline.Transaction
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Reference-pipeline replay (SURVEY.md §2.3 Q29): the canonical 5-row
  * fixture (FIXTURES.md §A.3, from BaseTransactionTest.java:145-156) must
  * produce 4 rows with amountInUsd = 100.0, 220.0, 195.0, 275.0 — the
  * CANCELLED row filtered, the PENDING row passing (the filter is only
  * `status <> 'CANCELLED'`, TransactionFlinkTest.java:87-93).
  */
class PipelineSpec extends SparkSpecBase {

  private def ts(i: Int) =
    java.sql.Timestamp.valueOf(s"2026-01-01 00:00:0$i")

  private def fixture: Seq[Transaction] = Seq(
    Transaction("t1", 100.0, "USD", ts(1), Some("Test transaction"),
      "Test Merchant", Some("Test"), "APPROVED", "u1", Some(Map.empty)),
    Transaction("t2", 200.0, "EUR", ts(2), Some("Test transaction"),
      "Test Merchant", Some("Test"), "APPROVED", "u2", Some(Map.empty)),
    Transaction("t3", 150.0, "GBP", ts(3), Some("Test transaction"),
      "Test Merchant", Some("Test"), "APPROVED", "u3", Some(Map.empty)),
    Transaction("t4", 300.0, "USD", ts(4), Some("Test transaction"),
      "Test Merchant", Some("Test"), "CANCELLED", "u4", Some(Map.empty)),
    Transaction("t5", 250.0, "EUR", ts(5), Some("Test transaction"),
      "Test Merchant", Some("Test"), "PENDING", "u5", Some(Map.empty)))

  private def expected = Map(
    "t1" -> 100.0, "t2" -> 220.0, "t3" -> 195.0, "t5" -> 275.0)

  test("batch transform reproduces the reference fixture contract") {
    import spark.implicits._
    val out = TransactionPipeline.transform(fixture.toDF())
      .collect().map(r => (r.getAs[String]("id"), r.getAs[Double]("amountInUsd")))
      .toMap
    assert(out.keySet == expected.keySet) // t4 (CANCELLED) gone, t5 (PENDING) kept
    expected.foreach { case (id, usd) => assert(math.abs(out(id) - usd) < 0.001) }
  }

  test("streaming replay over MemoryStream matches the batch contract") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val src = MemoryStream[Transaction]
    src.addData(fixture: _*)
    val q = TransactionPipeline.transform(src.toDF())
      .writeStream.format("memory").queryName("q29").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("q29").collect()
    assert(rows.length == 4)
    val byId = rows.map(r =>
      r.getAs[String]("id") -> r.getAs[Double]("amountInUsd")).toMap
    assert(byId.keySet == expected.keySet)
    // 0.001 tolerance like the reference (TransactionFlinkTest.java:127-136)
    expected.foreach { case (id, usd) => assert(math.abs(byId(id) - usd) < 0.001) }
    // processingTimestamp only null-checked, like the reference
    // (TransactionConsumerTest.java:126)
    assert(rows.forall(_.getAs[java.sql.Timestamp]("processingTimestamp") != null))
  }

  test("streaming wire replay: framed Avro in → decode → transform → framed Avro out") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    TransactionAvro.registerUdfs(spark)
    // simulate the Kafka value column: Confluent-framed Avro bytes
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Array[Byte]]
    src.addData(fixture.map(t => TransactionAvro.encodeTransaction(t)): _*)
    val decoded = src.toDF()
      .select(org.apache.spark.sql.functions.call_udf(
        "decode_transaction", org.apache.spark.sql.functions.col("value")).as("t"))
      .select("t.*")
    val out = TransactionPipeline.transform(decoded)
    val encoded = out.select(org.apache.spark.sql.functions.call_udf(
      "encode_approved",
      org.apache.spark.sql.functions.struct(out.columns.map(
        org.apache.spark.sql.functions.col).toIndexedSeq: _*),
      org.apache.spark.sql.functions.lit(2)).as("value"))
    val q = encoded.writeStream.format("memory").queryName("wire")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val results = spark.table("wire").as[Array[Byte]].collect()
      .map(TransactionAvro.decodeApproved)
    assert(results.length == 4)
    val byId = results.map(a => a.id -> a.amountInUsd).toMap
    expected.foreach { case (id, usd) => assert(math.abs(byId(id) - usd) < 0.001) }
    assert(results.forall(_.processingTimestamp != null))
  }

  test("Confluent-framed Avro round-trips every fixture row") {
    fixture.foreach { t =>
      val bytes = TransactionAvro.encodeTransaction(t, schemaId = 7)
      assert(bytes(0) == 0x00)
      val (id, _) = TransactionAvro.unframe(bytes)
      assert(id == 7)
      assert(TransactionAvro.decodeTransaction(bytes) == t)
    }
  }

  test("decode rejects unframed payloads") {
    intercept[IllegalArgumentException] {
      TransactionAvro.unframe(Array[Byte](1, 2, 3))
    }
  }

  test("schema evolution: decode an old-writer payload against the current reader") {
    import org.apache.avro.SchemaBuilder
    import org.apache.avro.generic.{GenericData, GenericDatumWriter}
    import org.apache.avro.io.EncoderFactory
    // v0 writer: no description/category/metadata fields
    val writerV0 = SchemaBuilder.record("Transaction").namespace("graft.avro")
      .fields()
      .requiredString("id").requiredDouble("amount").requiredString("currency")
      .name("timestamp").`type`(org.apache.avro.LogicalTypes.timestampMillis()
        .addToSchema(org.apache.avro.Schema.create(org.apache.avro.Schema.Type.LONG)))
      .noDefault()
      .requiredString("merchant").requiredString("status").requiredString("userId")
      .endRecord()
    val rec = new GenericData.Record(writerV0)
    rec.put("id", "t1"); rec.put("amount", 5.0); rec.put("currency", "EUR")
    rec.put("timestamp", 1700000000000L); rec.put("merchant", "m")
    rec.put("status", "APPROVED"); rec.put("userId", "u")
    val out = new java.io.ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[org.apache.avro.generic.GenericRecord](writerV0)
      .write(rec, enc)
    enc.flush()
    val framed = TransactionAvro.frame(1, out.toByteArray)
    val t = TransactionAvro.decodeTransactionEvolved(framed, writerV0)
    assert(t.id == "t1" && t.amount == 5.0 && t.currency == "EUR")
    assert(t.description.isEmpty && t.category.isEmpty && t.metadata.isEmpty)
  }

  test("case-class encoder nullability mirrors the declared DDL (SURVEY §1.3)") {
    val schema = org.apache.spark.sql.Encoders.product[Transaction].schema
    def nullable(f: String) = schema(f).nullable
    // Option[_] fields are the declared-nullable ones
    assert(nullable("description") && nullable("category") && nullable("metadata"))
    assert(!nullable("amount")) // primitives stay non-null
  }

  test("avro schemas declare millisecond timestamps (parity with TIMESTAMP(3))") {
    val f = TransactionAvro.transactionSchema.getField("timestamp").schema()
    assert(f.getLogicalType.getName == "timestamp-millis")
  }
}
