package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{AvroChangeModel, CdcOps, ChangeModel}

/** A1-Avro (r15 verdict task 6): the binary-Avro CDC feed decodes to
  * the JSON path's exact frames, drives the existing pipeline
  * unchanged, works in-stream, and is PERMISSIVE on malformed bytes.
  */
class AvroCdcSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession =
    graft.GraftSession.local(cores = 4, appName = "avro-cdc-spec")

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("A1-Avro: decode equals the JSON parse frame exactly") {
    val json = CdcOps.parse(ChangeModel.linesTable(spark, sf))
    val avro = AvroChangeModel.parseAvro(
      AvroChangeModel.avroLinesTable(spark, sf))
    assert(avro.schema.map(f => (f.name, f.dataType)) ===
      json.schema.map(f => (f.name, f.dataType)))
    assert(sortedRows(avro) === sortedRows(json))
  }

  test("A3 over Avro: snapshot is byte-identical to the JSON path's") {
    assert(sortedRows(CdcQueries.qCdcUpsertAvro(spark, sf)) ===
      sortedRows(CdcQueries.qCdcUpsert(spark, sf)))
  }

  test("in-stream: the decode runs under Structured Streaming and matches batch") {
    val landed = AvroChangeModel.avroLinesTable(spark, sf)
    // the landed table's root is corpus-fingerprinted; recover it from
    // the frame's file list so the stream reads the exact same bytes
    val root = landed.inputFiles.head.replaceFirst("^file:", "")
      .replaceFirst("/[^/]+$", "")
    val streamed = AvroChangeModel.parseAvro(
      spark.readStream.schema(landed.schema).parquet(root))
    val q = streamed.writeStream.format("memory")
      .queryName("avro_cdc_stream").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("avro_cdc_stream")
    val want = AvroChangeModel.parseAvro(landed)
    assert(sortedRows(got) === sortedRows(want))
  }

  test("PERMISSIVE: malformed bytes decode to a null record, not a crash") {
    import spark.implicits._
    val bad = Seq(
      Array[Byte](1, 2, 3),             // truncated garbage
      Array.empty[Byte]                 // empty body
    ).toDF("body")
    val out = AvroChangeModel.parseAvro(bad)
    assert(out.count() === 2L)
    assert(out.filter(col("id").isNotNull || col("op_type").isNotNull)
      .count() === 0L)
  }
}
