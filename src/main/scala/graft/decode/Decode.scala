package graft.decode

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

import graft.functions.GraftFunctions.{gunzip_if_gzip, kpl_deaggregate}
import graft.model.Schemas

/** D1–D5 multi-format normalizer (SURVEY.md §2.2): one raw Kinesis record →
  * 0..N payload strings.
  *
  *   base64 → KPL-deaggregate → gunzip → UTF-8 → CloudWatch-Logs unwrap
  *
  * The reference does this inside `kinesis.parse_records` (reference
  * lambda/main.py:89, formats per README.md:9-11). Here it is a declarative
  * column pipeline — two native expressions + built-in from_json/explode —
  * so Catalyst prunes/pipelines it and there is no shuffle: decode is
  * embarrassingly parallel and scales linearly with input partitions.
  */
object Decode {

  /** CloudWatch Logs subscription bundles are detected structurally: the
    * payload parses as JSON carrying both `messageType` and `logEvents`.
    * Only DATA_MESSAGE bundles yield payloads; CONTROL_MESSAGE (and any
    * other type) bundles are skipped entirely (reference README.md:10). */
  private def cwlStruct(text: Column): Column =
    from_json(text, Schemas.cloudWatchLogs)

  /** Normalize a DataFrame holding raw record bytes.
    *
    * @param df       input with a BinaryType column `dataCol`
    * @param dataCol  raw bytes: plain / gzip / KPL aggregate / CWL bundle
    * @return input columns + `payload: String`, one row per decoded payload
    *         (KPL aggregates and CWL bundles fan out; control messages
    *         vanish). A null `dataCol` yields no payload rows — Kinesis
    *         cannot deliver a record without data, so there is nothing to
    *         dead-letter.
    */
  def normalize(df: DataFrame, dataCol: String = "data"): DataFrame = {
    val emptyStrArray = array().cast(ArrayType(StringType))
    val text = gunzip_if_gzip(col("_kpl_rec")).cast(StringType)
    val cwl = col("_cwl")
    val isCwl = cwl.isNotNull &&
      cwl.getField("messageType").isNotNull && cwl.getField("logEvents").isNotNull
    df
      // D2: fan out KPL aggregates (plain records pass through 1:1)
      .withColumn("_kpl_rec", explode(kpl_deaggregate(col(dataCol))))
      // D3+D5: inflate gzip, decode UTF-8
      .withColumn("_text", text)
      // D4: unwrap CloudWatch Logs subscription bundles. Cheap substring
      // guards first — without them every ordinary JSON log would pay a
      // full second parse against the CWL schema.
      .withColumn("_cwl",
        when(col("_text").startsWith("{") &&
          col("_text").contains("\"messageType\"") &&
          col("_text").contains("\"logEvents\""),
          cwlStruct(col("_text"))))
      .withColumn("payload", explode(
        when(isCwl && cwl.getField("messageType") === "DATA_MESSAGE",
          cwl.getField("logEvents").getField("message"))
          .when(isCwl, emptyStrArray) // CONTROL_MESSAGE → no payloads
          .otherwise(array(col("_text")))))
      .drop("_kpl_rec", "_text", "_cwl")
  }

  /** Same normalizer for envelopes whose `data` is still base64 text
    * (Kinesis wire format, FIXTURES.md §A; D1). */
  def normalizeBase64(df: DataFrame, dataCol: String = "data"): DataFrame =
    normalize(df.withColumn("_raw", unbase64(col(dataCol))), "_raw")
      .drop("_raw")
}
