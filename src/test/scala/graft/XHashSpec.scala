package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-13 native h60 kernel ([[graft.functions.Md5Prefix60]])
  * to the round-1..12 column formula it replaces: the h60 VALUE is part
  * of the oracle contract (fingerprints, MinHash bases, band keys,
  * mix/split gates all replay `CAST(('0x' || substring(md5(x), 1, 15))
  * AS BIGINT)` in DuckDB SQL), so the optimized kernel must agree
  * bit-for-bit on every input class the corpus can produce. */
class XHashSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("native h60 equals the legacy conv(substring(md5)) formula") {
    val edge = Seq(
      "", " ", "  ", "a", "hello world", "mix:42", "split:0",
      "a b c d e f g", "éü中文 unicode",
      "0:some doc text", (1 to 200).map(_ => "tok").mkString(" "))
    val fromCorpus = MiniData.dir
    val docTexts = spark.read.parquet(s"$fromCorpus/documents.parquet")
      .select(col("text").as("s"))
    val df = edge.toDF("s").unionByName(docTexts)
      .select(col("s"), XHash.h60(col("s")).as("n"),
        XHash.h60Legacy(col("s")).as("l"))
    val bad = df.filter(col("n") =!= col("l") || col("n") < 0).collect()
    assert(bad.isEmpty, s"h60 mismatch: ${bad.take(3).mkString(";")}")
    // concat inputs exactly as the fingerprint/mix gates build them
    val gate = spark.range(0, 1000)
      .select(concat(lit("mix:"), col("id").cast("string")).as("s"))
      .select(XHash.h60(col("s")).as("n"), XHash.h60Legacy(col("s")).as("l"))
      .filter(col("n") =!= col("l")).count()
    assert(gate == 0)
  }
}
