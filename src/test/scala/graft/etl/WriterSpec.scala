package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Partitioned-write semantics (SURVEY §4.2 flags static vs dynamic
  * overwrite as a scale trap) and schema-evolution reads.
  */
class WriterSpec extends SparkTestBase {
  import spark.implicits._

  private def frame(rows: (String, Int)*) = rows.toDF("part", "v")

  test("static overwrite replaces the WHOLE directory (reference parity)") {
    val dir = Files.createTempDirectory("graft_static").toString
    frame(("a", 1), ("b", 2)).write.mode("overwrite").partitionBy("part").parquet(dir)
    // second write contains only partition a — static mode drops b entirely
    frame(("a", 10)).write.mode("overwrite").partitionBy("part").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.select("part").distinct().as[String].collect().toSeq === Seq("a"))
  }

  test("dynamic overwrite replaces only the partitions present in the write") {
    val dir = Files.createTempDirectory("graft_dynamic").toString
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      frame(("a", 1), ("b", 2)).write.mode("overwrite").partitionBy("part").parquet(dir)
      frame(("a", 10)).write.mode("overwrite").partitionBy("part").parquet(dir)
      val back = spark.read.parquet(dir)
        .collect().map(r => r.getAs[String]("part") -> r.getAs[Int]("v")).toMap
      // partition b survives; partition a is replaced — the scale-friendly
      // incremental-backfill behavior
      assert(back === Map("a" -> 10, "b" -> 2))
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
  }

  test("mergeSchema reads across evolved schemas") {
    val dir = Files.createTempDirectory("graft_evolve").toString
    Seq((1L, "x")).toDF("id", "a").write.parquet(s"$dir/v1")
    Seq((2L, "y", 3.5)).toDF("id", "a", "b").write.parquet(s"$dir/v2")
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/v1", s"$dir/v2")
    assert(merged.columns.sorted.toSeq === Seq("a", "b", "id"))
    val rows = merged.orderBy("id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("b"))) // old file: b is null
    assert(rows(1).getDouble(rows(1).fieldIndex("b")) === 3.5)
  }
}
