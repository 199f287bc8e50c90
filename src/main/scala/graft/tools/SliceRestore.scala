package graft.tools

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.SparkSession

/** Restore-side validation: read a SliceWriter output directory back,
  * register each table as a temp view, and check the data against the
  * manifest (count per table) — the parquet analog of the reference's
  * restore + row-count accounting (slice_db/restore.py). Exits nonzero
  * on any mismatch.
  *
  * Usage: SliceRestore <sliceDir>
  */
object SliceRestore {
  def main(args: Array[String]): Unit = {
    val sliceDir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val manifest = new ObjectMapper()
      .readTree(java.nio.file.Files.readString(java.nio.file.Paths.get(s"$sliceDir/manifest.json")))
    var failed = false
    manifest.get("tables").elements().asScala.foreach { t =>
      val id = t.get("id").asText()
      val expected = t.get("row_count").asLong()
      val df = spark.read.parquet(s"$sliceDir/data/$id")
      df.createOrReplaceTempView(id)
      val actual = df.count()
      val ok = actual == expected
      if (!ok) failed = true
      println(s"[restore] $id: manifest=$expected data=$actual ${if (ok) "OK" else "MISMATCH"}")
    }
    spark.stop()
    if (failed) sys.exit(1)
  }
}
