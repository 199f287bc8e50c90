package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.SliceResult

/** Slice sink: partitioned parquet segments + a JSON manifest — the
  * Spark-native analog of the reference's ZIP-of-segments output
  * (slice_db/slice.py:69-104, manifest format slice_db/formats/
  * manifest.py).
  *
  * Rows stream from executors straight to parquet (never through the
  * driver); only the manifest — per-table counts and max keys, a few
  * rows of metadata — is collected. At 100 TB each table lands as many
  * parquet files sized by the upstream partitioning.
  */
object SliceWriter {

  /** @param scrub per-table output transform (e.g. a
    *   [[graft.functions.ScrubConfig]]) applied while dumping — the
    *   reference scrubs during COPY-out, never in place.
    * @param format segment format (parquet | orc | csv | json) */
  def write(result: SliceResult, outDir: String,
      scrub: (String, org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame =
        (_, df) => df,
      format: String = "parquet"): Unit = {
    result.allRows.foreach { case (table, df) =>
      Formats.write(scrub(table, df), s"$outDir/data/$table", format)
    }
    val counts = result.manifest.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val seqs = result.sequences.collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    val tables = counts.keys.toSeq.sorted.map { t =>
      val lv = seqs.get(t).flatMap(Option(_)).map(_.toString).getOrElse("null")
      s"""    {"id": "$t", "row_count": ${counts(t)}, "last_value": $lv}"""
    }
    val json = tables.mkString("{\n  \"tables\": [\n", ",\n", "\n  ]\n}\n")
    Files.createDirectories(Paths.get(outDir))
    Files.writeString(Paths.get(s"$outDir/manifest.json"), json)
  }
}
