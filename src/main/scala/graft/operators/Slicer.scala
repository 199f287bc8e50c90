package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.plans.{Reference, SchemaGraph}

/** Root of a slice: a table plus a SQL condition selecting its seed rows
  * (reference: `DumpRoot`, slice_db/formats/dump.py:57-63). */
final case class SliceRoot(table: String, condition: String)

/** Graph-guided subsetting — the Spark-native re-expression of the
  * reference's dump discovery loop (slice_db/dump_memory.py,
  * slice_db/dump.py:330-370).
  *
  * The reference walks the FK graph breadth-first, keeping every
  * discovered row ID in driver RAM (`_DiscoveryResult`, an IntSet per
  * table) and issuing one SQL query per (segment, reference). That caps
  * out at RAM; graft instead keeps the discovered key set of each table
  * as a DataFrame and advances the whole frontier one BFS round at a
  * time:
  *
  *   frontier rows --forward ref--> parent keys   (child pulls parents)
  *   frontier rows --reverse ref--> child keys    (parent pulls children)
  *   new keys = candidates ANTI JOIN discovered   (the IntSet dedup)
  *
  * Scale posture (100 TB): nothing is ever collected to the driver; each
  * round is a handful of semi/anti joins that shuffle on the FK columns.
  * Frontiers are persisted and counted (the count doubles as the loop
  * termination test), and a frontier known to be small is broadcast so
  * the next round's joins skip the shuffle entirely. Rounds are bounded
  * by the FK-graph diameter, not the data size.
  */
final class Slicer(
    graph: SchemaGraph,
    loadTable: String => DataFrame,
    broadcastKeyLimit: Long = 1000000L) {

  private def keyCols(t: String): Seq[String] = graph.table(t).key

  /** BFS to fixpoint; returns the discovered key set per table. */
  def discoverKeys(roots: Seq[SliceRoot]): Map[String, DataFrame] = {
    var discovered = Map.empty[String, DataFrame]
    var frontier = Map.empty[String, (DataFrame, Long)]

    // seed: root conditions (multi-root unions on the same table dedup
    // through the same anti-join path as everything else)
    val seeds = roots.groupBy(_.table).map { case (t, rs) =>
      val table = loadTable(t)
      val cond = rs.map(r => s"(${r.condition})").mkString(" OR ")
      t -> table.filter(expr(cond)).select(keyCols(t).map(col): _*).distinct()
    }
    seeds.foreach { case (t, keys) =>
      val k = keys.persist(StorageLevel.MEMORY_AND_DISK)
      val n = k.count()
      if (n > 0) {
        discovered += t -> k
        frontier += t -> (k, n)
      }
    }

    while (frontier.nonEmpty) {
      // gather candidate keys per adjacent table from every live frontier
      val candidates = collection.mutable.Map.empty[String, Vector[DataFrame]]
      def addCandidate(t: String, df: DataFrame): Unit =
        candidates(t) = candidates.getOrElse(t, Vector.empty) :+ df

      frontier.foreach { case (t, (keys, n)) =>
        val hinted = if (n <= broadcastKeyLimit) broadcast(keys) else keys
        // rows behind the frontier keys (needed to read their FK columns)
        val frontRows = loadTable(t).join(hinted, keyCols(t), "left_semi")
        graph.refsFrom(t).foreach { r => // forward: child -> parent
          val vals = frontRows.select(r.columns.map(col): _*).distinct()
            .toDF(r.refColumns: _*)
          val parentKeys = loadTable(r.refTable)
            .join(vals, r.refColumns, "left_semi")
            .select(keyCols(r.refTable).map(col): _*)
          addCandidate(r.refTable, parentKeys)
        }
        graph.refsTo(t).foreach { r => // reverse: parent -> children
          val vals = frontRows.select(r.refColumns.map(col): _*).distinct()
            .toDF(r.columns: _*)
          val childKeys = loadTable(r.table)
            .join(vals, r.columns, "left_semi")
            .select(keyCols(r.table).map(col): _*)
          addCandidate(r.table, childKeys)
        }
      }

      val previous = frontier
      frontier = Map.empty
      candidates.foreach { case (t, dfs) =>
        val cand = dfs.reduce(_ union _).distinct()
        val fresh = discovered.get(t) match {
          case Some(seen) => cand.join(seen, keyCols(t), "left_anti")
          case None       => cand
        }
        val f = fresh.persist(StorageLevel.MEMORY_AND_DISK)
        val n = f.count()
        if (n > 0) {
          frontier += t -> (f, n)
          discovered += t -> (discovered.get(t) match {
            case Some(seen) => seen.union(f).persist(StorageLevel.MEMORY_AND_DISK)
            case None       => f
          })
        } else f.unpersist()
      }
      previous.foreach { case (_, (keys, _)) =>
        if (!discovered.values.exists(_ eq keys)) keys.unpersist()
      }
    }
    discovered
  }

  /** Full slice: the actual rows of every discovered table. */
  def slice(roots: Seq[SliceRoot]): Map[String, DataFrame] =
    discoverKeys(roots).map { case (t, keys) =>
      t -> loadTable(t).join(keys, keyCols(t), "left_semi")
    }

  /** One table of a slice (empty if the table is unreachable). */
  def sliceTable(roots: Seq[SliceRoot], table: String): DataFrame =
    slice(roots).getOrElse(table, loadTable(table).limit(0))

  /** Manifest analog (slice_db/formats/manifest.py): per-table row count. */
  def manifest(spark: SparkSession, roots: Seq[SliceRoot]): DataFrame = {
    import spark.implicits._
    val counts = slice(roots).toSeq.map { case (t, df) =>
      t -> df.groupBy().count()
    }
    counts.map { case (t, c) => c.select(lit(t).as("table_id"), col("count").as("row_count")) }
      .reduce(_ union _)
  }

  /** Sequence-capture analog (slice_db/dump.py:216-250): the reference
    * records `last_value` of each serial; graft records max(key) per
    * sliced table so a restore can resume key generation. */
  def sequences(spark: SparkSession, roots: Seq[SliceRoot]): DataFrame = {
    slice(roots).toSeq.sortBy(_._1).map { case (t, df) =>
      val k = keyCols(t).head
      df.select(lit(t).as("table_id"), max(col(k).cast("long")).as("last_value"))
    }.reduce(_ union _)
  }
}
