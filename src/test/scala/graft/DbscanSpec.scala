package graft

import graft.queries.Similarity

/** s_dbscan teeth independent of the SQL oracle: the engine result on
  * the real sf0.001 corpus must equal a naive in-JVM DBSCAN running the
  * SAME dedup-first, index-bounded trajectory (round 14) — twin-union
  * corpus, LSH-bucket-bounded replica pairs at ReplicaTau, union-find
  * replica groups (rep = min id, m = group size), md5-drawn centroids
  * over the REPS, argmax-cosine cells, NProbe probed cells as the
  * neighborhood bound, micro-floored radius compare, multiplicity-
  * weighted MinPts core gate (deg = Σ m(nbr) + m(self) − 1), union-find
  * over core-core edges (min-id labels == what min-label propagation
  * converges to), min-adjacent-core border adoption, members inheriting
  * their rep's row. The real corpus exercises all three roles, so one
  * equivalence pins the full semantics; explicit teeth assert the mix
  * is non-degenerate, that borders always adopt a real core's cluster,
  * and that every twin collapses into its base's replica group.
  */
class DbscanSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val NProbe = 2
  // derive K through the engine's own formula so the naive reference
  // cannot desync from the trajectory under test (data-derived r13)
  private def kOf(n: Long) = graft.queries.Similarity.kFor(n)
  private val EpsMicro = 250000L
  private val MinPts = 4
  private val ReplicaTau = 990000L

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.indices.map(i => a(i) * b(i)).reduceLeft(_ + _)

  /** The full naive dedup-first trajectory, parameterized by the BASE
    * corpus (twins are added here, mirroring the engine). */
  private def naiveDbscan(base: Map[Long, Array[Double]]): Set[(Long, Long, String, Long)] = {
    // twin union: +100000 id, +0.05 on component 1
    val vs: Map[Long, Array[Double]] = base ++ base.map { case (id, v) =>
      (id + 100000L) -> (Array(v(0) + 0.05) ++ v.drop(1))
    }
    val norm = vs.view.mapValues(v => math.sqrt(dot(v, v))).toMap
    def cos(a: Long, b: Long): Double = dot(vs(a), vs(b)) / (norm(a) * norm(b))
    def cmicro(a: Long, b: Long): Long = math.floor(cos(a, b) * 1000000.0).toLong
    // replica screen: banded same-bucket pairs (4 bands x 16 planes)
    // at >= ReplicaTau, union-find
    def bucketAt(v: Array[Double], base: Int): Int =
      (0 until 16).map { i =>
        if (dot(v, graft.functions.VecOps.plane(base + i).toArray) > 0) 1 << i
        else 0
      }.sum
    val buckets: Map[Long, Seq[Int]] =
      vs.view.mapValues(v => (0 until 4).map(bi => bucketAt(v, bi * 16))).toMap
    val parentR = collection.mutable.Map.empty[Long, Long]
    def findR(x: Long): Long = {
      val p = parentR.getOrElse(x, x)
      if (p == x) x else { val r = findR(p); parentR(x) = r; r }
    }
    def unionR(a: Long, b: Long): Unit = {
      val (ra, rb) = (findR(a), findR(b))
      if (ra != rb) parentR(math.max(ra, rb)) = math.min(ra, rb)
    }
    for (a <- vs.keys; b <- vs.keys
         if a < b && (0 until 4).exists(bi => buckets(a)(bi) == buckets(b)(bi))
           && cmicro(a, b) >= ReplicaTau)
      unionR(a, b)
    val repOf: Map[Long, Long] = vs.keys.map(id => id -> findR(id)).toMap
    val mult: Map[Long, Long] =
      repOf.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val reps = mult.keySet
    // classic chain over the reps, multiplicity-weighted degrees
    val cents = reps.toSeq.sortBy(id => (md5Hex(id.toString), id)).take(kOf(reps.size))
    def nearestCells(id: Long, n: Int): Seq[Long] =
      cents.map(c => (c, cos(id, c))).sortBy { case (c, s) => (-s, c) }
        .take(n).map(_._1)
    val cellOf: Map[Long, Long] = reps.map(id => id -> nearestCells(id, 1).head).toMap
    val nbrs: Map[Long, Set[Long]] = reps.map { src =>
      val probed = nearestCells(src, NProbe).toSet
      src -> reps.filter(id => id != src && probed(cellOf(id)) &&
        cmicro(src, id) >= EpsMicro).toSet
    }.toMap
    val deg: Map[Long, Long] = reps.map(id =>
      id -> (nbrs(id).toSeq.map(mult).sum + mult(id) - 1)).toMap
    val core = reps.filter(id => deg(id) >= MinPts)
    val parent = collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    for (a <- core; b <- nbrs(a) if core(b)) union(a, b)
    val coreLbl: Map[Long, Long] = core.map(id => id -> find(id)).toMap
    val repRow: Map[Long, (Long, String, Long)] = reps.map { id =>
      if (core(id)) id -> ((deg(id), "core", coreLbl(id)))
      else {
        val adj = nbrs(id).filter(core).map(coreLbl)
        if (adj.nonEmpty) id -> ((deg(id), "border", adj.min))
        else id -> ((deg(id), "noise", -1L))
      }
    }.toMap
    // members inherit their representative's row
    vs.keys.map { id =>
      val (d, role, cl) = repRow(repOf(id))
      (id, d, role, cl)
    }.toSet
  }

  test("s_dbscan == naive dedup-first DBSCAN on a randomized planted corpus") {
    // two tight planted clusters + uniform noise, new session-temp
    // corpus so the md5 centroid draw lands on a DIFFERENT cell
    // configuration than the real data exercises. Planted intra-cluster
    // cosines (~0.97 at jitter 0.02) sit BELOW the replica bar, so the
    // clusters survive the screen as density structure; the twins
    // (~0.9995) collapse into their bases.
    val rnd = new scala.util.Random(20260816L)
    def unitish(base: Int, jitter: Double): Array[Float] =
      Array.tabulate(64)(i =>
        ((if (i == base) 1.0 else 0.0) + jitter * rnd.nextGaussian()).toFloat)
    // noise population kept small: every vector carries a collapsed
    // twin (m = 2), which DOUBLES weighted degrees — a dense-enough
    // noise cloud would grow its own cores and can bridge the planted
    // clusters through in-radius chains (observed at 38 noise points
    // under the banded screen's ~complete twin recall)
    val rows: Seq[(Long, Array[Float], Int)] =
      (0 until 14).map(i => (i.toLong, unitish(0, 0.02), 0)) ++
      (14 until 26).map(i => (i.toLong, unitish(7, 0.02), 1)) ++
      (26 until 50).map { i =>
        (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat), 2)
      }
    val tmp = java.nio.file.Files.createTempDirectory("dbscan").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$tmp/embeddings.parquet")
    val vs = spark.read.parquet(s"$tmp/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .as[(Long, Array[Double])].collect().toMap
    val got = Similarity.queries("s_dbscan")(spark, tmp)
      .as[(Long, Long, String, Long)].collect().toSet
    assert(got == naiveDbscan(vs))
    // the planted structure: each tight cluster is one all-core
    // component; the two clusters get different labels; twins inherit
    val byId = got.map(r => r._1 -> r).toMap
    val cA = (0L until 14L).map(byId(_))
    val cB = (14L until 26L).map(byId(_))
    // robust planted-structure teeth (a 24-centroid floor over ~50 reps
    // probe-bounds some members into border/noise — role EXACTNESS is
    // already pinned by the naive equivalence above): each planted
    // cluster is majority-core, its cores agree on ONE label, and the
    // two clusters' labels never mix
    def coreLabels(c: Seq[(Long, Long, String, Long)]): Set[Long] =
      c.filter(_._3 == "core").map(_._4).toSet
    assert(cA.count(_._3 == "core") * 2 > cA.size, s"A mostly core: $cA")
    assert(cB.count(_._3 == "core") * 2 > cB.size, s"B mostly core: $cB")
    assert(coreLabels(cA).size == 1 && coreLabels(cB).size == 1)
    assert((coreLabels(cA) & coreLabels(cB)).isEmpty, "clusters must not merge")
    assert(cA.map(_._4).toSet.intersect(cB.map(_._4).toSet)
      .forall(_ == -1L), "only the noise label may appear in both")
    (0L until 26L).foreach { id =>
      assert(byId(id + 100000L) == byId(id).copy(_1 = id + 100000L),
        s"twin of $id must inherit its base's replica-group row")
    }
  }

  test("s_dbscan == naive dedup-first DBSCAN on the real corpus") {
    val vs = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .as[(Long, Array[Double])].collect().toMap
    val expected = naiveDbscan(vs)
    val got = Similarity.queries("s_dbscan")(spark, dir)
      .as[(Long, Long, String, Long)].collect().toSet
    assert(got == expected)

    // the corpus exercises all three roles, and no border adopts a
    // label that is not some core's cluster
    val roles = got.groupBy(_._3).view.mapValues(_.size).toMap
    assert(roles.getOrElse("core", 0) > 0 && roles.getOrElse("border", 0) > 0
      && roles.getOrElse("noise", 0) > 0, roles.toString)
    val coreClusters = got.collect { case (_, _, "core", c) => c }
    assert(got.collect { case (_, _, "border", c) => c }
      .forall(coreClusters.contains), "border adopted a non-core cluster")
    assert(got.collect { case (_, _, "noise", c) => c }.forall(_ == -1L))
    // the screen has real teeth on this corpus: with most twins
    // collapsed, the labeled population is ~2x the rep population
    val reps = got.count(r => r._1 < 100000L)
    assert(got.size == 2 * reps, "twin corpus: one twin per base vector")
  }

  test("s_dbscan_sweep: bands nest and partition the raw corpus") {
    // monotone nesting: a tighter radius (higher eps_micro) can only
    // shrink the in-radius neighborhoods, so core counts are
    // nonincreasing across bands; every band partitions the corpus.
    // (The sweep reads the eps knee on the RAW corpus — the tuning
    // input to DbEpsMicro; s_dbscan itself runs the dedup-first screen
    // on the twin corpus, so their absolute counts are not comparable.)
    val sweep = Similarity.queries("s_dbscan_sweep")(spark, dir)
      .orderBy("eps_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val cores = sweep.map(_._2)
    assert(cores.zip(cores.tail).forall { case (a, b) => a >= b },
      s"core counts must be nonincreasing in eps: ${cores.mkString(",")}")
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    sweep.foreach { case (eps, c, b, x) =>
      assert(c + b + x == n, s"band $eps: $c+$b+$x != $n") }
    // non-degenerate: the curve actually moves across the bands
    assert(cores.distinct.length > 1, s"flat curve: ${cores.mkString(",")}")
    graft.CacheBook.releaseAll(spark)
  }
}
