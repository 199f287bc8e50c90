package graft

import graft.queries.Similarity

/** s_dbscan teeth independent of the SQL oracle: the engine result on
  * the real sf0.001 corpus must equal a naive in-JVM DBSCAN running the
  * SAME index-bounded trajectory — md5-drawn centroids, argmax-cosine
  * cells, NProbe probed cells as the neighborhood bound, micro-floored
  * radius compare, MinPts core gate, union-find over core-core edges
  * (min-id labels == what min-label propagation converges to),
  * min-adjacent-core border adoption. The real corpus exercises all
  * three roles (161 core / 216 border / 123 noise at this scale), so
  * one equivalence pins the full semantics; explicit teeth assert the
  * mix is non-degenerate and that borders always adopt a real core's
  * cluster.
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

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.indices.map(i => a(i) * b(i)).reduceLeft(_ + _)

  /** The full naive trajectory — md5 centroids, probed-cell-bounded
    * radius graph, MinPts gate, union-find components, border adoption
    * — parameterized by the corpus so both the real-data test and the
    * randomized planted test run the identical reference. */
  private def naiveDbscan(vs: Map[Long, Array[Double]]): Set[(Long, Long, String, Long)] = {
    val norm = vs.view.mapValues(v => math.sqrt(dot(v, v))).toMap
    def cos(a: Long, b: Long): Double = dot(vs(a), vs(b)) / (norm(a) * norm(b))
    val cents = vs.keys.toSeq.sortBy(id => (md5Hex(id.toString), id)).take(kOf(vs.size))
    def nearestCells(id: Long, n: Int): Seq[Long] =
      cents.map(c => (c, cos(id, c))).sortBy { case (c, s) => (-s, c) }
        .take(n).map(_._1)
    val cellOf: Map[Long, Long] = vs.keys.map(id => id -> nearestCells(id, 1).head).toMap
    val nbrs: Map[Long, Set[Long]] = vs.keys.map { src =>
      val probed = nearestCells(src, NProbe).toSet
      src -> vs.keys.filter(id => id != src && probed(cellOf(id)) &&
        math.floor(cos(src, id) * 1000000.0).toLong >= EpsMicro).toSet
    }.toMap
    val core = nbrs.collect { case (id, ns) if ns.size >= MinPts => id }.toSet
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
    vs.keys.map { id =>
      val deg = nbrs(id).size.toLong
      if (core(id)) (id, deg, "core", coreLbl(id))
      else {
        val adj = nbrs(id).filter(core).map(coreLbl)
        if (adj.nonEmpty) (id, deg, "border", adj.min)
        else (id, deg, "noise", -1L)
      }
    }.toSet
  }

  test("s_dbscan == naive index-bounded DBSCAN on a randomized planted corpus") {
    // two tight planted clusters + uniform noise, new session-temp
    // corpus so the md5 centroid draw lands on a DIFFERENT cell
    // configuration than the real data exercises
    val rnd = new scala.util.Random(20260816L)
    def unitish(base: Int, jitter: Double): Array[Float] =
      Array.tabulate(64)(i =>
        ((if (i == base) 1.0 else 0.0) + jitter * rnd.nextGaussian()).toFloat)
    val rows: Seq[(Long, Array[Float], Int)] =
      (0 until 12).map(i => (i.toLong, unitish(0, 0.02), 0)) ++
      (12 until 22).map(i => (i.toLong, unitish(7, 0.02), 1)) ++
      (22 until 60).map { i =>
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
    // component; the two clusters get different labels
    val byId = got.map(r => r._1 -> r).toMap
    val cA = (0L until 12L).map(byId(_))
    val cB = (12L until 22L).map(byId(_))
    assert(cA.forall(_._3 == "core") && cA.map(_._4).toSet.size == 1)
    assert(cB.forall(_._3 == "core") && cB.map(_._4).toSet.size == 1)
    assert(cA.head._4 != cB.head._4)
  }

  test("s_dbscan == naive index-bounded DBSCAN on the real corpus") {
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
  }

  test("s_dbscan_sweep: bands nest and the gate band matches s_dbscan's roles") {
    // monotone nesting: a tighter radius (higher eps_micro) can only
    // shrink the in-radius neighborhoods, so core counts are
    // nonincreasing across bands; every band partitions the corpus
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
    // the gate band's core population == s_dbscan's core role count
    val gateCore = sweep.find(_._1 == 250000L).get._2
    val dbscanCore = Similarity.queries("s_dbscan")(spark, dir)
      .filter("role = 'core'").count()
    assert(gateCore == dbscanCore)
    graft.CacheBook.releaseAll(spark)
  }
}
