package graft

import java.nio.file.{Files, Path}

import graft.operators.Multimodal
import graft.sources.MediaSource

/** File ingestion → decode, end to end: synthetic PNGs/WAVs written as
  * REAL files under a nested layout, read back through the binaryFile
  * source, and decoded to the same features the formula predicts. */
class MediaSourceSpec extends SparkSpec {

  private def corpus(exts: (Long, String, Array[Byte])*): Path = {
    val root = Files.createTempDirectory("media_src")
    exts.foreach { case (id, name, bytes) =>
      val sub = root.resolve(s"shard=${id % 3}")
      Files.createDirectories(sub)
      Files.write(sub.resolve(name), bytes)
    }
    root
  }

  test("binaryFile read: glob prunes non-media, nested layout walks, ids parse") {
    val files = (0L until 20L).map(id =>
      (id, f"img_$id%06d.png", Multimodal.syntheticPng(id))) :+
      ((99L, "notes.txt", "not an image".getBytes("UTF-8")))
    val root = corpus(files: _*)
    val df = MediaSource.read(SparkSpec.session, root.toString, "*.png")
    assert(df.count() == 20) // the .txt never enters the listing
    val blobs = MediaSource.blobs(SparkSpec.session, root.toString, "*.png", "image/png")
    assert(blobs.collect().map(_.doc_id).sorted.toSeq == (0L until 20L))
  }

  test("readMeta never selects content: column pruning keeps bytes unread") {
    val root = corpus((1L, "img_000001.png", Multimodal.syntheticPng(1L)))
    val meta = MediaSource.readMeta(SparkSpec.session, root.toString, "*.png")
    assert(!meta.schema.fieldNames.contains("content"))
    // the physical scan's read schema must not include the bytes either
    val scanned = meta.queryExecution.executedPlan.toString
    assert(!scanned.contains("content"), s"content column survived pruning:\n$scanned")
    assert(meta.collect().head.getAs[Long]("length") ==
      Multimodal.syntheticPng(1L).length.toLong)
  }

  test("oversized files are dropped at the read, not OOM'd in a task") {
    val root = corpus(
      (1L, "img_000001.png", Multimodal.syntheticPng(1L)),
      (2L, "img_000002.png", Multimodal.syntheticPng(2L)))
    val small = MediaSource.read(SparkSpec.session, root.toString, "*.png",
      maxBytes = Multimodal.syntheticPng(1L).length.toLong)
    assert(small.count() >= 1 && small.count() < 2 ||
      Multimodal.syntheticPng(1L).length == Multimodal.syntheticPng(2L).length)
  }

  test("file-sourced PNG decode == the synthetic-id decode, feature for feature") {
    val ids = 0L until 30L
    val root = corpus(ids.map(id =>
      (id, f"img_$id%06d.png", Multimodal.syntheticPng(id))): _*)
    val got = Multimodal.decodeBlobs(
      MediaSource.blobs(SparkSpec.session, root.toString, "*.png", "image/png"))
      .collect().map(d => d.doc_id -> d).toMap
    ids.foreach { id =>
      assert(got(id) == Multimodal.decodePng(id, Multimodal.syntheticPng(id), 64))
    }
  }

  test("file-sourced WAV decode == the synthetic-id decode") {
    val ids = 0L until 30L
    val root = corpus(ids.map(id =>
      (id, f"clip_$id%06d.wav", Multimodal.syntheticWav(id))): _*)
    val got = Multimodal.decodeWavBlobs(
      MediaSource.blobs(SparkSpec.session, root.toString, "*.wav", "audio/wav"))
      .collect().map(d => d.doc_id -> d).toMap
    ids.foreach { id =>
      assert(got(id) == Multimodal.decodeWav(id, Multimodal.syntheticWav(id)))
    }
  }

  test("pointer reads: segments of ONE packed file decode independently") {
    // the >cap path: many media segments packed in a single large file,
    // each row range-reading exactly its slice — here 25 PNGs
    // concatenated, addressed by (offset, nbytes)
    import SparkSpec.session.implicits._
    val ids = 0L until 25L
    val segs = ids.map(id => id -> Multimodal.syntheticPng(id))
    val root = Files.createTempDirectory("media_ptr")
    val packed = root.resolve("pack.bin")
    val bos = new java.io.ByteArrayOutputStream()
    val pointers = segs.map { case (id, bytes) =>
      val off = bos.size().toLong
      bos.write(bytes)
      (id, packed.toUri.toString, off, bytes.length.toLong)
    }
    Files.write(packed, bos.toByteArray)
    val ptrDf = pointers.toDF("doc_id", "path", "offset", "nbytes")
    val got = Multimodal.decodeBlobs(
      MediaSource.blobsByPointer(ptrDf, "image/png"))
      .collect().map(d => d.doc_id -> d).toMap
    ids.foreach { id =>
      assert(got(id) == Multimodal.decodePng(id, Multimodal.syntheticPng(id), 64))
    }
  }

  test("a mis-sized pointer fails loudly instead of OOMing the task") {
    import SparkSpec.session.implicits._
    val root = corpus((1L, "img_000001.png", Multimodal.syntheticPng(1L)))
    val f = root.resolve("shard=1").resolve("img_000001.png")
    val ptr = Seq((1L, f.toUri.toString, 0L, 1L << 40))
      .toDF("doc_id", "path", "offset", "nbytes")
    val e = intercept[org.apache.spark.SparkException] {
      MediaSource.blobsByPointer(ptr, "image/png").collect()
    }
    assert(e.getMessage.contains("cap") ||
      Option(e.getCause).exists(_.getMessage.contains("cap")))
  }

  test("streaming media ingestion decodes arrivals incrementally, exactly once") {
    val in = Files.createTempDirectory("media_land")
    val out = Files.createTempDirectory("media_feat").resolve("features").toString
    val ck = Files.createTempDirectory("media_ck").toString
    def drop(ids: Range): Unit = ids.foreach { i =>
      Files.write(in.resolve(f"img_$i%06d.png"), Multimodal.syntheticPng(i.toLong))
    }
    drop(0 until 10)
    val q = graft.streaming.StreamingOps.mediaIngest(
      SparkSpec.session, in.toString, "*.png", out, ck, maxFilesPerTrigger = 4)
    try {
      q.processAllAvailable()
      drop(10 until 20) // second arrival wave — only the delta decodes
      q.processAllAvailable()
    } finally q.stop()
    val rows = SparkSpec.session.read.parquet(out).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).sorted.toSeq == (0L until 20L),
      "every arrival decoded exactly once")
    rows.foreach { r =>
      val want = Multimodal.decodePng(r.getAs[Long]("doc_id"),
        Multimodal.syntheticPng(r.getAs[Long]("doc_id")), 64)
      assert(r.getAs[Int]("width") == want.width
        && r.getAs[Double]("mean_gray") == want.mean_gray
        && r.getAs[Double]("resized_mean_gray") == want.resized_mean_gray)
    }
    // the second wave landed in later micro-batches than the first
    val byWave = rows.groupBy(_.getAs[Long]("doc_id") >= 10L)
      .view.mapValues(_.map(_.getAs[Long]("batch_id"))).toMap
    assert(byWave(true).min > byWave(false).max)
  }

  test("a file without trailing digits gets a stable content-hash id") {
    val root = corpus((7L, "cover.png", Multimodal.syntheticPng(7L)))
    val b1 = MediaSource.blobs(SparkSpec.session, root.toString, "*.png", "image/png")
      .collect().head
    val b2 = MediaSource.blobs(SparkSpec.session, root.toString, "*.png", "image/png")
      .collect().head
    assert(b1.doc_id == b2.doc_id && b1.doc_id >= 0L)
  }
}
