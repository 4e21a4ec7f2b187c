package graft

import org.apache.spark.sql.functions._
import graft.ext.TextOps

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Independent JVM reference: fold UTF-8 bytes of each char (big-endian
    * integer per char) through (acc*31 + c) mod 1e9+7.
    */
  private def expectedHash(text: String): Long =
    text.toLowerCase.map { ch =>
      ch.toString.getBytes("UTF-8").foldLeft(0L)((acc, b) => acc * 256 + (b & 0xff))
    }.foldLeft(0L)((acc, c) => (acc * 31 + c) % 1000000007L)

  test("rolling hash handles non-ASCII text (UTF-8 bytes, not ascii())") {
    val texts = Seq("the quick fox", "café der 的 text", "的的", "人人", "")
    val got = texts.toDF("text")
      .select(TextOps.rollingHash(col("text"))).collect().map(_.getLong(0))
    assert(got.toSeq == texts.map(expectedHash))
    // distinct CJK strings must hash differently (ascii() collapsed them)
    assert(expectedHash("的的") != expectedHash("人人"))
  }

  test("shingles guard short documents") {
    val df = Seq("a b", "a b c d").toDF("text")
      .withColumn("toks", TextOps.tokens(col("text")))
      .select(TextOps.shingles("toks", 3).as("sh"))
    val sizes = df.select(size(col("sh"))).collect().map(_.getInt(0)).toSeq
    assert(sizes == Seq(0, 2))
  }

  test("chunk windows: counts, strides, and the coverage identity") {
    // synthetic docs at the edge cases of the 32/8 window: below, at, and
    // just past the window size, plus mid-corpus lengths
    val texts = Seq(5, 32, 33, 56, 57, 99).map(n => (1 to n).mkString(" "))
    val df = texts.toDF("text")
      .withColumn("toks", TextOps.tokens(col("text")))
      .withColumn("chunks", TextOps.chunkWindows("toks", 32, 8))
    val rows = df.select(size(col("toks")), col("chunks")).collect()
    val expectedCounts = Seq(1, 1, 2, 2, 3, 4)
    assert(rows.map(_.getSeq[scala.collection.Seq[String]](1).size).toSeq == expectedCounts)
    rows.foreach { r =>
      val n = r.getInt(0)
      val chunks = r.getSeq[scala.collection.Seq[String]](1)
      // every chunk but the last is full; window k starts at token k*24
      chunks.init.foreach(c => assert(c.size == 32))
      chunks.zipWithIndex.foreach { case (c, k) =>
        assert(c.head == (k * 24 + 1).toString)
      }
      // the tail window ends exactly at the last token
      assert(chunks.last.last == n.toString)
      // coverage identity: sum of chunk sizes = n + overlap*(n_chunks-1)
      assert(chunks.map(_.size).sum == n + 8 * (chunks.size - 1))
    }
    // the registered query on the real fixture obeys the same identity
    val agg = graft.queries.ExtQueries.docChunk(spark, "/root/testdata/sf0.001")
      .groupBy(col("doc_id"))
      .agg(sum(col("n_tokens")).as("s"), count(lit(1)).as("nc"))
    val toks = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), size(TextOps.tokens(col("text"))).cast("long").as("n"))
    val bad = agg.join(toks, "doc_id")
      .filter(col("s") =!= col("n") + lit(8L) * (col("nc") - 1L)).count()
    assert(bad == 0L)
  }

  test("dataset_shuffle: a permutation with dense per-shard positions, stable shards") {
    val out = graft.queries.ExtQueries
      .datasetShuffle(spark, "/root/testdata/sf0.001").collect()
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val nDocs = docs.count()
    // exactly one row per doc (it is a permutation, not a sample)
    assert(out.length == nDocs && out.map(_.getLong(0)).distinct.length == nDocs)
    // positions are dense 1..n within every shard
    out.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      val pos = rows.map(_.getLong(2)).sorted.toSeq
      assert(pos == (1L to rows.length.toLong))
    }
    // shard assignment is per-doc stable: recomputing over any subset of
    // the corpus (here: half of it) cannot move a doc between shards
    val half = docs.filter(col("doc_id") % 2 === 0)
    val hk = md5(concat(lit("s42:"), col("doc_id").cast("string")))
    val subsetShards = half
      .select(col("doc_id"),
        (conv(substring(hk, 1, 15), 16, 10).cast("long") % 8).as("shard"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fullShards = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    subsetShards.foreach { case (id, s) => assert(fullShards(id) == s) }
  }

  test("multimodal_phash banding finds exactly the brute-force hamming<=2 pairs") {
    import graft.ext.Multimodal
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val hashed = Multimodal.extractFeatures(
      Multimodal.asMedia(Multimodal.synthPpm(docs, "doc_id"),
        "media_id", "payload", "image"),
      Multimodal.PhashDecoder)
      .select(col("media_id"), element_at(col("feature"), 1).cast("long").as("ph"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val reps = hashed.groupBy(_._2).map { case (ph, xs) =>
      (xs.map(_._1).min, ph)
    }.toSeq
    val brute = (for {
      a <- reps; b <- reps
      if a._1 < b._1 && java.lang.Long.bitCount(a._2 ^ b._2) <= 2
    } yield (a._1, b._1)).toSet
    val got = graft.queries.ExtQueries.multimodalPhash(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.distinct.length) // distinct killed band dups
    assert(got.toSet == brute) // pigeonhole banding is exhaustive
  }

  test("int8 quantization round-trips rank order on well-spread vectors") {
    import graft.ext.Similarity
    // a vector whose max |x| is 1: int8 code of 1.0 is exactly 127
    val df = Seq((0L, Array(1.0f, 0.5f, -1.0f))).toDF("vec_id", "embedding")
    val v8 = df.select(transform(col("embedding"),
      x => floor(x.cast("double") * 127 /
        aggregate(col("embedding"), lit(0d),
          (acc, y) => greatest(acc, abs(y.cast("double")))) + 0.5)
        .cast("long")).as("v8"))
      .head().getSeq[Long](0)
    assert(v8 == Seq(127L, 64L, -127L)) // floor(-127 + .5) = floor(-126.5) = -127
    // the recall query itself: self-consistent bounds on the fixture
    val r = graft.queries.ExtQueries.embInt8Recall(spark, "/root/testdata/sf0.001")
      .collect()
    assert(r.nonEmpty && r.forall { row =>
      val bp = row.getAs[Long]("recall_bp")
      bp >= 0 && bp <= 10000 && bp == row.getAs[Long]("n_overlap") * 1000
    })
  }

  test("kmeans step: label-seeded centroids give full-purity cells") {
    // vectors exactly at two orthogonal directions, labels matching:
    // assignment must reproduce the labels and avg_cos = 1.0
    val df = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(2.0f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f), 1), (3L, Array(0.0f, 3.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val cents = graft.ext.Similarity.centroids(df, "label")
    val out = graft.ext.Similarity.assignCells(df, cents).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(0L -> 0, 1L -> 0, 2L -> 1, 3L -> 1))
  }

  test("PII scrub redacts every email and phone, counts match") {
    val texts = Seq(
      "mail a.b+c@sub.example.co.uk and x@y.io today",
      "call 310-555-0142 or 212-555-9999",
      "no pii here at all")
    val df = texts.toDF("text").select(
      TextOps.matchCount(col("text"), TextOps.EmailPattern).as("em"),
      TextOps.matchCount(col("text"), TextOps.PhonePattern).as("ph"),
      TextOps.scrub(TextOps.scrub(col("text"), TextOps.EmailPattern, "<EMAIL>"),
        TextOps.PhonePattern, "<PHONE>").as("clean"))
    val rows = df.collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(2, 0, 0))
    assert(rows.map(_.getInt(1)).toSeq == Seq(0, 2, 0))
    assert(rows(0).getString(2) == "mail <EMAIL> and <EMAIL> today")
    assert(rows(1).getString(2) == "call <PHONE> or <PHONE>")
    assert(rows(2).getString(2) == "no pii here at all")
  }

  test("packing_plan invariants: budget, dense bins, consistent fills") {
    val rows = graft.queries.ExtQueries
      .packingPlan(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val byBin = rows.groupBy(r => (r.getAs[String]("lang"),
      r.getAs[Long]("shard"), r.getAs[Long]("bin_id")))
    byBin.foreach { case (_, ds) =>
      val total = ds.map(_.getAs[Long]("n_tokens")).sum
      // the bin's final fill equals the token mass it holds, and the
      // budget holds unless an oversized document owns the bin alone
      assert(total == ds.map(_.getAs[Long]("bin_fill")).max)
      assert(total <= 512 || ds.length == 1)
    }
    // bin ids are dense from 0 within every (lang, shard) group
    byBin.keys.groupBy(k => (k._1, k._2)).foreach { case (_, ks) =>
      val ids = ks.map(_._3).toSeq.sorted
      assert(ids == (0L until ids.length).map(identity))
    }
  }
}
