package graft

import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, Similarity}

class MultimodalSpec extends SparkTestBase {

  test("asset synthesis is deterministic and schema-correct") {
    val a1 = Multimodal.synthesize(spark, 300, 8)
    val a2 = Multimodal.synthesize(spark, 300, 3) // different partitioning
    assert(a1.schema.fieldNames.toSet ==
      Set("assetId", "mime", "width", "height", "durationMs", "payload"))
    val s1 = a1.collect().map(a => (a.assetId, a.payload.toSeq)).toSet
    val s2 = a2.collect().map(a => (a.assetId, a.payload.toSeq)).toSet
    assert(s1 == s2)
  }

  test("decode stub sniffs every synthesized mime correctly") {
    val decoded = Multimodal.decode(Multimodal.synthesize(spark, 300, 8))
    val byCodec = decoded.groupBy("codec").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byCodec.keySet == Set("jpeg", "riff", "mkv"))
    assert(byCodec.values.sum == 300)
    assert(decoded.where(col("ok") === false).isEmpty)
  }

  test("features are normalized 64-d vectors usable by the ANN operators") {
    val feats = Multimodal.features(Multimodal.synthesize(spark, 200, 8))
    val rows = feats.collect()
    assert(rows.forall(_.feature.length == 64))
    rows.foreach { f =>
      val s = f.feature.map(_.toDouble).sum
      assert(math.abs(s - 1.0) < 1e-3, s"histogram not normalized: $s")
    }
    // end-to-end: asset features flow into the similarity operator
    val df = feats.toDF().select(col("assetId").as("vec_id"),
      col("feature").as("embedding"))
    val topk = Similarity.bruteForceTopK(
      df.where(col("vec_id") % 50 === 0), df, "vec_id", "embedding", k = 3)
    assert(topk.groupBy("qid").count().collect().forall(_.getLong(1) == 3))
  }

  test("frame sampling emits deterministic frames for video assets only") {
    val assets = Multimodal.synthesize(spark, 120, 4)
    val frames = Multimodal.sampleFrames(assets, everyMs = 700)
    val byAsset = frames.collect().groupBy(_.assetId)
    // only videos (id % 3 == 2) have frames
    assert(byAsset.keySet.forall(_ % 3 == 2))
    assert(byAsset.nonEmpty)
    byAsset.foreach { case (_, fs) =>
      assert(fs.map(_.frameIdx).sorted.sameElements(0 until fs.length))
      assert(fs.forall(_.payload.length <= 16))
    }
    // determinism across partitionings
    val frames2 = Multimodal.sampleFrames(Multimodal.synthesize(spark, 120, 7), 700)
    assert(frames.collect().map(f => (f.assetId, f.frameIdx, f.payload.toSeq)).toSet ==
      frames2.collect().map(f => (f.assetId, f.frameIdx, f.payload.toSeq)).toSet)
  }

  test("resize: nearest-neighbor resample, exact endpoints, both directions") {
    val assets = Multimodal.synthesize(spark, 60, 4)
    val down = Multimodal.resize(assets, 32).collect()
    val src = assets.collect().map(a => a.assetId -> a.payload).toMap
    down.foreach { r =>
      assert(r.newLen == 32 && r.payload.length == 32)
      val p = src(r.assetId)
      (0 until 32).foreach { i =>
        assert(r.payload(i) == p(((i.toLong * p.length) / 32).toInt))
      }
      assert(r.payload(0) == p(0)) // first byte always preserved
    }
    // upsample beyond source length repeats nearest source bytes
    val up = Multimodal.resize(assets, 4096).collect()
    up.foreach { r =>
      assert(r.payload.length == 4096)
      assert(r.payload(0) == src(r.assetId)(0))
    }
  }

  test("documents adapt to assets; integer histogram is exact and complete") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val assets = Multimodal.assetsFromDocs(docs)
    val counts = Multimodal.featureCounts(assets).collect()
    val lens = docs.selectExpr("doc_id", "length(text)").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(counts.nonEmpty && counts.length == lens.size)
    counts.foreach { c =>
      assert(c.counts.length == 64)
      assert(c.counts.sum == lens(c.assetId)) // every byte lands in a bin
    }
    // the float variant is the L1-normalization of the integer counts
    val floats = Multimodal.features(assets).collect()
      .map(f => f.assetId -> f.feature).toMap
    counts.take(20).foreach { c =>
      val total = math.max(1, lens(c.assetId)).toFloat
      (0 until 64).foreach { j =>
        assert(math.abs(floats(c.assetId)(j) - c.counts(j) / total) < 1e-6f)
      }
    }
  }

  test("documents fixture is ASCII-only (the q_mm_* oracle contract)") {
    // the q_mm_* DuckDB oracles index CHARACTERS while the engine indexes
    // UTF-8 BYTES; they agree iff the fixture text is pure ASCII. Guard the
    // assumption at both driver scales so a fixture change fails HERE, not
    // as a silent oracle desync (MultimodalQueries scaladoc).
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { d =>
      val nonAscii = spark.read.parquet(s"$d/documents.parquet")
        .where(expr("length(text) != octet_length(text)"))
        .count()
      assert(nonAscii == 0L, s"$d/documents has non-ASCII text rows")
    }
  }
}
