package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal binary-column plumbing (north-star spec): schema, batch
  * shape, and explode/featurize shapes are real; kernels are stubs. */
class MultimodalSpec extends SparkSpec {

  private lazy val media =
    Multimodal.withFakeMedia(Tables.documents(spark, sf0001)).cache()

  test("withFakeMedia attaches binary payload + typed metadata") {
    val bad = media.filter(col("media").isNull ||
      col("media_meta.content_length") =!= col("n_chars")).count()
    assert(bad == 0, "payload must be non-null with exact content_length")
    val kinds = media.select("media_meta.kind").distinct()
      .collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("decodeImageStub yields bounded dimensions inside codegen") {
    val decoded = media.withColumn("img", Multimodal.decodeImageStub(col("media")))
    val bad = decoded.filter(col("img.width") < 1 || col("img.width") > 1920 ||
      col("img.height") < 1 || col("img.height") > 1080 ||
      col("img.channels") =!= 3).count()
    assert(bad == 0)
  }

  test("decodePartitions preserves rows and computes per-row features") {
    val out = Multimodal.decodePartitions(media, "media")
    assert(out.count() == media.count())
    val bad = out.filter(col("n_bytes") =!= col("media_meta.content_length") ||
      col("feature_sum") <= 0).count()
    assert(bad == 0)
  }

  test("sampleFrames explodes n frames per video, 1 per non-video") {
    val frames = Multimodal.sampleFrames(media, 4)
    val perKind = frames.groupBy("media_meta.kind")
      .agg((count(lit(1)) / countDistinct(col("doc_id"))).as("frames_per_doc"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(perKind("video") == 4.0)
    assert(perKind("image") == 1.0 && perKind("audio") == 1.0)
  }

  test("featurizeStub emits fixed-dim vectors in [0,1)") {
    val out = Multimodal.featurizeStub(media, 16)
    val bad = out.filter(size(col("media_vec")) =!= 16 ||
      exists(col("media_vec"), v => v < 0f || v >= 1f)).count()
    assert(bad == 0)
  }
}
