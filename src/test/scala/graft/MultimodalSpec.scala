package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal plumbing: binary payload schema, decode batch shape, frame
  * slicing arithmetic. */
class MultimodalSpec extends SparkSpec {

  test("media table exposes binary payload + typed metadata") {
    val df = Multimodal.mediaTable(spark, sfDir)
    val types = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types("payload") == "binary")
    assert(types("width") == "int" && types("height") == "int")
    assert(df.select("kind").distinct().count() == 3)
  }

  test("decode features are byte statistics of the payload") {
    import spark.implicits._
    val feats = SparkEntry.queries("m02_decode_features")(spark, sfDir).collect()
    assert(feats.nonEmpty)
    feats.foreach { r =>
      val mean = r.getAs[Double]("mean_byte")
      val max = r.getAs[Int]("max_byte")
      assert(mean > 0 && mean <= max && max < 128, "ASCII payload stats")
      assert(r.getAs[String]("thumb_md5").length == 32)
    }
    // n_bytes equals the documents' character count (UTF-8 of ASCII text)
    val nbytes = SparkEntry.queries("m02_decode_features")(spark, sfDir)
      .select($"media_id", $"n_bytes")
    val chars = graft.sources.Tables.documents(spark, sfDir)
      .select($"doc_id".as("media_id"), length($"text").cast("long").as("n_chars2"))
    val mismatches = nbytes.join(chars, "media_id")
      .filter($"n_bytes" =!= $"n_chars2").count()
    assert(mismatches == 0)
  }

  test("frame sampling emits 3 equal frames per asset") {
    import spark.implicits._
    val frames = SparkEntry.queries("m03_frame_sample")(spark, sfDir)
    val counts = frames.groupBy($"media_id").count().select("count")
      .distinct().collect().map(_.getLong(0)).toSet
    assert(counts == Set(3L), s"expected 3 frames each, got $counts")
    val badLens = frames.groupBy($"media_id")
      .agg(countDistinct($"frame_bytes").as("d")).filter($"d" =!= 1).count()
    assert(badLens == 0, "frames of one asset must be equal length")
  }
}
