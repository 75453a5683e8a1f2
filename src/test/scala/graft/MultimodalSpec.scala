package graft

import graft.operators.Multimodal

/** Multimodal plumbing: schema, partition-batched decode, determinism. */
class MultimodalSpec extends SparkSpec {

  test("decodeAll produces deterministic features with the real schema") {
    val media = Multimodal.mediaFromDocuments(spark, sf)
    val feats = Multimodal.decodeAll(media)
    assert(feats.columns.toSeq === Seq("media_id", "kind", "n_bytes",
      "width", "height", "n_frames", "brightness"))
    val rows = feats.collect()
    assert(rows.length === 500)
    // deterministic: second run identical
    val again = Multimodal.decodeAll(media).collect()
    assert(rows.map(_.toString).sorted.toSeq === again.map(_.toString).sorted.toSeq)
    // stub invariants hold
    rows.foreach { f =>
      assert(f.n_bytes > 0 && f.brightness >= 0.0 && f.brightness <= 1.0)
      assert(f.n_frames >= 1 && f.n_frames <= 30)
    }
  }

  test("decode runs per-partition (no driver collect)") {
    val media = Multimodal.mediaFromDocuments(spark, sf).repartition(3)
    assert(Multimodal.decodeAll(media).rdd.getNumPartitions === 3)
  }
}
