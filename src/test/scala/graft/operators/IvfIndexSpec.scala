package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("IVF top-k is deterministic and recalls most brute-force neighbors") {
    val emb = Tables(spark, sf, "embeddings")
    val ivf1 = IvfIndex.topK(emb, "vec_id", "embedding",
      queryPred = col("vec_id") < 8, k = 5, nLists = 8, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf2 = IvfIndex.topK(emb, "vec_id", "embedding",
      queryPred = col("vec_id") < 8, k = 5, nLists = 8, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf1 == ivf2, "seeded centroids ⇒ deterministic result")

    val brute = BruteForceCosine.topK(emb, "vec_id", "embedding",
      queryPred = col("vec_id") < 8, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivf1.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.4, s"recall $recall too low for nProbe=3 of 8 lists")

    // widening nProbe to all lists must recover brute-force exactly
    val full = IvfIndex.topK(emb, "vec_id", "embedding",
      queryPred = col("vec_id") < 8, k = 5, nLists = 8, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == brute, "nProbe == nLists must equal exact search")
  }

  test("trained centroids: recall >= sampled pick; nProbe == nLists stays exact") {
    val emb = Tables(spark, sf, "embeddings")
    def recallOf(res: Set[(Long, Long)], brute: Set[(Long, Long)]): Double =
      res.intersect(brute).size.toDouble / brute.size
    val brute = BruteForceCosine.topK(emb, "vec_id", "embedding",
      queryPred = col("vec_id") < 16, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sampled = IvfIndex.topK(emb, "vec_id", "embedding",
      queryPred = col("vec_id") < 16, k = 5, nLists = 8, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val trained = IvfIndex.topKTrained(emb, "vec_id", "embedding",
      queryPred = col("vec_id") < 16, k = 5, nLists = 8, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (rs, rt) = (recallOf(sampled, brute), recallOf(trained, brute))
    // Lloyd-fitted lists place related vectors together: at the same probe
    // budget the trained index must recall at least what a random pick does
    assert(rt >= rs, s"trained recall $rt below sampled recall $rs")
    assert(rt >= 0.4, s"trained recall $rt too low for nProbe=2 of 8 lists")
    // the exactness contract is centroid-independent: probing every list
    // recovers brute force no matter how the lists were built
    val full = IvfIndex.topKTrained(emb, "vec_id", "embedding",
      queryPred = col("vec_id") < 16, k = 5, nLists = 8, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == brute, "trained nProbe == nLists must equal exact search")
    // determinism: a re-run reproduces the fitted index bit-for-bit
    val trained2 = IvfIndex.topKTrained(emb, "vec_id", "embedding",
      queryPred = col("vec_id") < 16, k = 5, nLists = 8, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(trained == trained2, "seeded k-means ⇒ deterministic index")
  }
}
