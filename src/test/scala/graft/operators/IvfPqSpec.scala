package graft.operators

import graft.SparkSpec

/** s04 (IVF-PQ) quality against the exact s01 baseline: the compressed
  * path must find most true neighbors (recall bounded by the 2-of-16-cell
  * coarse probe, same as s03) and every cosine it reports must be EXACT
  * (the re-rank stage recomputes true cosines — PQ error may drop
  * neighbors but never corrupts a reported score). */
class IvfPqSpec extends SparkSpec {

  test("s04 recall@5 vs exact baseline; reported cosines are exact") {
    val exact = Similarity.s01(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id")) -> r.getAs[Double]("cos")).toMap
    val pq = Similarity.s04(spark, sf).collect()
    assert(pq.nonEmpty)
    // reported cosines match the exact pipeline bit-for-bit
    pq.foreach { r =>
      val k = (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))
      exact.get(k).foreach(c => assert(c == r.getAs[Double]("cos"), s"cos drifted for $k"))
    }
    // recall is bounded by the coarse 2-of-16-cell probe (the synthetic
    // embeddings are near-uniform, the hardest case for IVF); the claim
    // under test is that 8-byte PQ codes + exact re-rank lose LITTLE vs
    // the uncompressed same-probe IVF (s03), not that IVF recall is high
    val truePairs = exact.keySet
    val found = pq.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val recallPq = (truePairs & found).size.toDouble / truePairs.size
    val foundIvf = Similarity.s03(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val recallIvf = (truePairs & foundIvf).size.toDouble / truePairs.size
    info(f"recall@5: s04(pq)=$recallPq%.3f vs s03(ivf)=$recallIvf%.3f")
    assert(recallPq >= recallIvf - 0.05,
      f"PQ compression lost too much recall: $recallPq%.3f vs uncompressed $recallIvf%.3f")
    assert(recallPq >= 0.25, f"IVF-PQ recall collapsed: $recallPq%.3f")
  }

  test("persisted IVF-PQ model reproduces the inline-trained search exactly") {
    val model = java.nio.file.Files.createTempDirectory("ivfpq").toString
    Similarity.trainIvfPq(spark, sf, model)
    val fromModel = Similarity.searchIvfPq(spark, sf, model).collect().map(_.toString)
    val inline = Similarity.s04(spark, sf).collect().map(_.toString)
    assert(fromModel.sameElements(inline))
  }

  test("s47 rank-displacement bounds: one row per true rank, counts nested, displacement bounded") {
    val rows = Similarity.s47(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("true_rnk")).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    rows.foreach { r =>
      val (nTrue, nFound, nExact, disp) =
        (r.getAs[Long]("n_true"), r.getAs[Long]("n_found"),
         r.getAs[Long]("n_exact_rank"), r.getAs[Long]("disp_sum"))
      assert(nTrue > 0 && nFound <= nTrue && nExact <= nFound,
        s"count nesting violated: $r")
      // a found neighbor sits at some rank 1..5, so its displacement <= 4
      assert(disp <= nFound * 4, s"displacement out of bounds: $r")
      assert(r.getAs[Long]("found_ppm") == nFound * 1000000L / nTrue)
    }
  }

  test("s48 probe sweep: recall and candidate volume both monotone in probes, recall bounded") {
    val rows = Similarity.s48(spark, sf).collect()
      .map(r => (r.getAs[Long]("n_probes"), r.getAs[Long]("candidate_pairs"),
        r.getAs[Long]("truth_pairs"), r.getAs[Long]("recalled"),
        r.getAs[Long]("recall_ppm"))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L))
    rows.foreach { case (_, cand, nT, rec, ppm) =>
      assert(cand > 0 && rec <= nT)
      assert(ppm == rec * 1000000L / nT)
    }
    // widening the probe list can only ADD candidates and recalled pairs
    assert(rows.toSeq.sliding(2).forall {
      case Seq(a, b) => a._2 <= b._2 && a._4 <= b._4
      case _ => true
    })
  }

  test("session-memoized s04 equals the train-in-query twin bit-for-bit") {
    // training is deterministic, so the benched (memoized-model) form
    // must reproduce the spec-only in-query-training form exactly
    val memoized = Similarity.s04(spark, sf).collect().map(_.toString)
    val fresh = Similarity.s04TrainInQuery(spark, sf).collect().map(_.toString)
    assert(memoized.sameElements(fresh))
  }
}
