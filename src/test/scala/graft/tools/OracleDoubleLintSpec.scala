package graft.tools

import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DoubleType, FloatType}

import graft.{SparkEntry, SparkSpec}

/** Parity lint for the IEEE-double hash-fragility class (VERDICT r7):
  * every ORACLE-CHECKED operator whose output schema carries a
  * DOUBLE/FLOAT column is inventoried together with the risky
  * expression kinds feeding its plan (round / pow / sqrt / divide /
  * exp-log). The inventory is pinned to a committed file; ANY drift —
  * a new double column, a disappeared one, or a changed risk tag —
  * fails this spec until the file is regenerated and the change argued
  * in review.
  *
  * Why: rounds 6 and 7 each shipped "N/N hash-exact" claims that the
  * driver's different-build DuckDB then falsified on a handful of
  * double-valued hashed columns (CORRECTNESS_r06 p33, CORRECTNESS_r07
  * d60/p33/p40/p41) — every one bit-exact against the LOCAL DuckDB.
  * A double output hashed by the driver is environment-exposed BY
  * TYPE; integer (`*_ppm`) outputs are exposed only through row
  * content. This lint cannot prove the remaining doubles safe (most
  * pass because both engines agreed on those operands so far), but it
  * stops NEW ones from shipping un-reviewed and gives the migration a
  * work-list.
  *
  * The pinned file carries one line per (key, column):
  *   key \t column \t risk-tags \t status
  * where status records why the entry is tolerated (driver-green
  * through which artifact). Regenerate by deleting the file and
  * re-running this suite (it rewrites the inventory and fails once,
  * so regeneration is always a conscious, diff-reviewed act).
  */
class OracleDoubleLintSpec extends SparkSpec {

  private val pinPath = Paths.get("src/test/resources/oracle_double_inventory.tsv")

  /** Risky-feeder tags present anywhere in the analyzed plan (plan-wide
    * over-approximation: subquery bodies and which column each feeds are
    * not tracked — good enough for a pinned inventory). */
  private def riskTags(plan: LogicalPlan): String = {
    val found = scala.collection.mutable.SortedSet.empty[String]
    plan.foreach { node =>
      node.expressions.foreach { e =>
        e.foreach {
          case _: Round   => found += "round"
          case _: BRound  => found += "bround"
          case _: Pow     => found += "pow"
          case _: Sqrt    => found += "sqrt"
          case _: Divide  => found += "div"
          case _: Exp     => found += "exp"
          case _: Log     => found += "log"
          case _: Logarithm => found += "log"
          case _ => ()
        }
      }
    }
    if (found.isEmpty) "plain" else found.mkString("+")
  }

  test("oracle-checked DOUBLE output columns match the pinned inventory") {
    val inv: Seq[String] = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) if SparkEntry.oracleSql.contains(name) =>
        val df = fn(spark, sf)
        val doubles = df.schema.fields.filter(f =>
          f.dataType == DoubleType || f.dataType == FloatType)
        if (doubles.isEmpty) Nil
        else {
          val tags = riskTags(df.queryExecution.analyzed)
          doubles.toSeq.map(f =>
            s"$name\t${f.name}\t$tags\tdriver-green through CORRECTNESS_r07")
        }
      case _ => Nil
    }
    if (!Files.exists(pinPath)) {
      Files.createDirectories(pinPath.getParent)
      val header = Seq(
        "# Oracle-checked operators with DOUBLE output columns (hash-exposed",
        "# to the driver's DuckDB build — see OracleDoubleLintSpec). Pinned:",
        "# any new double column fails CI until reviewed here. Columns:",
        "# key\\tcolumn\\trisk-tags\\tstatus")
      Files.write(pinPath, (header ++ inv).asJava,
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      fail(s"$pinPath did not exist — inventory written (${inv.size} rows); " +
        "review and commit it, then re-run")
    }
    // compare on (key, column, risk-tags) only — the status column is
    // free-text per entry (rationales are hand-edited after generation)
    def keyOf(line: String): String = line.split('\t').take(3).mkString("\t")
    val pinned = Files.readAllLines(pinPath).asScala.toSeq
      .filterNot(l => l.startsWith("#") || l.trim.isEmpty).map(keyOf)
    val invKeys = inv.map(keyOf)
    val added = invKeys.diff(pinned)
    val removed = pinned.diff(invKeys)
    assert(added.isEmpty && removed.isEmpty,
      s"""oracle-double inventory drifted vs $pinPath
         |NEW (review: prefer integer *_ppm outputs — the s43 recipe; if the
         |double must ship, add the line with a rationale):
         |${added.mkString("\n")}
         |GONE (delete the stale pin lines):
         |${removed.mkString("\n")}""".stripMargin)
  }
}
