package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry integrity for the driver contract: the per-module query maps
  * concatenate with `++`, so a DUPLICATE name silently replaces an
  * earlier module's query (this bit a real session: a second
  * q_json_extract shadowed FunctionQueries' original until the map-size
  * check below was added). Every query must also carry an oracle.
  */
class SparkEntrySpec extends AnyFunSuite {

  private val modules: Seq[(String, Map[String, _], Map[String, String])] = Seq(
    ("RelationalQueries", queries.RelationalQueries.queries, queries.RelationalQueries.oracles),
    ("FunctionQueries", queries.FunctionQueries.queries, queries.FunctionQueries.oracles),
    ("TextQueries", queries.TextQueries.queries, queries.TextQueries.oracles),
    ("SimilarityQueries", queries.SimilarityQueries.queries, queries.SimilarityQueries.oracles),
    ("SketchDedupQueries", queries.SketchDedupQueries.queries, queries.SketchDedupQueries.oracles),
    ("IncrementalDedupQueries", queries.IncrementalDedupQueries.queries, queries.IncrementalDedupQueries.oracles),
    ("StreamingQueries", queries.StreamingQueries.queries, queries.StreamingQueries.oracles),
    ("MultimodalQueries", queries.MultimodalQueries.queries, queries.MultimodalQueries.oracles),
    ("PipelineQueries", queries.PipelineQueries.queries, queries.PipelineQueries.oracles),
    ("PqQueries", queries.PqQueries.queries, queries.PqQueries.oracles),
    ("CorpusOpsQueries", queries.CorpusOpsQueries.queries, queries.CorpusOpsQueries.oracles),
    ("LakeOpsQueries", queries.LakeOpsQueries.queries, queries.LakeOpsQueries.oracles),
    ("CurationQueries", queries.CurationQueries.queries, queries.CurationQueries.oracles),
    ("AnalyticsQueries", queries.AnalyticsQueries.queries, queries.AnalyticsQueries.oracles),
    ("GraphQueries", queries.GraphQueries.queries, queries.GraphQueries.oracles),
    ("FeatureQueries", queries.FeatureQueries.queries, queries.FeatureQueries.oracles))

  test("no query name is registered by two modules") {
    val names = modules.flatMap { case (mod, qs, _) => qs.keys.map(_ -> mod) }
    val dups = names.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty,
      s"duplicate query names (later module silently wins): " +
        dups.map { case (n, ms) => s"$n in ${ms.map(_._2).mkString("+")}" }.mkString(", "))
    assert(SparkEntry.queries.size == names.size)
  }

  test("every registered query has an oracle and vice versa") {
    modules.foreach { case (mod, qs, os) =>
      val missing = qs.keySet -- os.keySet
      val orphaned = os.keySet -- qs.keySet
      assert(missing.isEmpty, s"$mod queries without oracle: $missing")
      assert(orphaned.isEmpty, s"$mod oracles without query: $orphaned")
    }
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet)
  }
}
