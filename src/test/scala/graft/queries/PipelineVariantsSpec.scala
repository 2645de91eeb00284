package graft.queries

import graft.SparkTestBase

/** The x21 pipeline's two near-dup mining strategies must be exact
  * equivalents: jaccard and per-pair band collision depend only on the
  * two documents, so mining the full corpus then restricting to
  * survivors equals mining the survivors directly.
  */
class PipelineVariantsSpec extends SparkTestBase {

  private def run(sfDir: String, survivorsOnly: Boolean): Seq[String] =
    Extensions.pipelineDocs(spark, sfDir, mineSurvivorsOnly = survivorsOnly)
      .collect()
      .map(r => s"${r.getLong(0)}|${r.get(1)}|${r.get(2)}")
      .toSeq

  test("x21 full-corpus and survivor-only mining produce identical output") {
    val sf = "/root/testdata/sf0.001"
    assert(run(sf, survivorsOnly = false) === run(sf, survivorsOnly = true))
  }
}
