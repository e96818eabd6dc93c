package graft.queries

/** The full declared query inventory (SURVEY §2 coverage + LLM-pipeline
  * extensions). Every entry with an oracle participates in the DuckDB
  * hash-match correctness gate. */
object Catalog {
  def all: Seq[Q] =
    QueriesRelational.all ++ QueriesStreaming.all ++ QueriesGenomic.all ++
      QueriesPipeline.all ++ QueriesLlm.all ++ QueriesSources.all ++
      QueriesJdbc.all
}
