package graft.queries

object SimilarityQueries {
  def defs: Seq[QueryDef] = Seq()
}
