package graft.queries

object TextAnalysisQueries {
  def defs: Seq[QueryDef] = Seq()
}
