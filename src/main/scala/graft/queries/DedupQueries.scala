package graft.queries

object DedupQueries {
  def defs: Seq[QueryDef] = Seq()
}
