package graft.queries

object UpsertQueries {
  def defs: Seq[QueryDef] = Seq()
}
