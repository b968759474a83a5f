package graft.queries

object JoinQueries {
  def defs: Seq[QueryDef] = Seq()
}
