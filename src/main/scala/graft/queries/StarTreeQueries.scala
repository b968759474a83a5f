package graft.queries

object StarTreeQueries {
  def defs: Seq[QueryDef] = Seq()
}
