package graft.queries

object DateTimeQueries {
  def defs: Seq[QueryDef] = Seq()
}
