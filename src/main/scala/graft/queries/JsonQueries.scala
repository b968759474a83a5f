package graft.queries

object JsonQueries {
  def defs: Seq[QueryDef] = Seq()
}
