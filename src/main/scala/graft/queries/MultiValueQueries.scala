package graft.queries

object MultiValueQueries {
  def defs: Seq[QueryDef] = Seq()
}
