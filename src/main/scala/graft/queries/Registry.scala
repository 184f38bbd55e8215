package graft.queries

/** Single source of truth for the driver contract: every implemented
  * operator registers here once, and SparkEntry derives both `queries` and
  * `oracleSql` from it so the two maps can never drift.
  */
object Registry {
  def all: Seq[QueryDef] =
    Relational.all ++ Pipeline.all ++ EndToEnd.all ++ Extended.all ++
      IndexQueries.all ++ Selection.all

  lazy val byName: Map[String, QueryDef] = {
    val qs = all
    require(qs.map(_.name).distinct.size == qs.size, "duplicate query names")
    qs.map(q => q.name -> q).toMap
  }
}
