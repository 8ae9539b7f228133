package graft.etl

import graft.Q

/** ETL load/export operator queries — SURVEY §2.8/§2.9. */
object EtlQueries {
  val qs: Seq[Q] = Seq()
}
