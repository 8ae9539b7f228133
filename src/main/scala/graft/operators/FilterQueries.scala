package graft.operators

import graft.Q

/** Filter/join/paging operator queries — SURVEY §2.3/§2.4/§2.6. Filled in
  * as the operator library lands. */
object FilterQueries {
  val qs: Seq[Q] = Seq()
}
