package graft.text

import graft.Q

/** Text-analysis / dedup queries over the documents table. */
object TextQueries {
  val qs: Seq[Q] = Seq()
}
