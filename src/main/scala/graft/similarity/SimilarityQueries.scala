package graft.similarity

import graft.Q

/** Embedding similarity-search queries over the embeddings table. */
object SimilarityQueries {
  val qs: Seq[Q] = Seq()
}
