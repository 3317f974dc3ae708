package graft.queries

/** Multimodal pack — filled in with ops/Multimodal (see SURVEY.md §2.6). */
object MultimodalQueries {
  val queries: Seq[Q] = Seq()
}
