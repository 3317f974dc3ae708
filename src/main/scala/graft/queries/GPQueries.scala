package graft.queries

/** GP pack — filled in with the gp module (see SURVEY.md §2.1). */
object GPQueries {
  val queries: Seq[Q] = Seq()
}
