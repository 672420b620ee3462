package graft.engine

import graft.engine.Registry0.Entry

/** Text / dedup / similarity query registry (SURVEY.md §2D) — filled in
  * by TextOps and Similarity. */
object TextRegistry {
  def entries: Seq[(String, Entry)] = Seq()
}
