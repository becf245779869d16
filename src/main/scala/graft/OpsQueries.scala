package graft

import graft.Queries.Q

/** LLM-data-pipeline operators (dedup, similarity, text, multimodal) —
  * filled in as the ops module lands.
  */
object OpsQueries {
  val all: Map[String, Q] = Map.empty
}
