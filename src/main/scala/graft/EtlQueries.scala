package graft

import graft.Queries.Q

/** ETL-compiler queries (Q20–Q25, Q32, T7 end-to-end) — filled in as the
  * etl module lands.
  */
object EtlQueries {
  val all: Map[String, Q] = Map.empty
}
