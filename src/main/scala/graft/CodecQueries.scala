package graft

import graft.Queries.Q

/** Codec-layer queries (C1–C6) — filled in as codecs land. */
object CodecQueries {
  val all: Map[String, Q] = Map.empty
}
