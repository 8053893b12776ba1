package graft.queries
import graft.Q
object Dedup { val all: Map[String, Q] = Map() }
