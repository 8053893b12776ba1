package graft.queries
import graft.Q
object Similarity { val all: Map[String, Q] = Map() }
