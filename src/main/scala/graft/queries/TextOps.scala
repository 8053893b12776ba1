package graft.queries
import graft.Q
object TextOps { val all: Map[String, Q] = Map() }
