package graft.sinks
import graft.Q
object SinkQueries { val all: Map[String, Q] = Map() }
