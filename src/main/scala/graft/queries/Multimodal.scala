package graft.queries
import graft.Q
object Multimodal { val all: Map[String, Q] = Map() }
