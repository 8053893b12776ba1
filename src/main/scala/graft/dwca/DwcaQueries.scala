package graft.dwca
import graft.Q
object DwcaQueries { val all: Map[String, Q] = Map() }
