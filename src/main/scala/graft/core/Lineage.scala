package graft.core

/** Lineage DAG — the reference's graphviz `Digraph` (`graph.py:24-37,
  * 124-257`) as a plain case-class DAG: oval input nodes, box function
  * nodes, parallelogram output nodes, rendered to DOT text for store
  * attrs. Unlike the reference (which regexes its own DOT source to find
  * the last node, `graph.py:186-207`) the last node is an explicit field.
  */
case class LineageNode(id: String, label: String, shape: String)
case class LineageEdge(from: String, to: String)

case class LineageDag(
    nodes: Vector[LineageNode] = Vector.empty,
    edges: Vector[LineageEdge] = Vector.empty,
    lastNode: Option[String] = None) {

  private def nextId: String = s"n${nodes.size}"

  /** Initialise with an input node (reference `initialise_graph`). */
  def withInput(label: String): LineageDag = {
    val id = nextId
    LineageDag(nodes :+ LineageNode(id, label, "oval"), edges, Some(id))
  }

  /** Append function node + output node, both chained from the last node
    * (reference `update_graph`, `graph.py:210-257`).
    */
  def withStep(function: String, output: String): LineageDag = {
    val fId = nextId
    val fNode = LineageNode(fId, function, "box")
    val oId = s"n${nodes.size + 1}"
    val oNode = LineageNode(oId, output, "parallelogram")
    val newEdges = lastNode.map(l => LineageEdge(l, fId)).toVector :+
      LineageEdge(fId, oId)
    LineageDag(nodes :+ fNode :+ oNode, edges ++ newEdges, Some(oId))
  }

  /** Deterministic DOT rendering (stored in TileStore attrs like the
    * reference stores DOT source in Zarr attrs, `_dataframe.py:732-737`).
    */
  def toDot: String = {
    val sb = new StringBuilder("digraph lineage {\n")
    nodes.foreach(n =>
      sb.append(s"""  ${n.id} [label="${n.label.replace("\"", "'")}" shape=${n.shape}]\n"""))
    edges.foreach(e => sb.append(s"  ${e.from} -> ${e.to}\n"))
    sb.append("}\n").toString
  }
}
