package graft

/** Data model + error contract for the Spark-native property-graph engine.
  *
  * Mirrors the reference's semantics (kinbaku: directed graph, any string as
  * node key, self-loops allowed, at most one edge per (src, dst, etype)
  * triple — /root/reference/kinbaku/graph.py:1-3) re-expressed as immutable
  * Spark Datasets instead of a single mutable slot file.
  *
  * Exception hierarchy parity: /root/reference/kinbaku/exception.py:14-31.
  */
class KinbakuException(msg: String) extends RuntimeException(msg)
class KinbakuError(msg: String) extends KinbakuException(msg)
class NodeNotFound(key: String) extends KinbakuException(s"node not found: $key")
class EdgeNotFound(src: String, dst: String, etype: Int)
    extends KinbakuException(s"edge not found: ($src, $dst, type=$etype)")
class KeyTooLong(key: String, max: Int)
    extends KinbakuException(s"key too long (${key.length} > $max): $key")

/** A node row. `key` is the identity (reference: graph.py:999-1036);
  * `index` is the monotonically-assigned surrogate id used by the dense
  * adjacency representation (reference: graph.py:1372-1373). Attribute
  * columns ride alongside in the DataFrame; typed users can carry a case
  * class. */
case class NodeRec(key: String, index: Long)

/** An edge row. Identity = (src, dst, etype) (reference: graph.py:836-838);
  * endpoints are denormalized as key strings so neighbor scans never need
  * the N point lookups of the reference's read path (graph.py:868). */
case class EdgeRec(src: String, dst: String, etype: Int)

object KinConfig {
  /** Reference defaults (graph.py:23-24). We do NOT truncate — Spark strings
    * are unbounded — but the facade can enforce the contract when asked. */
  val DefaultMaxKeyLen = 15
  val DefaultMaxStrLen = 15
}
