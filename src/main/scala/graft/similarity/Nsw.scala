package graft.similarity

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph-based ANN — navigable-small-world graphs (Malkov et al. 2014,
  * "Approximate nearest neighbor algorithm based on navigable small world
  * graphs"; the single-layer ancestor of HNSW), in the standard
  * distributed layout: the corpus is hash-sharded, each shard builds an
  * IN-PARTITION proximity graph, and a query greedily walks every
  * shard's graph in parallel before a global top-k merge. This is the
  * "shard + per-shard graph index" architecture of production vector
  * stores, and the graph-family complement to the cluster-pruned
  * ([[Ivf]]) and code-compressed ([[Pq]]) paths.
  *
  * Scale shape: the build is `mapPartitions` (the documented last-resort
  * tier — genuinely per-partition imperative state: a mutable adjacency
  * list); each shard's graph is O(shard × m) edges and never leaves its
  * executor. Queries are a guarded driver-side broadcast (the x4 exact
  * top-k contract: query sets are small by definition). Search work is
  * `shards × ef` distance evaluations per query — independent of corpus
  * size per shard — and only (query, candidate, cosine) rows reach the
  * merge shuffle. Unlike IVF there is no training step, and appends are
  * per-shard local inserts.
  *
  * Determinism: insertion order is ascending id within each shard,
  * hash-sharding is `repartition(id)`, and every float comparison breaks
  * ties on ascending id — identical results run to run. Approximation
  * comes only from greedy search escaping to local optima; recall is
  * spec-asserted against [[Ann.cosineTopK]].
  */
object Nsw {

  private val MaxQueries = 100000L

  /** Approximate cosine top-k via per-shard NSW graphs.
    * Output: `queryIdCol`, `rank`, `neighbor_id`, `cosine` — the
    * [[Ann.cosineTopK]] shape.
    */
  def cosineTopKNsw(
      corpus: DataFrame,
      queries: DataFrame,
      featCol: String,
      corpusIdCol: String,
      queryIdCol: String,
      k: Int,
      m: Int = 8,
      efConstruction: Int = 32,
      efSearch: Int = 48,
      excludeSelf: Boolean = true): DataFrame = {
    require(k > 0 && m > 0 && efConstruction >= m && efSearch >= k,
      s"need k>0, m>0, efConstruction>=m, efSearch>=k: $k $m $efConstruction $efSearch")
    val spark = corpus.sparkSession
    import spark.implicits._
    val probe = queries.limit((MaxQueries + 1).toInt).count()
    require(probe <= MaxQueries,
      s"cosineTopKNsw broadcasts the query vectors; got > $MaxQueries rows — " +
        "swap the arguments or batch the queries")
    val qRows = queries
      .select(col(queryIdCol).cast("long"), col(featCol).cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
      .map { case (id, v) => (id, v.toArray, math.sqrt(v.map(x => x * x).sum)) }
      .sortBy(_._1)
    val qB = spark.sparkContext.broadcast(qRows)
    val ef = efSearch
    val locals = graft.Tables.spread(corpus)
      .select(col(corpusIdCol).cast("long"), col(featCol).cast("array<double>"))
      .repartition(col(corpusIdCol))
      .as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val nodes = it.map { case (id, v) => (id, v.toArray) }
          .toArray.sortBy(_._1)
        if (nodes.isEmpty) Iterator.empty
        else {
          val norms = nodes.map { case (_, v) =>
            math.sqrt(v.map(x => x * x).sum) }
          def cos(v: Array[Double], nv: Double, i: Int): Double = {
            val c = nodes(i)._2
            var s = 0.0; var j = 0
            while (j < c.length) { s += v(j) * c(j); j += 1 }
            val d = nv * norms(i)
            if (d > 0) s / d else 0.0
          }
          val adj = Array.fill(nodes.length)(mutable.ArrayBuffer.empty[Int])
          val maxDeg = 2 * m
          // best-first beam search over the current graph from entry 0:
          // returns up to `width` node indices, best cosine first
          def search(v: Array[Double], nv: Double, width: Int,
              limit: Int): Array[Int] = {
            // (cosine, idx) max-heap with ascending-id tie-breaks
            val visited = mutable.BitSet(0)
            val cand = mutable.PriorityQueue((cos(v, nv, 0), 0))(
              Ordering.by[(Double, Int), (Double, Double)] {
                case (c, i) => (c, -i.toDouble) }) // best first
            val found = mutable.ArrayBuffer((cos(v, nv, 0), 0))
            def worstFound: Double =
              if (found.size < width) Double.NegativeInfinity
              else found.minBy { case (c, i) => (c, -i.toDouble) }._1
            while (cand.nonEmpty && cand.head._1 >= worstFound) {
              val (_, cur) = cand.dequeue()
              adj(cur).foreach { nb =>
                if (nb < limit && !visited.contains(nb)) {
                  visited += nb
                  val c = cos(v, nv, nb)
                  if (c > worstFound || found.size < width) {
                    cand.enqueue((c, nb))
                    found += ((c, nb))
                    if (found.size > width) {
                      val drop = found.zipWithIndex.minBy {
                        case ((c0, i0), _) => (c0, -i0.toDouble) }._2
                      found.remove(drop)
                    }
                  }
                }
              }
            }
            found.sortBy { case (c, i) => (-c, i) }.map(_._2).toArray
          }
          // incremental build: link each node to its m nearest among the
          // already-inserted prefix, bidirectional, degree-capped
          var i = 1
          while (i < nodes.length) {
            val (_, v) = nodes(i)
            val nv = math.sqrt(v.map(x => x * x).sum)
            val links = search(v, nv, efConstruction, i).take(m)
            links.foreach { n =>
              adj(i) += n
              adj(n) += i
              if (adj(n).size > maxDeg) {
                val (_, nvv) = nodes(n)
                val nn = math.sqrt(nvv.map(x => x * x).sum)
                val kept = adj(n).distinct
                  .map(x => (cos(nvv, nn, x), x))
                  .sortBy { case (c, x) => (-c, x) }
                  .take(maxDeg).map(_._2)
                adj(n).clear(); adj(n) ++= kept
              }
            }
            i += 1
          }
          // search every broadcast query against this shard's graph
          qB.value.iterator.flatMap { case (qid, qv, qn) =>
            search(qv, qn, math.max(ef, k + 1), nodes.length)
              .iterator
              .map(idx => (qid, nodes(idx)._1, cos(qv, qn, idx)))
              .filter { case (q, cid, _) => !excludeSelf || q != cid }
              .take(k)
          }
        }
      }
      .toDF("__qid", "__cid", "__cos")
    Ann.rankTopKScored(locals, queryIdCol, k, col("__cos"))
  }
}
