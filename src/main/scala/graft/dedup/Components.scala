package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the step between
  * near-dup PAIR detection and corpus-level dedup DECISIONS: transitive
  * near-dup groups ("a~b, b~c ⇒ {a,b,c}") each keep one canonical
  * representative (the minimum id), exactly what a training-data pipeline
  * needs to collapse LSH/SimHash pair output into per-document keep/drop
  * labels.
  *
  * Algorithm: iterative min-label propagation to a fixpoint. Every vertex
  * starts labeled with itself; each round every vertex takes the min of its
  * own label and its neighbors' labels; at the fixpoint every vertex holds
  * the minimum vertex id of its component — a deterministic, total labeling.
  *
  * Scale shape: each round is ONE shuffle join (edges ⨝ labels on src,
  * re-keyed min-agg on dst) over |E| + |V| rows, and rounds are bounded by
  * the component diameter. Near-dup components are shallow by construction
  * (stars around a template doc), so 2-4 rounds close real corpora; the
  * loop still runs to the provable fixpoint rather than assuming so. Each
  * round's labels land in scratch parquet (DocDedup.scratchTable): lineage
  * stays O(1) deep per round instead of re-deriving the whole pair pipeline
  * per iteration, and the convergence check is a cheap columnar scan. For
  * graphs with long chains at extreme scale, swap the per-round rule for
  * large-star/small-star (Kiveris et al., "Connected Components in
  * MapReduce and Beyond", SoCC'14) — O(log n) rounds, same join shape, same
  * driver loop; min-propagation is kept here because near-dup diameters
  * make it the fewer-shuffles choice.
  */
object Components {

  /** Label every vertex with the min vertex id of its connected component.
    *
    * @param vertices one column `v` (includes isolated vertices — every
    *                 input doc gets a label, singletons label themselves)
    * @param edges    two columns `a`, `b` (undirected; orientation and
    *                 duplicates don't matter — labels only ever take mins)
    * @return (v, label) with one row per input vertex
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame): DataFrame = {
    // The edge relation is re-joined every round: materialize it once so
    // the (possibly expensive — e.g. LSH banded-join) edge derivation runs
    // exactly once, not once per round.
    val bidir = DocDedup.scratchTable(
      edges.select(col("a").as("src"), col("b").as("dst"))
        .union(edges.select(col("b").as("src"), col("a").as("dst")))
        .distinct(), "cc-edges")

    var labels = vertices.select(col("v"), col("v").as("label"))
    var converged = false
    while (!converged) {
      val neighborMin = bidir
        .join(labels, bidir("src") === labels("v"))
        .groupBy(col("dst"))
        .agg(min(col("label")).as("nmin"))
      val next = labels
        .join(neighborMin, labels("v") === neighborMin("dst"), "left")
        .select(col("v"), col("label").as("old_label"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
      val mat = DocDedup.scratchTable(next, "cc-labels")
      // bounded driver-side action: existence of any changed label (the
      // standard iterative-CC convergence check; cost is one scan of the
      // just-written labels table)
      converged = mat.filter(col("label") =!= col("old_label")).isEmpty
      labels = mat.select(col("v"), col("label"))
    }
    labels
  }
}
