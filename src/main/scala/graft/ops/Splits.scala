package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Leakage-safe dataset splitting. A random per-document train/val/
  * test split leaks whenever near-duplicates straddle the boundary —
  * the eval set then contains (near-)copies of training documents and
  * overstates model quality. The safe unit of assignment is the
  * NEAR-DUPLICATE CLUSTER: every document in a connected component of
  * the similarity graph (minhash / simhash / embedding edges — any
  * [[Dedup]] edge producer) must land in the same split.
  *
  * Split assignment is a pure function of the component label: the
  * first two hex characters of `md5("graft-split:" || component)`
  * compared against hex thresholds — deterministic, engine-portable
  * (the d10/d17 portable-md5 convention), and stable under corpus
  * growth (adding documents never reassigns an existing component
  * unless the graph itself merges components, which is exactly when
  * reassignment is REQUIRED for safety).
  *
  * Scale shape: component labeling is [[Dedup.connectedComponents]]
  * (bounded driver union-find for small edge sets, checkpointed
  * pointer-doubling above); the split itself adds one per-row md5 —
  * no additional shuffle.
  */
object Splits {

  /** Buckets are the first two hex chars of the md5 — 256 of them;
    * defaults put 230 in train (~89.8%), 13 in val, 13 in test
    * (~5.1% each). Thresholds are lowercase-hex string bounds:
    * bucket < `trainBound` → train, < `valBound` → val, else test. */
  def splitOf(component: Column, trainBound: String = "e6",
      valBound: String = "f3"): Column = {
    val b = substring(md5(concat(lit("graft-split:"),
      component.cast("string"))), 1, 2)
    when(b < lit(trainBound), "train")
      .when(b < lit(valBound), "val")
      .otherwise("test")
  }

  /** Assign every document a split such that no similarity edge
    * crosses a split boundary. `edges` is an `(id_a, id_b)` pair list
    * from any near-dup detector; documents with no edge form singleton
    * components and split independently. Returns
    * `(id, component, split)` with one row per input document. */
  def leakageSafeSplit(docs: DataFrame, edges: DataFrame,
      idCol: String = "doc_id", trainBound: String = "e6",
      valBound: String = "f3"): DataFrame = {
    val ids = docs.select(col(idCol).as("id"))
    Dedup.connectedComponents(edges, ids)
      .select(col("id"), col("component"),
        splitOf(col("component"), trainBound, valBound).as("split"))
  }
}
