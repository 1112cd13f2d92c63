package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-robust equi-join by key salting — the standard remedy when a
  * shuffled join's key distribution is pathological (a handful of hot
  * keys owning most rows) and the small side is too large to
  * broadcast: without it, every row of a hot key lands on ONE reducer
  * and the stage runs at the speed of its slowest task.
  *
  * The trick: widen the join key with a salt in [0, salts). The
  * big/skewed side derives its salt deterministically from an existing
  * well-distributed column (no rand() — results must be reproducible),
  * splitting each hot key's rows across `salts` reducers; the small
  * side is replicated `salts` times so every (key, salt) pair still
  * finds its match. The output is EXACTLY the plain join's — the salt
  * never leaves the operator (JoinsSpec asserts equality row for row,
  * and that the salted plan shuffles on (key, salt)).
  *
  * Cost model at 100 TB: replication multiplies the small side by
  * `salts` (pick the smallest salts that caps per-reducer hot-key
  * volume: salts >= hotKeyRows / targetRowsPerTask); the big side is
  * untouched — one shuffle either way, now balanced. AQE's skew-join
  * handles sort-merge skew adaptively at runtime; explicit salting
  * remains the deterministic, plan-stable form that also covers hash
  * joins and pre-aggregation (salted partial aggs use the same
  * identity).
  *
  * The `shuffle_hash` hint pins the physical join: without it Spark
  * would broadcast a small replicated side and the salt would be dead
  * weight (broadcast joins have no reducer skew to fix — if the dim
  * fits in memory, broadcast and skip salting entirely).
  */
object SaltedJoin {

  /** Inner equi-join of `big` and `small` on `keyCol`, with `big`'s
    * salt drawn from `saltExpr` (any deterministic well-distributed
    * integer column of `big`). */
  def apply(big: DataFrame, small: DataFrame, keyCol: String,
      saltExpr: Column, salts: Int): DataFrame = {
    require(salts >= 1 && salts <= (1 << 16), s"salts must be in [1, 65536], got $salts")
    val saltedSmall = small
      .withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    val saltedBig = big.withColumn("__salt", pmod(saltExpr, lit(salts)).cast("int"))
    saltedBig
      .join(saltedSmall.hint("shuffle_hash"), Seq(keyCol, "__salt"))
      .drop("__salt")
  }
}
