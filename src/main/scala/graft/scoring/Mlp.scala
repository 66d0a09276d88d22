package graft.scoring

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Literal-weight feedforward scorer: a 2-layer MLP FORWARD PASS as pure
  * Column arithmetic — the serving-side stand-in for the reference's
  * neural members (reference `models/advanced_models.py:74-106` MLP and
  * the stacking base layer `:256`). TRAINING a net is outside the
  * engine's closed-form determinism contract (and the reference itself
  * guards its net behind `TENSORFLOW_AVAILABLE`); SERVING one is a
  * join-free narrow projection: each hidden unit is ONE codegen
  * [[graft.functions.ArrayDot]] kernel against a literal weight row, the
  * output a literal fold over the hidden columns — zero shuffle, zero
  * state, whole-stage codegen end to end, so the same expression scores
  * 10⁹ rows or one.
  *
  * Cross-engine contract: weights are dyadic rationals (k/16 — exact
  * binary64, so both engines parse identical doubles), hidden
  * activations round to the 4dp quantum before re-entering layer 2 (the
  * iterative-rounding recipe applied across LAYERS), and the output
  * logit is a left-associated literal fold the oracle mirrors term by
  * term.
  */
object Mlp {

  /** w1: hidden × d input weights; b1: hidden biases; w2: output
    * weights; b2: output bias.
    */
  final case class Net(w1: Array[Array[Double]], b1: Array[Double],
      w2: Array[Double], b2: Double) {
    def hidden: Int = w2.length
    def d: Int = w1.head.length
    require(w1.length == hidden && b1.length == hidden &&
      w1.forall(_.length == d), "Mlp.Net: inconsistent shapes")
  }

  /** Index-formula weights (no RNG, reproducible in SQL integer
    * arithmetic): w1[j][i] = ((3j+5i+1) mod 13 − 6)/16,
    * b1[j] = (7j mod 5 − 2)/16, w2[j] = ((2j+1) mod 7 − 3)/16,
    * b2 = 1/16 — all dyadic, all exactly representable.
    */
  def deterministic(d: Int, hidden: Int): Net = Net(
    Array.tabulate(hidden, d)((j, i) => (((3 * j + 5 * i + 1) % 13) - 6) / 16.0),
    Array.tabulate(hidden)(j => ((7 * j) % 5 - 2) / 16.0),
    Array.tabulate(hidden)(j => (((2 * j + 1) % 7) - 3) / 16.0),
    1.0 / 16.0)

  /** Hidden activation j: r6(relu(b1_j + x·W1_j)) — one ArrayDot kernel,
    * rounded at re-entry so layer 2's inputs are 4dp-exact anywhere.
    */
  def hiddenCol(net: Net, emb: Column, j: Int): Column = {
    val w = array(net.w1(j).toIndexedSeq.map(lit): _*)
    graft.queries.r6(greatest(lit(0.0),
      lit(net.b1(j)) + graft.scale.Similarity.dot(emb, w)))
  }

  /** Output logit b2 + Σ_j w2_j·h_j over pre-computed hidden columns —
    * j-ordered left fold (the oracle writes the identical chain).
    */
  def logit(net: Net, h: Int => Column): Column =
    (0 until net.hidden).foldLeft(lit(net.b2): Column)((acc, j) =>
      acc + lit(net.w2(j)) * h(j))

  def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))
}
