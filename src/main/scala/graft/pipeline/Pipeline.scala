package graft.pipeline

import org.apache.spark.sql.DataFrame

/** A pipeline operator: the Spark-native equivalent of one morphline command.
  *
  * The reference compiles a HOCON command array into a linked chain of
  * record-at-a-time `Command` objects (reference:
  * MorphlineTransform.java:166-195). Here every operator is a declarative
  * `DataFrame => DataFrame`; chaining ops composes one Catalyst logical plan,
  * so the whole chain analyzes/optimizes/codegens as a single unit —
  * predicates push down *through* op boundaries, which the reference's
  * interpreted chain can never do.
  */
trait Op extends (DataFrame => DataFrame) with Serializable {
  def name: String
}

/** A filter-shaped op that exposes its row predicate, so wrappers like the
  * Kite `not` command invert the predicate structurally (one plan, no
  * row-set diffing). The predicate is schema-aware — built against the
  * incoming frame, since Kite value-list matching depends on whether the
  * field is single- or multi-valued.
  */
trait PredicateOp extends Op {
  def predicateFor(df: DataFrame): org.apache.spark.sql.Column
}

object Op {
  def apply(opName: String)(f: DataFrame => DataFrame): Op = new Op {
    val name: String = opName
    def apply(df: DataFrame): DataFrame = f(df)
  }

  /** A predicate command: keeps rows matching `cond` (SQL filter semantics —
    * null does not match).
    */
  def predicate(opName: String)(
      cond: DataFrame => org.apache.spark.sql.Column): PredicateOp =
    new PredicateOp {
      val name: String = opName
      def predicateFor(df: DataFrame): org.apache.spark.sql.Column = cond(df)
      def apply(df: DataFrame): DataFrame = df.filter(predicateFor(df))
    }

  /** `pipe` / `callParentPipe` (SURVEY.md §2.C): a nested pipeline as a
    * single op — function composition, one combined Catalyst plan.
    */
  def pipe(pipeline: Pipeline): Op = Op(s"pipe:${pipeline.id}")(pipeline.apply)
}

/** An ordered chain of ops — the morphline itself.
  *
  * Mirrors the reference's command-chain semantics (ordered, each command
  * feeds the next) without its execution model: composition here is plan
  * construction, not interpretation.
  */
final case class Pipeline(id: String, ops: Seq[Op]) {
  def apply(df: DataFrame): DataFrame = ops.foldLeft(df)((d, op) => op(d))
  def andThen(op: Op): Pipeline = copy(ops = ops :+ op)
}

/** Named-op registry: the Spark equivalent of the reference's
  * `CommandBuilder` SPI (`getNames()` + `build(...)`, e.g.
  * FromConnectDataBuilder.java:33-44) discovered via `importCommands` globs.
  * Ops register under a name; pipelines are assembled programmatically or
  * from a config map.
  */
final class OpRegistry {
  private val builders =
    scala.collection.mutable.Map.empty[String, Map[String, String] => Op]

  def register(name: String)(builder: Map[String, String] => Op): this.type = {
    builders(name) = builder; this
  }

  def build(name: String, config: Map[String, String] = Map.empty): Op =
    builders.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown op '$name'; known: ${builders.keys.toSeq.sorted.mkString(", ")}")
    )(config)

  def names: Seq[String] = builders.keys.toSeq.sorted
}
