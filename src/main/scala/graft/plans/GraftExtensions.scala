package graft.plans

import graft.functions.{DotProduct, JaroWinkler, MinHashSig, PolyHash, ShingleHashes, SimHash, SortedInterCount}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Catalyst optimizer rule: recognize the pure-builtin dot-product
  * pattern
  * {{{aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)}}}
  * and replace it with the native codegen'd [[DotProduct]] expression.
  *
  * This is the optimizer-level counterpart of calling `graft_dot`
  * explicitly: user code written against stock Spark HOFs gets the tight
  * primitive loop (measured ~12× on the sf0.1 embedding near-dup query)
  * without changing a line. The match is deliberately narrow — double
  * element types, literal 0.0 seed, bare multiply/add lambdas, identity
  * finish — and [[DotProduct]] reproduces the HOF's null semantics
  * exactly (null on whole-array null, on length mismatch — zip_with pads
  * the shorter side with null, poisoning the fold — and on any null
  * element), so the rewrite is value-identical on every input, including
  * malformed ones. The rule is installed globally via
  * `spark.sql.extensions`, so this totality matters: any user query
  * matching the pattern must not change results.
  * `NativeFunctionsSpec` asserts bit-equality and the edge cases.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {
  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(x1: NamedLambdaVariable, y1: NamedLambdaVariable, _),
                Seq(x2: NamedLambdaVariable, y2: NamedLambdaVariable), _)),
            DoubleLiteral(0.0),
            LambdaFunction(Add(acc1: NamedLambdaVariable, v1: NamedLambdaVariable, _),
              Seq(acc2: NamedLambdaVariable, v2: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(fin2: NamedLambdaVariable), _))
          if isDoubleArray(a) && isDoubleArray(b) &&
            x1.exprId == x2.exprId && y1.exprId == y2.exprId &&
            acc1.exprId == acc2.exprId && v1.exprId == v2.exprId &&
            fin.exprId == fin2.exprId =>
        DotProduct(a, b)
    }
}

/** Extension installer: `spark.sql.extensions=graft.plans.GraftExtensions`
  * (set by Verify/Bench/tests) registers the graft native functions and
  * the HOF-rewrite rule on every session built from that config — the
  * library's official integration point, with
  * [[graft.functions.VectorFunctions.register]] kept as the runtime
  * fallback for externally-built sessions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_polyhash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_polyhash"),
      (exprs: Seq[Expression]) => PolyHash(exprs.head)))
    def lit(e: Expression): Int = e.eval().asInstanceOf[Number].intValue()
    ext.injectFunction((
      FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingle_hashes"),
      (exprs: Seq[Expression]) =>
        ShingleHashes(exprs.head, lit(exprs(1)), lit(exprs(2)) != 0)))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
      (exprs: Seq[Expression]) => MinHashSig(exprs.head, lit(exprs(1)))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash].getName, "graft_simhash"),
      (exprs: Seq[Expression]) => SimHash(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro_winkler"),
      (exprs: Seq[Expression]) => JaroWinkler(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_inter_count"),
      new ExpressionInfo(classOf[SortedInterCount].getName, "graft_inter_count"),
      (exprs: Seq[Expression]) => SortedInterCount(exprs(0), exprs(1))))
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
  }
}
