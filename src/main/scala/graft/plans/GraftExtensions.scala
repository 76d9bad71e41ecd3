package graft.plans

import graft.functions.Kernels

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types._

/** SQL surface for the graft kernels via the Catalyst extension seam: with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * [[GraftFunctions.register]] on a live session) the codegen'd kernels are
  * callable from plain SQL —
  *
  * {{{
  *   SELECT graft_simhash(graft_tokens(text))          -- 64-doc near-dup
  *   SELECT graft_jaccard_sorted(graft_word_ngrams(a, 3),
  *                               graft_word_ngrams(b, 3))
  *   SELECT graft_cosine_q(graft_quantize(e1), graft_norm2_q(graft_quantize(e1)),
  *                         graft_quantize(e2), graft_norm2_q(graft_quantize(e2)))
  * }}}
  *
  * Each function resolves to the same StaticInvoke expression the DataFrame
  * API builds ([[Kernels]]), so SQL users get identical semantics AND
  * identical whole-stage-codegen performance — no UDF wrapping, no
  * interpretation. This is the §2.9 extension-point story expressed
  * Spark-first: extending the ENGINE's function surface, not bolting a UDF
  * registry onto it. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(Kernels.getClass.getName, name),
        builder))
    }
    RewriteRules.all.foreach(r => ext.injectOptimizerRule(_ => r))
  }
}

object GraftFunctions {

  private def longArray = ArrayType(LongType, containsNull = false)
  private def stringArray = ArrayType(StringType, containsNull = false)

  /** (name, builder) for every exposed kernel. Builders are total in arity
    * errors: Spark's registry reports wrong-arity calls itself. */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    // whitespace tokens of trimmed text (the shared tokenizer contract —
    // built as raw catalyst nodes: registry builders run inside analysis,
    // so Column-API trees (unresolved ColumnNodes) cannot be returned here)
    "graft_tokens" -> { args =>
      import org.apache.spark.sql.catalyst.expressions.{Literal, StringSplit, StringTrim}
      StringSplit(StringTrim(args.head), Literal("\\s+"), Literal(-1))
    },
    "graft_word_ngrams" -> { args =>
      Kernels.invokeExpr(stringArray, "wordNgramsSorted", args)
    },
    "graft_minhash_sig" -> { args =>
      Kernels.invokeExpr(longArray, "minhashSig", args)
    },
    "graft_simhash" -> { args =>
      Kernels.invokeExpr(LongType, "simhashTokens",
        args :+ org.apache.spark.sql.catalyst.expressions.Literal(32))
    },
    "graft_jaccard_sorted" -> { args =>
      Kernels.invokeExpr(DoubleType, "jaccardSorted", args)
    },
    "graft_quantize" -> { args =>
      Kernels.invokeExpr(longArray, "quantizeDouble",
        args.map(a => Cast(a, ArrayType(DoubleType))))
    },
    "graft_dot_q" -> { args =>
      Kernels.invokeExpr(LongType, "dotLong", args)
    },
    "graft_norm2_q" -> { args =>
      Kernels.invokeExpr(LongType, "norm2Long", args)
    },
    "graft_cosine_q" -> { args =>
      Kernels.invokeExpr(DoubleType, "cosineQ", args)
    },
    "graft_normalize" -> { args =>
      Kernels.invokeExpr(StringType, "normalizeText", args)
    })

  /** Register on an already-running session (the non-extension path). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo(Kernels.getClass.getName, name),
        builder)
    }
}
