package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, StringType}

/** SQL registration for the engine's native expression family (VERDICT
  * r13 #4): the `<SRC>` SQL transformer is the reference's actual query
  * surface (`README.md:69-76` — `hoodie.transformer.sql`), so the
  * codegen'd operators must be reachable from SQL, not only from Scala
  * Columns. Each function mirrors its Column-side constructor; Scala-side
  * config (phrase lists, plane/centroid matrices, query vectors) is
  * passed as FOLDABLE SQL literals and extracted once at plan time — the
  * expressions themselves are unchanged, so the bit-compatibility specs
  * keep pinning both surfaces.
  *
  * Registered names (all also injected by [[GraftExtensions]]):
  *  - `multi_contains_count(text, array('p1','p2',...))` — one-pass
  *    Aho-Corasick distinct-phrase count
  *  - `multi_contains_matches(text, array(...))` — matched phrases
  *  - `plane_signature(emb, array(array(...), ...))` — LSH plane sign bits
  *  - `nearest_centroid(emb, array(array(...), ...))` — IVF assignment
  *  - `pair_cosine(a, b)` exact / `pair_cosine(a, b, scale)` quantized
  *  - `query_cosine(emb, array(...))` exact /
  *    `query_cosine(emb, array(...), scale)` quantized
  */
object GraftSqlFunctions {

  private def foldableStrings(e: Expression, fn: String): Seq[String] = {
    val ok = e.dataType match {
      case ArrayType(StringType, _) => true // containsNull varies by literal shape
      case _ => false
    }
    require(e.foldable && ok,
      s"$fn expects a literal array<string> argument, got ${e.sql}")
    val ad = e.eval().asInstanceOf[ArrayData]
    require(ad != null, s"$fn: phrase array must not be null")
    ad.toObjectArray(StringType).map { v =>
      require(v != null, s"$fn: null phrase in the array literal")
      v.toString
    }.toSeq
  }

  // Spark parses plain `1.5` / `array(0.1, 0.2)` literals as DecimalType,
  // not double — the numeric extractors below accept double, float AND
  // decimal element types so the natural SQL spelling works, not just
  // D-suffixed literals.
  private def numericElem(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case DoubleType | FloatType => true
    case _: org.apache.spark.sql.types.DecimalType => true
    case _ => false
  }

  private def toDoubles(ad: ArrayData, dt: org.apache.spark.sql.types.DataType): Array[Double] =
    dt match {
      case FloatType => ad.toFloatArray().map(_.toDouble)
      case DoubleType => ad.toDoubleArray()
      case _ => ad.toObjectArray(dt).map(
        _.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble)
    }

  private def foldableVector(e: Expression, fn: String): Array[Double] = {
    val elem = e.dataType match {
      case ArrayType(dt, _) if numericElem(dt) => Some(dt)
      case _ => None
    }
    require(e.foldable && elem.isDefined,
      s"$fn expects a literal array<double> argument, got ${e.sql}")
    val ad = e.eval().asInstanceOf[ArrayData]
    require(ad != null, s"$fn: vector literal must not be null")
    toDoubles(ad, elem.get)
  }

  private def foldableMatrix(e: Expression, fn: String): Array[Array[Double]] = {
    val elem = e.dataType match {
      case ArrayType(inner @ ArrayType(dt, _), _) if numericElem(dt) => Some(inner)
      case _ => None
    }
    require(e.foldable && elem.isDefined,
      s"$fn expects a literal array<array<double>> argument, got ${e.sql}")
    val ad = e.eval().asInstanceOf[ArrayData]
    require(ad != null, s"$fn: matrix literal must not be null")
    ad.toObjectArray(elem.get).map { row =>
      require(row != null, s"$fn: null row in the matrix literal")
      toDoubles(row.asInstanceOf[ArrayData],
        elem.get.asInstanceOf[ArrayType].elementType)
    }
  }

  private def foldableDouble(e: Expression, fn: String): Double = {
    require(e.foldable, s"$fn: scale must be a literal, got ${e.sql}")
    e.eval() match {
      case null => throw new IllegalArgumentException(s"$fn: scale must not be null")
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case n: java.lang.Number => n.doubleValue()
      case other => throw new IllegalArgumentException(
        s"$fn: scale must be numeric, got $other")
    }
  }

  private def descriptor(name: String, clazz: Class[_], arities: Set[Int])(
      build: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(name),
    new ExpressionInfo(clazz.getName, name),
    (children: Seq[Expression]) => {
      require(arities.contains(children.size),
        s"$name expects ${arities.toSeq.sorted.mkString(" or ")} arguments, " +
          s"got ${children.size}")
      build(children)
    })

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    descriptor("multi_contains_count", classOf[MultiContainsCount], Set(2)) { c =>
      MultiContainsCount(c.head, foldableStrings(c(1), "multi_contains_count"))
    },
    descriptor("multi_contains_matches", classOf[MultiContainsMatches], Set(2)) { c =>
      MultiContainsMatches(c.head, foldableStrings(c(1), "multi_contains_matches"))
    },
    descriptor("plane_signature", classOf[PlaneSignature], Set(2)) { c =>
      PlaneSignature(c.head, foldableMatrix(c(1), "plane_signature"))
    },
    descriptor("nearest_centroid", classOf[NearestCentroid], Set(2)) { c =>
      NearestCentroid(c.head, foldableMatrix(c(1), "nearest_centroid"))
    },
    descriptor("pair_cosine", classOf[PairCosine], Set(2, 3)) { c =>
      if (c.size == 2) PairCosine(c.head, c(1), quantized = false, scale = 0.0)
      else PairCosine(c.head, c(1), quantized = true,
        scale = foldableDouble(c(2), "pair_cosine"))
    },
    descriptor("query_cosine", classOf[QueryCosine], Set(2, 3)) { c =>
      val q = foldableVector(c(1), "query_cosine")
      if (c.size == 2) QueryCosine(c.head, q, quantized = false, scale = 0.0)
      else QueryCosine(c.head, q, quantized = true,
        scale = foldableDouble(c(2), "query_cosine"))
    })

  /** Idempotently register every graft SQL function on an existing
    * session (for sessions built without
    * `spark.sql.extensions=graft.functions.GraftExtensions`). The CDC
    * transformer calls this before running `<SRC>` SQL, so reference
    * configs can use the native operators out of the box.
    *
    * Register-if-ABSENT: a same-named function the user already put on
    * the session (their own UDF, or an earlier registration) is never
    * replaced — a per-batch transformer call silently swapping the
    * user's function for the engine's would change their SQL's results
    * with no error.
    */
  def registerAll(spark: SparkSession): Unit =
    (all ++ Seq(InterleaveBits.descriptor, InterleaveBits3.descriptor,
      InterleaveBits4.descriptor)).foreach { case (id, _, builder) =>
      if (!spark.sessionState.functionRegistry.functionExists(id))
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          id.funcName, builder, "built-in")
    }
}
