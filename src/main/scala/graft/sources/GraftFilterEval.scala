package graft.sources

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Reader-side evaluation of pushed-down `sources.Filter`s for the
  * `graft` DSv2 source.
  *
  * The contract mirrors what a post-scan Catalyst `Filter` would do, so
  * pushing a predicate never changes results — only where the work
  * happens: [[eval]] implements SQL three-valued logic (`None` =
  * UNKNOWN; a row survives only when every pushed filter is
  * `Some(true)`), and comparisons run on the SAME converted values the
  * reader emits, so parse-failure nulls behave identically pushed or
  * not.
  *
  * [[supported]] is the planning-time gate: a filter is only accepted
  * for pushdown when every referenced column exists and every literal
  * is convertible to the column's parsed representation; everything
  * else stays a residual filter for Spark to evaluate above the scan.
  */
object GraftFilterEval {

  /** Planning-time: can the reader evaluate this filter exactly? */
  def supported(schema: StructType, f: Filter): Boolean = f match {
    case IsNull(a) => has(schema, a)
    case IsNotNull(a) => has(schema, a)
    case EqualTo(a, v) => literalOk(schema, a, v)
    case EqualNullSafe(a, v) => v == null && has(schema, a) || literalOk(schema, a, v)
    case GreaterThan(a, v) => literalOk(schema, a, v)
    case GreaterThanOrEqual(a, v) => literalOk(schema, a, v)
    case LessThan(a, v) => literalOk(schema, a, v)
    case LessThanOrEqual(a, v) => literalOk(schema, a, v)
    case In(a, vs) => vs.nonEmpty && vs.forall(v => literalOk(schema, a, v))
    case StringStartsWith(a, _) => isString(schema, a)
    case StringEndsWith(a, _) => isString(schema, a)
    case StringContains(a, _) => isString(schema, a)
    case And(l, r) => supported(schema, l) && supported(schema, r)
    case Or(l, r) => supported(schema, l) && supported(schema, r)
    case Not(c) => supported(schema, c)
    case _ => false
  }

  /** Row-time: SQL three-valued logic over the converted column values.
    * `value` returns the reader's typed representation (Long/Double/
    * UTF8String/Int days/Long µs/Decimal) or null. */
  def eval(f: Filter, schema: StructType, value: String => Any): Option[Boolean] = f match {
    case IsNull(a) => Some(value(a) == null)
    case IsNotNull(a) => Some(value(a) != null)
    case EqualTo(a, v) => cmp(schema, a, value(a), v).map(_ == 0)
    case EqualNullSafe(a, v) =>
      val cv = value(a)
      if (cv == null || v == null) Some(cv == null && v == null)
      else Some(cmp(schema, a, cv, v).exists(_ == 0))
    case GreaterThan(a, v) => cmp(schema, a, value(a), v).map(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(schema, a, value(a), v).map(_ >= 0)
    case LessThan(a, v) => cmp(schema, a, value(a), v).map(_ < 0)
    case LessThanOrEqual(a, v) => cmp(schema, a, value(a), v).map(_ <= 0)
    case In(a, vs) =>
      if (value(a) == null) None
      else Some(vs.exists(v => cmp(schema, a, value(a), v).exists(_ == 0)))
    case StringStartsWith(a, p) => str(value(a)).map(_.startsWith(p))
    case StringEndsWith(a, p) => str(value(a)).map(_.endsWith(p))
    case StringContains(a, p) => str(value(a)).map(_.contains(p))
    case And(l, r) =>
      kleeneAnd(eval(l, schema, value), eval(r, schema, value))
    case Or(l, r) =>
      kleeneOr(eval(l, schema, value), eval(r, schema, value))
    case Not(c) => eval(c, schema, value).map(!_)
    case _ => None // unreachable for supported() filters; UNKNOWN is safe
  }

  private def kleeneAnd(l: Option[Boolean], r: Option[Boolean]): Option[Boolean] =
    (l, r) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true)) => Some(true)
      case _ => None
    }

  private def kleeneOr(l: Option[Boolean], r: Option[Boolean]): Option[Boolean] =
    (l, r) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false)) => Some(false)
      case _ => None
    }

  private def has(schema: StructType, a: String): Boolean =
    schema.fieldNames.contains(a)

  private def isString(schema: StructType, a: String): Boolean =
    schema.fields.find(_.name == a).exists(_.dataType == StringType)

  private def literalOk(schema: StructType, a: String, v: Any): Boolean =
    v != null &&
      schema.fields.find(_.name == a).exists(f => toComparable(f.dataType, v).isDefined)

  private def str(cv: Any): Option[String] =
    Option(cv).map(_.toString)

  /** Reader string values are UTF8String; accept plain String defensively. */
  private def utf8(cv: Any): org.apache.spark.unsafe.types.UTF8String = cv match {
    case u: org.apache.spark.unsafe.types.UTF8String => u
    case other => org.apache.spark.unsafe.types.UTF8String.fromString(other.toString)
  }

  /** Compare a converted column value with a filter literal; None when
    * the column value is null (UNKNOWN). */
  private def cmp(schema: StructType, a: String, cv: Any, v: Any): Option[Int] = {
    if (cv == null) return None
    val dt = schema.fields.find(_.name == a).get.dataType
    toComparable(dt, v).map { fv =>
      dt match {
        case LongType => java.lang.Long.compare(cv.asInstanceOf[Long], fv.asInstanceOf[Long])
        case DoubleType => java.lang.Double.compare(cv.asInstanceOf[Double], fv.asInstanceOf[Double])
        case BooleanType => java.lang.Boolean.compare(cv.asInstanceOf[Boolean], fv.asInstanceOf[Boolean])
        case DateType => java.lang.Integer.compare(cv.asInstanceOf[Int], fv.asInstanceOf[Int])
        case TimestampNTZType => java.lang.Long.compare(cv.asInstanceOf[Long], fv.asInstanceOf[Long])
        case _: DecimalType =>
          cv.asInstanceOf[org.apache.spark.sql.types.Decimal].toBigDecimal
            .compare(fv.asInstanceOf[BigDecimal])
        case StringType =>
          // Binary (code-point) order, same as Spark's UTF8String
          // comparison above the scan. Java String.compareTo orders by
          // UTF-16 code unit, which disagrees for supplementary-plane
          // chars vs [U+E000,U+FFFF] — pushdown must not change results.
          utf8(cv).compareTo(
            org.apache.spark.unsafe.types.UTF8String.fromString(fv.asInstanceOf[String]))
        case _ => return None
      }
    }
  }

  /** Filter literal → the column's comparable representation. Catalyst
    * coerces literals to the column type before DSv2 translation, but
    * the accepted set stays wide (boxed numerics, both date/ts external
    * forms) so a valid pushdown is never refused on representation. */
  private def toComparable(dt: DataType, v: Any): Option[Any] = dt match {
    case LongType => v match {
      case n: java.lang.Byte => Some(n.longValue)
      case n: java.lang.Short => Some(n.longValue)
      case n: java.lang.Integer => Some(n.longValue)
      case n: java.lang.Long => Some(n.longValue)
      case _ => None
    }
    case DoubleType => v match {
      case n: java.lang.Float => Some(n.doubleValue)
      case n: java.lang.Double => Some(n.doubleValue)
      case n: java.lang.Integer => Some(n.doubleValue)
      case n: java.lang.Long => Some(n.doubleValue)
      case _ => None
    }
    case BooleanType => v match {
      case b: java.lang.Boolean => Some(b.booleanValue)
      case _ => None
    }
    case StringType => v match {
      case s: String => Some(s)
      case _ => None
    }
    case DateType => v match {
      case d: java.time.LocalDate => Some(d.toEpochDay.toInt)
      case d: java.sql.Date => Some(d.toLocalDate.toEpochDay.toInt)
      case _ => None
    }
    case TimestampNTZType => v match {
      case t: java.time.LocalDateTime =>
        Some(t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000L)
      case _ => None
    }
    case _: DecimalType => v match {
      case d: java.math.BigDecimal => Some(BigDecimal(d))
      case d: BigDecimal => Some(d)
      case n: java.lang.Long => Some(BigDecimal(n.longValue))
      case n: java.lang.Integer => Some(BigDecimal(n.intValue))
      case _ => None
    }
    case _ => None
  }
}
