package graft

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import scala.util.{Failure, Success, Try}

/** Typed record-map surface — the analogue of the reference's arbitrary
  * user callables (`schema_validator`, `enricher`, custom SerDes:
  * operators.py:358,498,90-99), which are opaque functions that may THROW
  * per record. The declarative [[Ops]] layer cannot capture exceptions from
  * arbitrary code, so this is the `Dataset[T]`/closure form of the same
  * ok/err contract: exceptions become per-record error strings, the stream
  * keeps flowing (reference behavior, operators.py:342-348).
  *
  * Like the declarative split (two filters over one plan), the ok and err
  * branches are two narrow passes over the same source — no caching, no
  * driver round-trip.
  *
  * Scale note: closures forfeit codegen/pushdown, so this layer is for the
  * genuinely-imperative transforms only; everything expressible as columns
  * should use [[Ops]].
  */
object TypedOps {

  /** ok/err pair of typed datasets. */
  final case class TypedOpOut[U](oks: Dataset[U], errs: Dataset[String])

  /** Map with per-record exception capture: `f` failures route to errs as
    * "<exception class>: <message>" (truncated like the reference's
    * 1000-char cap, operators.py:344). */
  def mapRecords[T, U](ds: Dataset[T])(f: T => U)(
      implicit eu: Encoder[U]): TypedOpOut[U] = TypedOpOut(
    oks = ds.flatMap(t => Try(f(t)).toOption.toSeq),
    errs = ds.flatMap { t =>
      Try(f(t)) match {
        case Success(_) => Nil
        case Failure(e) =>
          Seq(s"${e.getClass.getSimpleName}: ${e.getMessage}".take(1000))
      }
    }(Encoders.STRING))

  /** Typed validation: predicate failures and predicate exceptions both go
    * to errs (reference validate_schema catches both, operators.py:410-423). */
  def validateRecords[T](ds: Dataset[T])(pred: T => Boolean,
      message: String = "Invalid record format")(
      implicit et: Encoder[T]): TypedOpOut[T] =
    mapRecords(ds) { t =>
      if (pred(t)) t
      else throw new IllegalArgumentException(message)
    }
}
