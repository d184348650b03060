package graft

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.{encoderFor, ExpressionEncoder}
import org.apache.spark.sql.catalyst.encoders.AgnosticEncoders.OptionEncoder
import scala.util.{Failure, Success, Try}

/** Typed record-map surface — the analogue of the reference's arbitrary
  * user callables (`schema_validator`, `enricher`, custom SerDes:
  * operators.py:358,498,90-99), which are opaque functions that may THROW
  * per record. The declarative [[Ops]] layer cannot capture exceptions from
  * arbitrary code, so this is the `Dataset[T]`/closure form of the same
  * ok/err contract: exceptions become per-record error strings, the stream
  * keeps flowing (reference behavior, operators.py:342-348).
  *
  * `f` runs EXACTLY ONCE per record (like the reference): the tagged
  * result is persisted before the ok/err branches read it, so side effects
  * are not duplicated and a non-deterministic `f` cannot land a record in
  * both (or neither) branch. Call `release()` when both branches have been
  * consumed.
  *
  * Scale note: closures forfeit codegen/pushdown, so this layer is for the
  * genuinely-imperative transforms only; everything expressible as columns
  * should use [[Ops]].
  */
object TypedOps {

  /** ok/err pair of typed datasets over one persisted evaluation. */
  final class TypedOpOut[U](val oks: Dataset[U], val errs: Dataset[String],
      cached: Dataset[_]) {
    /** Drop the persisted tagged intermediate. */
    def release(): Unit = { cached.unpersist(); () }
  }

  private def optEnc[A](ea: Encoder[A]): Encoder[Option[A]] =
    ExpressionEncoder(OptionEncoder(encoderFor(ea).encoder))

  /** Map with per-record exception capture: `f` failures route to errs as
    * "<exception class>: <message>" (truncated like the reference's
    * 1000-char cap, operators.py:344). */
  def mapRecords[T, U](ds: Dataset[T])(f: T => U)(
      implicit eu: Encoder[U]): TypedOpOut[U] = {
    implicit val tupEnc: Encoder[(Option[U], Option[String])] =
      Encoders.tuple(optEnc(eu), optEnc(Encoders.STRING))
    val tagged = ds.map { t =>
      Try(f(t)) match {
        case Success(u) => (Option(u), Option.empty[String])
        case Failure(e) =>
          (Option.empty[U],
            Option(s"${e.getClass.getSimpleName}: ${e.getMessage}".take(1000)))
      }
    }.persist()
    new TypedOpOut(
      oks = tagged.filter((p: (Option[U], Option[String])) => p._1.isDefined)
        .map((p: (Option[U], Option[String])) => p._1.get)(eu),
      errs = tagged.filter((p: (Option[U], Option[String])) => p._2.isDefined)
        .map((p: (Option[U], Option[String])) => p._2.get)(Encoders.STRING),
      cached = tagged)
  }

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
