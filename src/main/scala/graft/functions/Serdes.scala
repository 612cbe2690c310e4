package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** P1 — the pluggable event-body deserializer surface.
  *
  * The reference loads a serde class reflectively from config and calls
  * `deserialize(bytes, reuse): List[AnyRef]` per event against a Hive
  * `StructTypeInfo` (`/root/reference/.../serde/TextDeserializer.scala:44-68`,
  * wired at `HiveBatchedSink.scala:244-253`). The Spark-native surface is a
  * `Column => Column` that turns an opaque body column into a typed struct —
  * built-in `from_json` / `from_csv` / split+cast stay fully inside codegen,
  * so a custom serde never forces a deopt of the scan stage.
  */
trait Serde extends Serializable {
  /** Parse the opaque body column into a struct column with `schema`. */
  def parse(body: Column): Column
  def schema: StructType
}

object Serde {
  /** Reflectively instantiate a [[Serde]] from a config-supplied class name
    * — the reference's wiring (`Config.scala:32` names the class,
    * `HiveBatchedSink.scala:244,252-253` `Class.forName`s and constructs it
    * against the metastore schema). Resolution order:
    *   1. a Scala `object` (companion `MODULE$`),
    *   2. a `(StructType)` constructor, fed `schema`,
    *   3. a no-arg constructor.
    * Every failure mode — unknown class, wrong type, no usable constructor —
    * surfaces as `IllegalArgumentException` naming the class, so a config
    * typo fails the job at wiring time with a readable error, not at first
    * batch with a reflection stack. */
  def forName(className: String, schema: StructType): Serde =
    Reflect.instantiate[Serde](className, schema, classOf[Serde])
}

/** Shared reflective loader behind [[Serde.forName]] and
  * `BinaryCodec.forName` (one error surface, one resolution order). */
private[graft] object Reflect {
  def instantiate[T](className: String, schema: StructType, want: Class[T]): T = {
    val cls =
      try Class.forName(className)
      catch { case _: ClassNotFoundException =>
        // Scala object class names end in $; accept the undecorated form
        try Class.forName(className + "$")
        catch { case _: ClassNotFoundException =>
          throw new IllegalArgumentException(
            s"serde/codec class not found: '$className'") }
      }
    // a Scala `object Foo` compiles to Foo$.MODULE$ plus a constructor-less
    // Foo.class, so the singleton fallback must also run when the plain
    // class resolved but offers no usable constructor
    def module(c: Class[_]): Option[Any] =
      if (c.getName.endsWith("$"))
        Some(c.getField("MODULE$").get(null))
      else
        try Some(Class.forName(c.getName + "$").getField("MODULE$").get(null))
        catch { case _: ReflectiveOperationException => None }
    val inst: Any = {
      val withSchema = cls.getConstructors.find(
        _.getParameterTypes.toSeq == Seq(classOf[StructType]))
      val noArg = cls.getConstructors.find(_.getParameterCount == 0)
      withSchema.map(_.newInstance(schema))
        .orElse(noArg.map(_.newInstance()))
        .orElse(module(cls))
        .getOrElse(throw new IllegalArgumentException(
          s"'$className' is neither a Scala object nor constructible " +
            "from a (StructType) or no-arg constructor"))
    }
    if (!want.isInstance(inst))
      throw new IllegalArgumentException(
        s"'$className' is not a ${want.getSimpleName}")
    inst.asInstanceOf[T]
  }
}

/** JSON bodies (the `events.props` fixture shape). */
final case class JsonSerde(schema: StructType) extends Serde {
  def parse(body: Column): Column = from_json(body, schema)
}

/** CSV bodies — `from_csv` with an explicit delimiter. */
final case class CsvSerde(schema: StructType, delimiter: String = ",") extends Serde {
  def parse(body: Column): Column =
    from_csv(body, schema, Map("sep" -> delimiter))
}

/** Delimited bodies parsed positionally with casts — the closest analogue of
  * a hand-written `TextDeserializer` subclass (split on a delimiter, cast
  * each field to the metastore-declared type). Field access is `try_element_at` and
  * casts are `try_cast`, so a short or malformed body yields null fields
  * instead of failing the job under ANSI mode (default in Spark 4) —
  * the same PERMISSIVE contract `from_json`/`from_csv` give the other
  * serdes (the reference's deserializer just throws and loses the batch,
  * `serde/TextDeserializer.scala:68`). */
final case class DelimitedSerde(fields: Seq[(String, DataType)], delimiter: String = "\t")
    extends Serde {
  /** Config-driven form ([[Serde.forName]]): schema in, default tab delimiter. */
  def this(schema: StructType) =
    this(schema.fields.map(f => f.name -> f.dataType).toSeq)
  val schema: StructType = StructType(fields.map { case (n, t) =>
    org.apache.spark.sql.types.StructField(n, t)
  })
  def parse(body: Column): Column = {
    val parts = split(body, java.util.regex.Pattern.quote(delimiter))
    struct(fields.zipWithIndex.map { case ((n, t), i) =>
      try_element_at(parts, lit(i + 1)).try_cast(t).as(n)
    }: _*)
  }
}

/** Hive type-string → Spark schema, the metastore-resolved schema path
  * (`util/HiveUtils.scala:79-88` + `TextDeserializer.scala:51-54`):
  * e.g. `"id:bigint,name:string,tags:array<string>"`. */
object HiveTypeString {
  def toStructType(colsWithTypes: String): StructType =
    StructType(colsWithTypes.split(",").map { f =>
      val Array(n, t) = f.split(":", 2)
      org.apache.spark.sql.types.StructField(
        n.trim, org.apache.spark.sql.types.DataType.fromDDL(t.trim))
    })
}
