package graft.util

import org.apache.spark.sql.DataFrame

/** Plugin-style batch transformer: implement this with a zero-arg
  * constructor and reference the class name in per-table config
  * (`<db>.<table>.transformer.class`) to run arbitrary DataFrame logic
  * between typed decode and the lake merge — the code-based sibling of
  * the `<SRC>` SQL transformer.
  */
trait BatchTransformer {
  def transform(df: DataFrame): DataFrame
}

/** A [[BatchTransformer]] that also receives the table's passthrough
  * options — the unrecognized `<db>.<table>.*` keys collected into
  * [[graft.cdc.TableConfig.extras]]. This is the engine's escape hatch for
  * per-table knobs it didn't anticipate, mirroring the reference's
  * merge-everything-into-writer-config behavior
  * (`BinlogSyncHoodieCommand.scala:128-139,160-183`).
  */
trait ConfigAwareTransformer extends BatchTransformer {
  def transform(df: DataFrame, options: Map[String, String]): DataFrame
  override def transform(df: DataFrame): DataFrame = transform(df, Map.empty)
}

/** Reflective instantiation (the engine's answer to the reference's
  * reflection helpers,
  * `/root/reference/src/main/java/tech/odes/common/lang/ScalaReflectionHelper.scala:11-31`
  * and siblings — there used for plugin-style dynamic invocation). We use
  * plain `Class.forName` + the context classloader, which covers the
  * actual use case (loading user plugins by name) without generic
  * method/field reflection.
  */
object Reflect {

  def instantiate[T](className: String, expected: Class[T]): T = {
    val cls = Class.forName(
      className, true, Thread.currentThread().getContextClassLoader)
    require(
      expected.isAssignableFrom(cls),
      s"$className does not implement ${expected.getName}")
    cls.getDeclaredConstructor().newInstance().asInstanceOf[T]
  }

  def transformer(className: String): BatchTransformer =
    instantiate(className, classOf[BatchTransformer])
}
