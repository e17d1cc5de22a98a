package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal private[sql]-access bridge (the standard pattern for Spark
  * ecosystem libraries shipping custom Catalyst expressions): converts
  * between the public Column API and catalyst Expressions. Nothing else
  * from Spark internals is accessed anywhere in this codebase. */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Java-serializable Hadoop conf for shipping the session's filesystem
    * settings (fs.s3a credentials, fs.defaultFS, …) from the driver into
    * DSv2 reader factories. Spark's own wrapper is private[spark]. */
  def serializableConf(conf: org.apache.hadoop.conf.Configuration): SerializableHadoopConf =
    new SerializableHadoopConf(conf)
}

final class SerializableHadoopConf(@transient private var conf: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  def value: org.apache.hadoop.conf.Configuration = conf
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    conf.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new org.apache.hadoop.conf.Configuration(false)
    conf.readFields(in)
  }
}
