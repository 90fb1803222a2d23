package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{ColumnBridge, CosineSimilarity, RollingHash, SimHash64}

/** Column-API front for graft's native Catalyst expressions. */
object native {

  /** Cosine similarity of two `array<double>` columns (codegen, one pass). */
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** 64-bit polynomial rolling hash of a string column (codegen). */
  def rollingHash(s: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(s)))

  /** 64-bit SimHash of an `array<string>` token column (codegen). */
  def simHash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
}
