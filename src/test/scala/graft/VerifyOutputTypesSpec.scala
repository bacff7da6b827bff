package graft

import org.apache.spark.sql.types._

/** Gate-contract pin: the driver's value-hash canonicalizes DECIMAL
  * engine-specifically (Spark parquet Decimal vs DuckDB rendering), so
  * a raw DecimalType in a FINAL projection silently breaks hash
  * comparison even when values are bit-identical (the round-13 lesson:
  * six value-correct keys rode red for a round). DECIMAL(38,0) remains
  * the right INTERNAL accumulator; it must be cast to a canonical gate
  * type (BIGINT/INT/DOUBLE/VARCHAR/DATE/TIMESTAMP/BOOLEAN or arrays /
  * structs thereof) before the final select. This spec walks every
  * gated key's declared schema (analysis only — no execution for lazy
  * plans) and fails on any decimal leaf, naming key and column.
  */
class VerifyOutputTypesSpec extends SparkSpec {

  private def decimalLeaves(dt: DataType, path: String): Seq[String] = dt match {
    case _: DecimalType       => Seq(path)
    case ArrayType(et, _)     => decimalLeaves(et, s"$path[]")
    case MapType(kt, vt, _)   => decimalLeaves(kt, s"$path.key") ++
                                 decimalLeaves(vt, s"$path.value")
    case StructType(fields)   => fields.toSeq.flatMap(f =>
                                   decimalLeaves(f.dataType, s"$path.${f.name}"))
    case _                    => Nil
  }

  test("no gated query emits DecimalType in its final schema") {
    // NB: fn(spark, sfDir) is analysis-only for most keys, but the
    // versioned-table / bitemporal / dedup_incremental builders run
    // real jobs at DataFrame CONSTRUCTION (they rebuild their tmp
    // tables) — accepted: the schema is only defined by running them,
    // and the rebuild is the same one every gated invocation performs
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (key, fn) =>
        val schema = fn(spark, sfDir).schema
        schema.fields.toSeq.flatMap(f =>
          decimalLeaves(f.dataType, f.name).map(p => s"$key:$p"))
    }
    assert(offenders.isEmpty,
      s"raw DECIMAL in final projection breaks the driver's value-hash: " +
        offenders.mkString(", "))
  }
}
