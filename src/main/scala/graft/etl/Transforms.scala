package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema construction from config (reference: config→StructType with a
  * 3-type map, error on unknown — /root/reference/data_process.py:56-73).
  */
object SchemaBuilder {
  private val typeMap: Map[String, DataType] = Map(
    "string" -> StringType,
    "double" -> DoubleType,
    "integer" -> IntegerType)

  def build(fields: Seq[FieldSpec]): StructType =
    StructType(fields.map { f =>
      val dt = typeMap.getOrElse(f.dtype,
        throw new IllegalArgumentException(s"unsupported field type: ${f.dtype}"))
      StructField(f.name, dt, f.nullable)
    })
}

/** The pipeline's transform steps, one pure function per reference stage
  * (/root/reference/data_process.py:235-265), composable with
  * DataFrame.transform. Semantic traps preserved deliberately:
  *
  *  - delivery filter is a bag-semantics unionByName of per-indicator
  *    branches, NOT a single disjunctive filter — overlapping condition
  *    sets duplicate rows, as in the reference (:128-136);
  *  - to_date under Spark 4 ANSI throws on unparseable input (the
  *    reference behavior on its own data; documented, not "fixed");
  *  - rename is a projection of aliases, order a final projection.
  */
object Transforms {

  /** A1 — all-column exact dedup (reference :242). */
  def dedup(df: DataFrame): DataFrame = df.dropDuplicates()

  /** E2 — parse the date column in place (reference :244). */
  def parseDate(df: DataFrame, conf: RunConf): DataFrame =
    df.withColumn(conf.dateColumn, to_date(col(conf.dateColumn), conf.dateFormat))

  /** F1 — inclusive date-range filter (reference :98-101). */
  def dateFilter(df: DataFrame, conf: RunConf): DataFrame =
    df.filter(col(conf.dateColumn) >= lit(conf.startDate).cast(DateType) &&
              col(conf.dateColumn) <= lit(conf.endDate).cast(DateType))

  /** F2 — country equality filter with the TODOS sentinel (reference
    * :111-114); the sentinel check is driver-side config logic.
    */
  def countryFilter(df: DataFrame, conf: RunConf): DataFrame =
    if (conf.countryValue.equalsIgnoreCase("TODOS")) df
    else df.filter(col(conf.countryColumn) === lit(conf.countryValue))

  /** F3/U1 — per-indicator IN-list branches unioned by name (reference
    * :128-136). Bag semantics: overlapping values duplicate rows.
    */
  def deliveryFilter(df: DataFrame, indicators: Seq[IndicatorConf]): DataFrame = {
    require(indicators.nonEmpty, "deliveryFilter requires at least one indicator family")
    indicators.map(i => df.filter(upper(col(i.source)).isin(i.values: _*)))
      .reduce(_ unionByName _)
  }

  /** E4 — 0/1 indicator columns (reference :150-159). */
  def indicatorCols(df: DataFrame, indicators: Seq[IndicatorConf]): DataFrame =
    indicators.foldLeft(df) { (d, i) =>
      d.withColumn(i.name,
        when(upper(col(i.source)).isin(i.values: _*), lit(1)).otherwise(lit(0)))
    }

  /** E10/E11 — typed null fills (reference :163-180). */
  def fillNulls(df: DataFrame, conf: FillConf): DataFrame =
    df.na.fill(conf.textValue, conf.textColumns)
      .na.fill(conf.numericValue, conf.numericColumns)

  /** E5/E6/E7 — unit standardization (reference :182-210): quantity
    * scaled by `factor` for `fromUnit` rows, price re-derived per
    * standardized unit with HALF_UP 2-decimal rounding, constant target
    * unit for every row.
    */
  def standardizeUnits(df: DataFrame, u: UnitConf): DataFrame = {
    val isFrom = upper(col(u.unitColumn)) === lit(u.fromUnit)
    df.withColumn(u.outQuantity,
        when(isFrom, col(u.quantityColumn) * u.factor).otherwise(col(u.quantityColumn)))
      .withColumn(u.outPrice,
        when(isFrom, round(col(u.priceColumn) / col(u.outQuantity), 2))
          .otherwise(col(u.priceColumn)))
      .withColumn(u.outUnit, lit(u.standardUnit))
  }

  /** E8 — total from the ROUNDED standardized price (reference :259-262;
    * the rounding drift is intentional parity, see SURVEY.md E8).
    */
  def totalColumn(df: DataFrame, u: UnitConf, name: String): DataFrame =
    df.withColumn(name, col(u.outQuantity) * col(u.outPrice))

  /** P1/P2 — rename-by-projection then reorder projection (reference
    * :219-231).
    */
  def renameAndOrder(df: DataFrame, renames: Map[String, String],
                     order: Seq[String]): DataFrame = {
    val renamed = df.select(df.columns.map(c =>
      renames.get(c).map(col(c).as(_)).getOrElse(col(c))).toIndexedSeq: _*)
    renamed.select(order.map(col): _*)
  }

  /** The full chain in reference order (:240-263). */
  def apply(df: DataFrame, conf: EtlConfig): DataFrame = {
    val chained = df
      .transform(dedup)
      .transform(parseDate(_, conf.run))
      .transform(dateFilter(_, conf.run))
      .transform(countryFilter(_, conf.run))
      .transform(deliveryFilter(_, conf.indicators))
      .transform(indicatorCols(_, conf.indicators))
      .transform(fillNulls(_, conf.fill))
      .transform(standardizeUnits(_, conf.units))
      .transform(totalColumn(_, conf.units, conf.output.totalColumn))
    renameAndOrder(chained, conf.renames, conf.columnOrder)
  }
}
