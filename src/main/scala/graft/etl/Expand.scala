package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Export-time row expansion (SURVEY §2.9) — the two passes the
  * reference's product export runs between extraction and projection:
  *
  *  - GROUPED-PRODUCT FLATTENING (`DataExporter.cs:604-658`, projection
  *    flag `NoGroupedProducts`): a "grouped" parent row is replaced by
  *    its associated child product rows; simple products pass through;
  *    a product already emitted in the segment is not emitted twice
  *    (`ctx.EntityIdsPerSegment`).
  *  - ATTRIBUTE-COMBINATION-AS-PRODUCT (`DataExporter.DynamicProduct.cs:
  *    34-70`, flag `AttributeCombinationAsProduct`): every ACTIVE
  *    variant combination of a product becomes its own exported row —
  *    the parent row with the combination's values merged over it
  *    (`product.MergeWithCombination`: a combination value wins where
  *    present, the base value shows through where null) and a composite
  *    `_UniqueId = productId + "-" + combinationId`
  *    (DataExporter.DynamicProduct.cs:206-209). Products without active
  *    combinations export as their single base row.
  *
  * Spark-first: both passes are pure relational transforms — a semi-join
  * + union for the flattening, a left join + per-column coalesce for the
  * merge — so they run distributed inside the export pipeline (the
  * reference loops entities per 100-row segment on one node). No
  * correlated per-row work: at 100 TB the association and combination
  * sides shuffle (or broadcast, when dimension-sized) once.
  */
object ExportExpand {

  /** Replace grouped parents with their associated children.
    *
    * @param products     export rows; must contain `idCol` and `typeCol`
    * @param associations (parentCol, <product columns>) — child product
    *                     rows keyed by their grouped parent, the
    *                     `ApplyAssociatedProductsFilter` result
    * @note segment dedup: a child that is also exported as its own simple
    *       row is the SAME product row, so the id-set dedup of the
    *       reference is exactly a DISTINCT here. */
  def expandGrouped(products: DataFrame, associations: DataFrame,
      idCol: String, typeCol: String, groupedType: String = "grouped",
      parentCol: String = "parent_id"): DataFrame = {
    val simple = products.filter(col(typeCol) =!= groupedType)
    val parents = products.filter(col(typeCol) === groupedType)
      .select(col(idCol).as(parentCol))
    val children = associations
      .join(parents, Seq(parentCol), "left_semi")
      .drop(parentCol)
    simple.unionByName(children).distinct()
  }

  /** Explode products into one row per active combination, merging
    * override columns, or the base row when no combination exists.
    *
    * @param combos    (idCol, comboIdCol, `__ov_<name>` override columns)
    *                  — only ACTIVE combinations (filter upstream)
    * @param overrides product column names a combination may override;
    *                  merge = coalesce(override, base) per column
    * @return products columns + `unique_id` */
  def combinationsAsProducts(products: DataFrame, combos: DataFrame,
      idCol: String, comboIdCol: String = "combo_id",
      overrides: Seq[String] = Seq.empty): DataFrame = {
    val joined = products.join(combos, Seq(idCol), "left")
    val mergedCols = products.columns.toSeq.map { n =>
      if (overrides.contains(n)) coalesce(col(s"__ov_$n"), col(n)).as(n)
      else col(n)
    }
    val uid = when(col(comboIdCol).isNull, col(idCol).cast("string"))
      .otherwise(concat(col(idCol).cast("string"), lit("-"),
        col(comboIdCol).cast("string")))
    joined.select(mergedCols :+ uid.as("unique_id"): _*)
  }
}
