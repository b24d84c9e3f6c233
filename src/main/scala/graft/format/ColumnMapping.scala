package graft.format

import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}

/** Column-mapping layer for metadata-only `ALTER TABLE ... RENAME/DROP
  * COLUMN`: data files map columns POSITIONALLY onto the table-meta
  * schema (the footer holds no names), so
  *
  *  - RENAME is a pure meta-field rename — positions don't move, every
  *    existing file keeps decoding the same chunks;
  *  - DROP must NOT remove the field (positions after it would shift
  *    onto the wrong chunks in every existing file). Instead the slot
  *    becomes a TOMBSTONE: a reserved-named placeholder field
  *    (`__btr_dropped_<slot>`, tagged in field metadata) that holds the
  *    position. Scans resolve requested columns by name, so a tombstone
  *    is simply never read; appends keep files positional by writing an
  *    all-null column at each tombstone slot (a few bytes per chunk —
  *    ONE_VALUE null encodes to almost nothing).
  *
  * Re-adding a dropped column's name creates a NEW trailing slot: the
  * tombstone keeps its reserved name, so old values can never resurrect
  * under the revived name (the failure mode Delta's name-mapping and
  * Iceberg's field IDs exist to prevent). The logical schema — what
  * users, Spark, and every API surface see — is the meta schema minus
  * tombstones; identity for every table that never dropped a column
  * (absent metadata keys, byte-identical meta JSON).
  */
object BtrColumnMapping {
  /** Reserved name prefix for tombstoned slots; user columns may not
    * start with it (enforced at CREATE/ADD/RENAME).
    */
  val DroppedPrefix = "__btr_dropped_"
  private val DroppedKey = "btr_dropped"

  def isDropped(f: StructField): Boolean =
    (f.metadata.contains(DroppedKey) && f.metadata.getBoolean(DroppedKey)) ||
      f.name.startsWith(DroppedPrefix)

  def reserved(name: String): Boolean = name.startsWith(DroppedPrefix)

  /** The tombstone field holding a dropped column's slot: reserved name,
    * original type (appends write a null column of this type there),
    * nullable by construction.
    */
  def tombstone(slot: Int, of: StructField): StructField =
    StructField(s"$DroppedPrefix$slot", of.dataType, nullable = true,
      metadata = new MetadataBuilder().putBoolean(DroppedKey, true).build())

  /** What users see: the meta schema minus tombstoned slots, metadata
    * keys stripped from live fields untouched (they never carry any).
    */
  def logical(meta: StructType): StructType =
    if (!hasTombstones(meta)) meta
    else StructType(meta.fields.filterNot(isDropped))

  def hasTombstones(meta: StructType): Boolean = meta.fields.exists(isDropped)

  /** Writer slot layout against a tombstoned meta: the physical data
    * schema files must carry (meta data slots, with live slots taking
    * the incoming field's name/type, plus any trailing evolution
    * columns) and, per physical slot, the ordinal of its value in the
    * incoming DATA row (-1 = tombstone, write null).
    *
    * @param metaDataFields meta schema fields minus partition columns
    * @param incomingData   the write's data schema (logical, minus
    *                       partition columns)
    */
  def slotLayout(metaDataFields: Array[StructField],
      incomingData: Array[StructField]): (StructType, Array[Int]) = {
    val phys = new Array[StructField](metaDataFields.length +
      math.max(0, incomingData.length - metaDataFields.count(f => !isDropped(f))))
    val ords = new Array[Int](phys.length)
    var li = 0
    var s = 0
    while (s < metaDataFields.length) {
      val f = metaDataFields(s)
      if (isDropped(f)) { phys(s) = f; ords(s) = -1 }
      else {
        require(li < incomingData.length,
          s"btr: write schema is missing live column ${f.name} (appends must " +
            "cover every live table column)")
        phys(s) = incomingData(li); ords(s) = li; li += 1
      }
      s += 1
    }
    // trailing schema evolution: new columns append after every slot
    while (li < incomingData.length) {
      phys(s) = incomingData(li); ords(s) = li; li += 1; s += 1
    }
    (StructType(phys), ords)
  }
}
