package graft.schema

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructType}

/** §1.4 three-tier schema resolution (reference
  * `shared_etls/etls/utils.py:143-183`, `get_schema_to_mongodb_run`).
  *
  * Order: (1) JSON schema registry file `{namespace}_{dataset}.json`
  * parsed with `StructType.fromJson` (`utils.py:50-93, 161-171`);
  * (2) fallback — schema of the existing TRUSTED table, round-tripped
  * through JSON exactly as the reference does (`utils.py:96-140`);
  * (3) last resort — None, meaning the source infers
  * (`load_utils.py:92-101`). When a schema resolves, inference is
  * disabled downstream (`load_utils.py:89, 289, 425`): at 100 TB an
  * inference pass is a full extra scan.
  */
trait SchemaRegistry {
  def resolve(namespace: String, dataset: String): Option[StructType]
}

/** Tier 1 — a directory of `StructType.fromJson`-compatible JSON
  * files named `{namespace}_{dataset}.json`. */
final case class JsonFileRegistry(dir: String) extends SchemaRegistry {
  def resolve(namespace: String, dataset: String): Option[StructType] = {
    val p = Paths.get(dir, s"${namespace}_$dataset.json")
    if (Files.exists(p))
      Some(DataType.fromJson(Files.readString(p)).asInstanceOf[StructType])
    else None
  }
}

/** Tier 2 — schema of the existing trusted table, JSON round-tripped
  * (reference `utils.py:126-135`: `schema.json()` →
  * `StructType.fromJson(json.loads(...))`). */
final case class ExistingTableRegistry(spark: SparkSession, trustedPathOf: (String, String) => String)
    extends SchemaRegistry {
  def resolve(namespace: String, dataset: String): Option[StructType] =
    try {
      val schema = spark.read.parquet(trustedPathOf(namespace, dataset)).schema
      Some(DataType.fromJson(schema.json).asInstanceOf[StructType])
    } catch { case _: Exception => None }
}

/** Tiers chained in resolution order; empty result = tier 3 (infer). */
final case class ChainedRegistry(tiers: SchemaRegistry*) extends SchemaRegistry {
  def resolve(namespace: String, dataset: String): Option[StructType] =
    tiers.view.flatMap(_.resolve(namespace, dataset)).headOption
}
