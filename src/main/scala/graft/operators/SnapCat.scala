package graft.operators

import graft.Qx
import graft.catalog.GraftCatalog
import org.apache.spark.sql.SparkSession

/** Shared binding of the DataSourceV2 snapshot catalog
  * ([[graft.catalog.GraftCatalog]]) for the query surface: the `snap`
  * catalog registers once per session over a pid-scoped warehouse
  * (same hygiene as [[Qx.tmpOut]] — stale dead-pid warehouses are
  * swept, live concurrent JVMs never collide), and every fixture
  * table lives at `snap.default.<name>_<sf-hash>` so concurrent
  * Verify/Bench passes over different scale factors cannot cross-read.
  *
  * The queries DROP + re-CREATE their tables per invocation, so
  * version numbers inside a fixture are deterministic on a
  * repeatedly-run surface (Bench warm + timed passes).
  */
private[graft] object SnapCat {

  /** Register (idempotent) and return the warehouse path. */
  def ensure(s: SparkSession): String = {
    val wh = Qx.tmpOut("snapcat", "warehouse")
    GraftCatalog.register(s, "snap", Some(wh))
    wh
  }

  /** Fully-qualified SQL name + on-disk snapshot root for a fixture
    * table, sf-isolated by the dir hash. */
  def table(s: SparkSession, base: String, sfDir: String): (String, String) = {
    val wh = ensure(s)
    val name = s"${base}_${math.abs(sfDir.hashCode.toLong)}"
    (s"snap.default.$name", s"$wh/default/$name")
  }
}
