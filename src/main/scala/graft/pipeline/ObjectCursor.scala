package graft.pipeline

import graft.core.Hashable

/** Named-object cursor — the engine's re-expression of the reference's OCI
  * object-storage source (tamer `oci-objectstorage/src/main/scala/tamer/oci/
  * objectstorage/ObjectStorageSetup.scala:32-119`): the state names the
  * object to read (`objectName`) and where the next listing should start
  * (`startAfter`); each iteration reads the current object, lists what
  * follows, and folds the first matching next name into the state.
  */
object ObjectCursor {

  /** First listed name that passes the finder — the reference's
    * `objectSummaries.find(os => objectNameFinder(os.getName))`
    * (`ObjectStorageSetup.scala:89`). The listing is assumed already
    * restricted to names after `startAfter` (the store API does that).
    */
  def nextMatching(listing: Seq[String], objectNameFinder: String => Boolean): Option[String] =
    listing.find(objectNameFinder)
}

object NamedObjectSource {

  /** @param listAfter  store listing: names strictly after the given name
    *                   (None = from the beginning) — driver-side, tiny
    * @param readObject one object -> distributed DataFrame (on a cluster:
    *                   `spark.read.text("oci://bucket@ns/name")`)
    * @param objectName which object the current state maps to (None = none
    *                   to read this pull)
    * @param startAfter listing start for the next-name lookup
    * @param stateFold  fold the found next name into the state
    */
  def apply[SV: StateCodec: Hashable](
      name: String,
      namespace: String,
      bucket: String,
      listAfter: Option[String] => Seq[String],
      readObject: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
      initialState: SV,
      objectName: SV => Option[String],
      startAfter: SV => Option[String],
      stateFold: (SV, Option[String]) => SV,
      objectNameFinder: String => Boolean = _ => true
  ): GraftPipeline[SV] =
    GraftPipeline[SV](
      name,
      initialState,
      repr = s"object-store:$namespace/$bucket:$name",
      iteration = (spark, state) => {
        val batch = objectName(state).map(readObject(spark, _))
        val next = ObjectCursor.nextMatching(listAfter(startAfter(state)), objectNameFinder)
        Iteration(batch = batch, nextState = stateFold(state, next))
      }
    )
}
