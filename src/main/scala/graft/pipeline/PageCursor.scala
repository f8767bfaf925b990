package graft.pipeline

import graft.core.{PageOffset, PeriodicOffset}
import java.time.{Duration, Instant}

/** A decoded source page: the data plus an optional explicit next state
  * (HATEOAS-style override — when the payload itself names the next cursor,
  * it wins over the computed one).
  * (ref: tamer `rest/src/main/scala/tamer/rest/model.scala:44-48`)
  */
final case class DecodedPage[V, SV](data: List[V], nextState: Option[SV] = None)

/** Pure pagination state machines — the reference's REST cursor semantics
  * (tamer `rest/src/main/scala/tamer/rest/RESTSetup.scala:171-184,250-267`)
  * re-expressed as total functions so they are unit-testable without HTTP
  * and drive [[GraftPipeline]] iterations.
  */
object PageCursor {

  /** Fixed pagination advance:
    *  - explicit `nextState` in the page wins;
    *  - with a known fixed page size, a NOT-full page means "stay on this
    *    page, remember how many elements were already emitted"
    *    (`nextIndex`), so the next poll re-reads the page and drops them;
    *  - otherwise move to the next page.
    * (ref: `RESTSetup.scala:171-179`)
    */
  def nextPageOrNextIndexIfPageNotComplete[V](
      page: DecodedPage[V, PageOffset],
      offset: PageOffset,
      increment: Int = 1,
      fixedPageElementCount: Option[Int] = None
  ): PageOffset =
    page.nextState.getOrElse {
      fixedPageElementCount match {
        case Some(expected) if page.data.length <= expected - 1 => offset.nextIndex(page.data.length)
        case _                                                  => offset.incrementedBy(increment)
      }
    }

  /** Drop the elements of a partially-emitted page that a previous poll
    * already produced. (ref: `RESTSetup.scala:181-184`)
    */
  def filterPage[V](page: DecodedPage[V, PageOffset], offset: PageOffset): List[V] =
    page.data.drop(offset.nextIndex)

  /** Periodic re-pagination advance: page forward while data flows; when the
    * period is exhausted (empty page past `minPeriod`) or overrun
    * (`maxPeriod` elapsed), reset to the starting page with a new period
    * start — re-reading the source is how this source family observes late
    * mutations. (ref: `RESTSetup.scala:250-267`)
    */
  def nextPeriodicState[V](
      page: DecodedPage[V, PeriodicOffset],
      state: PeriodicOffset,
      now: Instant,
      minPeriod: Duration,
      maxPeriod: Duration,
      startingOffset: Int = 0,
      increment: Int = 1
  ): PeriodicOffset =
    page.nextState.getOrElse {
      if (now.isAfter(state.periodStart.plus(maxPeriod)) ||
        (page.data.isEmpty && now.isAfter(state.periodStart.plus(minPeriod))))
        PeriodicOffset(startingOffset, now)
      else if (page.data.isEmpty)
        PeriodicOffset(startingOffset, state.periodStart.plus(minPeriod))
      else
        state.incrementedBy(increment)
    }
}

/** Paginated-source pipelines over the pure cursor machines. The page fetch
  * is driver-side by nature (one small HTTP/API call per iteration — the
  * reference does exactly this, `RESTSetup.scala:64-108`); the *records*
  * become a distributed Dataset immediately, so downstream transforms and
  * sinks scale out.
  */
object PaginatedSource {

  /** Fixed pagination (ref: `RESTSetup.paginated`). `fetchPage` is the
    * page-fetching function (HTTP client, mock server, ...). A page is
    * filtered through [[PageCursor.filterPage]] before emission, so re-polls
    * of a partially-full page never duplicate records.
    */
  def paginated[V](
      name: String,
      fetchPage: PageOffset => DecodedPage[V, PageOffset],
      toRows: (org.apache.spark.sql.SparkSession, List[V]) => org.apache.spark.sql.DataFrame,
      increment: Int = 1,
      fixedPageElementCount: Option[Int] = None,
      initialOffset: PageOffset = PageOffset(0, 0),
      doneWhenEmpty: Boolean = false
  ): GraftPipeline[PageOffset] = {
    implicit val h: graft.core.Hashable[PageOffset] = graft.core.Hashable.pageOffsetHashable
    GraftPipeline[PageOffset](
      name,
      initialState = initialOffset,
      repr = s"paginated:$name:inc=$increment:fixed=$fixedPageElementCount",
      iteration = (spark, state) => {
        val page = fetchPage(state)
        val fresh = PageCursor.filterPage(page, state)
        Iteration(
          batch = if (fresh.nonEmpty) Some(toRows(spark, fresh)) else None,
          nextState = PageCursor.nextPageOrNextIndexIfPageNotComplete(page, state, increment, fixedPageElementCount),
          done = doneWhenEmpty && page.data.isEmpty)
      }
    )
  }

  /** Periodic re-pagination (ref: `RESTSetup.periodicallyPaginated`). In the
    * reference the loop *sleeps* until the next period start; a micro-batch
    * engine must never block, so a not-yet-due period emits no batch and
    * leaves the state unchanged — the trigger cadence supplies the waiting
    * (SURVEY.md §7.4).
    */
  def periodicallyPaginated[V](
      name: String,
      fetchPage: PeriodicOffset => DecodedPage[V, PeriodicOffset],
      toRows: (org.apache.spark.sql.SparkSession, List[V]) => org.apache.spark.sql.DataFrame,
      periodStart: Instant,
      minPeriod: Duration,
      maxPeriod: Duration,
      now: () => Instant = () => Instant.now(),
      startingOffset: Int = 0,
      increment: Int = 1
  ): GraftPipeline[PeriodicOffset] = {
    implicit val h: graft.core.Hashable[PeriodicOffset] = graft.core.Hashable.periodicOffsetHashable
    GraftPipeline[PeriodicOffset](
      name,
      initialState = PeriodicOffset(startingOffset, periodStart),
      repr = s"periodic:$name:start=$startingOffset:min=${minPeriod.toMillis}:max=${maxPeriod.toMillis}",
      iteration = (spark, state) => {
        val currentTime = now()
        if (state.periodStart.isAfter(currentTime)) {
          // not due yet: no batch, no state change (trigger will re-poll)
          Iteration(batch = None, nextState = state)
        } else {
          val page = fetchPage(state)
          Iteration(
            batch = if (page.data.nonEmpty) Some(toRows(spark, page.data)) else None,
            nextState = PageCursor.nextPeriodicState(page, state, currentTime, minPeriod, maxPeriod, startingOffset, increment))
        }
      }
    )
  }
}
