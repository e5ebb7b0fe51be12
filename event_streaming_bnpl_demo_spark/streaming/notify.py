"""Change notification (R11): the reference pushes an ``"update"``
WebSocket message after each projection write so browsers reload
(consumer/consumer.go:178-180; hub main.go:58-73). The Spark-native
analog is a ``StreamingQueryListener``: the engine already emits a
progress event per micro-batch, so notification is a subscription, not
bespoke plumbing — any number of callbacks, no socket handling, and it
fires only when rows actually moved.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class ChangeNotifier(StreamingQueryListener):
    """Invokes ``on_update(info)`` after every micro-batch that
    processed at least one row. ``info`` carries query id/name, batch
    id, and row count — enough for a UI push or a cache invalidation.

    Register with ``spark.streams.addListener(notifier)``; remove with
    ``spark.streams.removeListener(notifier)``. Listener callbacks run
    on the driver off the query thread, so a slow consumer cannot stall
    the stream (the reference's synchronous ws.WriteMessage could).
    """

    def __init__(self, on_update: Callable[[dict], None]):
        self._on_update = on_update

    # -- StreamingQueryListener interface --------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        if p.numInputRows > 0:
            self._on_update({
                "query_id": str(p.id),
                "name": p.name,
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
            })

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def notify_on_update(spark: SparkSession,
                     on_update: Callable[[dict], None]) -> ChangeNotifier:
    """Attach a ChangeNotifier to the session's stream manager."""
    notifier = ChangeNotifier(on_update)
    spark.streams.addListener(notifier)
    return notifier
