from .tables import (load_table, maybe_broadcast, register_views,  # noqa: F401
                     spread, table_path)
from .events import read_event_stream, read_event_batch      # noqa: F401
from .bucketed import write_bucketed, cobucket_pair          # noqa: F401
