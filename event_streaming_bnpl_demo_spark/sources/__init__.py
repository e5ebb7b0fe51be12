from .tables import load_table, register_views, spread, table_path  # noqa: F401
from .events import read_event_stream, read_event_batch      # noqa: F401
from .bucketed import write_bucketed, cobucket_pair          # noqa: F401
