from .tables import TABLES, events_stream, register_views, table

__all__ = ["TABLES", "table", "register_views", "events_stream"]
