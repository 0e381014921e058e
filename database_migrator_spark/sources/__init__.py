from .tables import TABLES, events_stream, register_views, spread_for_cpu, table

__all__ = ["TABLES", "table", "register_views", "events_stream", "spread_for_cpu"]
