from .registry import DeclaredQuery, all_queries, query

__all__ = ["DeclaredQuery", "all_queries", "query"]
