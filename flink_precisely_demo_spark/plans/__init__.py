from .flagship import flagship_query

__all__ = ["flagship_query"]
