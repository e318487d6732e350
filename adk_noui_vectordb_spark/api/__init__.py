from .collection import Client, Collection

__all__ = ["Client", "Collection"]
