from .registry import REGISTRY, QuerySpec

__all__ = ["REGISTRY", "QuerySpec"]
