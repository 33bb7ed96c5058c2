from . import dedup, priority, sessionize, similarity, spatial_join, topk  # noqa: F401
