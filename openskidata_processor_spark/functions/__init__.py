from . import geometry, hashing, osm, text, vectors  # noqa: F401
