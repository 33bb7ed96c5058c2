from . import csv, geojson, geopackage  # noqa: F401
