"""Serving tier (reference ``src/api/main.py``): HTTP-free service
handlers + a stdlib HTTP adapter."""

from .http import make_server, serve_background
from .service import DataLakeService, flux_relative, mongo_filter_to_column

__all__ = [
    "DataLakeService",
    "make_server",
    "serve_background",
    "flux_relative",
    "mongo_filter_to_column",
]
