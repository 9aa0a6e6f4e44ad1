"""Online serving: WSGI app sharing the offline path's jitted kernels."""

from .app import SearchService, make_wsgi_app, serve

__all__ = ["SearchService", "make_wsgi_app", "serve"]
